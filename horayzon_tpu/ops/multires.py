# Copyright (c) 2026
# MIT License
"""Multi-resolution terrain: full-resolution inner grid + coarse far field.

TPU-native replacement for the reference's simplified outer TIN
(examples/horizon/gridded_planar_DEM_2m.py:130-265, where the outer domain is
decimated with the external `hmm` tool under a vertical error budget and
attached to the Embree scene as extra triangles, horizon_comp.cpp:199-218).

Here the far field is a *coarse heightfield* (e.g. the same DEM at 2^r times
the grid spacing).  The sweep's mip pyramid is assembled from both sources:

* levels ``l < r`` come from the fine grid — they are only read in the dense
  and near-mip phases, which the schedule keeps within the fine grid's halo;
* levels ``l >= r`` come from max-mips of the coarse grid, which covers the
  full search distance.

The accuracy contract matches the reference's two-component error budget
(`hori_acc = [algorithm, simplification]`): the far-field angular error is
bounded by ``coarse cell size / distance``, which the schedule keeps at
``<= rel_err`` by construction.
"""

import collections
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from horayzon_tpu.ops import mip as _mip
from horayzon_tpu.ops import sweep as _sweep


def combined_pyramid(z_fine, z_coarse, ratio_log2, coarse_offset, schedule,
                     pad_extra=None):
    """Assemble padded pyramid levels from a fine and a coarse heightfield.

    Parameters
    ----------
    z_fine : (Hf, Wf) float32
        Full-resolution grid (inner domain + halo).
    z_coarse : (Hc, Wc) float32
        Coarse grid with spacing ``2**ratio_log2 *`` fine spacing, covering
        the full search distance around the inner domain.
    ratio_log2 : int
        log2 of the coarse/fine spacing ratio.
    coarse_offset : (oi, oj)
        Position of fine cell (0, 0) within the coarse grid, in *fine* cells
        (must be multiples of ``2**ratio_log2``; i.e. the grids are aligned).
    schedule : ops.sweep.Schedule
    pad_extra : None or (lo, hi_rows, hi_cols)
        ``None`` pads each level for the XLA sweep's dynamic-slice reads
        (symmetric ``pads[lvl]`` plus the slice-size right margin).  A
        triple adds explicit extra sentinel margins around the schedule
        pad on every level — the fused Pallas kernel's aligned-slab
        margins are ``(4, 56, 776)`` (see pallas_sweep.pallas_forward_fn).

    Returns
    -------
    pyramid : tuple of padded jnp arrays (one per schedule level)
    """
    r = 2 ** ratio_log2
    oi, oj = coarse_offset
    if oi % r or oj % r:
        raise ValueError("coarse_offset must be multiples of the spacing "
                         "ratio (aligned grids)")
    pads = schedule.pads
    num_levels = len(pads)
    hf, wf = z_fine.shape
    # jnp throughout: the assembly must stay traced so the replay VJP can
    # route far-field cotangents back to z_coarse (all slice bounds are
    # static Python ints)
    z_coarse = jnp.asarray(z_coarse, dtype=jnp.float32)
    hc, wc = z_coarse.shape
    lo_e, hi_r, hi_c = (0, 0, 0) if pad_extra is None else pad_extra

    fine_levels = _mip.build_pyramid(jnp.asarray(z_fine, jnp.float32),
                                     min(ratio_log2, num_levels))
    if pad_extra is None:
        pyramid = [_mip.pad_level(fine_levels[lvl], pads[lvl])
                   for lvl in range(min(ratio_log2, num_levels))]
    else:
        pyramid = [jnp.pad(fine_levels[lvl],
                           ((pads[lvl] + lo_e, pads[lvl] + hi_r),
                            (pads[lvl] + lo_e, pads[lvl] + hi_c)),
                           constant_values=_mip.PAD_VALUE)
                   for lvl in range(min(ratio_log2, num_levels))]

    if num_levels <= ratio_log2:
        return tuple(pyramid)

    # ---- Coarse-derived levels (l >= ratio_log2) ------------------------
    # Fine-aligned level-r cell q covers fine rows [q*r, (q+1)*r) and maps
    # to coarse cell q + oi//r.  Assemble a level-r array over
    # q in [-p0, span + p0) with coarse data where available, so shifts in
    # every direction read real far-field terrain; then mip it down.
    nl = num_levels - ratio_log2
    align = 2 ** nl
    need = max((pads[lvl] + lo_e) * (2 ** (lvl - ratio_log2))
               for lvl in range(ratio_log2, num_levels)) + 2
    p0 = ((need + align - 1) // align) * align

    def build_axis(size_f, off_c, size_c):
        span = (size_f + r - 1) // r
        hi = span + ((need + align - 1) // align) * align
        lo = -p0
        n = hi - lo
        # coarse index of fine-aligned cell q: q + off_c
        q0 = max(lo, -off_c)
        q1 = min(hi, size_c - off_c)
        return lo, n, q0, q1

    ci, cj = oi // r, oj // r
    lo_i, n_i, qi0, qi1 = build_axis(hf, ci, hc)
    lo_j, n_j, qj0, qj1 = build_axis(wf, cj, wc)
    base = jnp.full((n_i, n_j), _mip.PAD_VALUE, dtype=jnp.float32)
    if qi1 > qi0 and qj1 > qj0:
        base = base.at[qi0 - lo_i:qi1 - lo_i, qj0 - lo_j:qj1 - lo_j].set(
            z_coarse[qi0 + ci:qi1 + ci, qj0 + cj:qj1 + cj])

    coarse_levels = _mip.build_pyramid(base, nl)
    for lvl in range(ratio_log2, num_levels):
        a = coarse_levels[lvl - ratio_log2]
        k = lvl - ratio_log2
        # current left offset (in level-l cells): p0 / 2^k (p0 is a
        # multiple of 2^nl >= 2^k, so this is exact)
        o = p0 >> k
        pad_l = pads[lvl] + lo_e       # target left pad of this level
        if o >= pad_l:
            a = a[o - pad_l:, :][:, o - pad_l:]
        else:
            a = jnp.pad(a, ((pad_l - o, 0), (pad_l - o, 0)),
                        constant_values=_mip.PAD_VALUE)
        if pad_extra is None:
            # right/bottom margin: slices reach (extent>>l) + 2*pad + Sz
            need_i = (hf >> lvl) + 2 * pads[lvl] + \
                _sweep._mip_slice_size(hf, lvl) + 4
            need_j = (wf >> lvl) + 2 * pads[lvl] + \
                _sweep._mip_slice_size(wf, lvl) + 4
        else:
            ext = 2 ** lvl
            need_i = (hf + ext - 1) // ext + pad_l + pads[lvl] + hi_r
            need_j = (wf + ext - 1) // ext + pad_l + pads[lvl] + hi_c
        pad_i = max(0, need_i - a.shape[0])
        pad_j = max(0, need_j - a.shape[1])
        if pad_i or pad_j:
            a = jnp.pad(a, ((0, pad_i), (0, pad_j)),
                        constant_values=_mip.PAD_VALUE)
        pyramid.append(a)
    return tuple(pyramid)


def rasterize_tin(vert_simp, tri_ind_simp, *, origin_xy, spacing_xy, shape,
                  fill=_mip.PAD_VALUE):
    """Sample a TIN onto a regular lattice by barycentric interpolation.

    The reference attaches a simplified outer-domain TIN (built with the
    external ``hmm`` tool) directly to its Embree scene
    (horizon_comp.cpp:199-218); here the same TIN becomes a coarse far-
    field heightfield for :func:`horizon_sweep_multires`.

    Parameters
    ----------
    vert_simp : flat float32 array, interleaved (x, y, z) vertices
        (Embree-style padded buffers are fine — the tail is unreferenced).
    tri_ind_simp : flat int32 array of vertex indices, 3 per triangle.
    origin_xy : (x0, y0) of lattice point (0, 0).
    spacing_xy : (sx, sy) lattice spacings (sy signed, like ``dy``).
    shape : (H, W) lattice size.

    Returns
    -------
    (H, W) float32: TIN height at each lattice point; points covered by
    several triangles (skirts/seams) get the maximum (conservative for
    occlusion); points outside all triangles get ``fill``.
    """
    verts = np.asarray(vert_simp, dtype=np.float64).reshape(-1, 3)
    tris = np.asarray(tri_ind_simp, dtype=np.int64).reshape(-1, 3)
    x0, y0 = origin_xy
    sx, sy = spacing_xy
    h, w = shape
    out = np.full((h, w), fill, dtype=np.float64)

    # Vertex positions in (row, col) lattice coordinates
    vi = (verts[:, 1] - y0) / sy
    vj = (verts[:, 0] - x0) / sx
    vz = verts[:, 2]
    eps = 1.0e-9
    for a, b, c in tris:
        i_lo = max(int(np.ceil(min(vi[a], vi[b], vi[c]) - eps)), 0)
        i_hi = min(int(np.floor(max(vi[a], vi[b], vi[c]) + eps)), h - 1)
        j_lo = max(int(np.ceil(min(vj[a], vj[b], vj[c]) - eps)), 0)
        j_hi = min(int(np.floor(max(vj[a], vj[b], vj[c]) + eps)), w - 1)
        if i_hi < i_lo or j_hi < j_lo:
            continue
        ii, jj = np.meshgrid(np.arange(i_lo, i_hi + 1),
                             np.arange(j_lo, j_hi + 1), indexing="ij")
        # Barycentric coordinates of the lattice points
        d = ((vi[b] - vi[a]) * (vj[c] - vj[a])
             - (vj[b] - vj[a]) * (vi[c] - vi[a]))
        if abs(d) < 1.0e-12:
            continue
        wb = ((ii - vi[a]) * (vj[c] - vj[a])
              - (jj - vj[a]) * (vi[c] - vi[a])) / d
        wc = ((jj - vj[a]) * (vi[b] - vi[a])
              - (ii - vi[a]) * (vj[b] - vj[a])) / d
        wa = 1.0 - wb - wc
        tol = 1.0e-6
        inside = (wa >= -tol) & (wb >= -tol) & (wc >= -tol)
        if not inside.any():
            continue
        z_tri = wa * vz[a] + wb * vz[b] + wc * vz[c]
        block = out[i_lo:i_hi + 1, j_lo:j_hi + 1]
        np.maximum(block, np.where(inside, z_tri, fill), out=block)
    return out.astype(np.float32)


def coarse_grid_from_tin(vert_simp, tri_ind_simp, *, grid, fine_shape,
                         z_fine, ratio_log2, dist_search):
    """Build the multires coarse far field from a simplified outer TIN.

    The coarse lattice is aligned to the fine grid (spacing ``2**r`` fine
    cells), extends ``dist_search`` beyond it, and is filled from the TIN;
    over the fine grid's own extent the max-pooled fine terrain wins (the
    first coarse-phase samples can still land there).  Returns
    ``(z_coarse, coarse_offset)`` for :func:`horizon_sweep_multires`.
    """
    r = 2 ** ratio_log2
    hf, wf = fine_shape
    # pad the lattice by the search distance, in whole coarse cells
    pad_c = int(math.ceil(dist_search / (abs(grid.dx) * r))) + 2
    n_i = (hf + r - 1) // r + 2 * pad_c
    n_j = (wf + r - 1) // r + 2 * pad_c
    oi = oj = pad_c * r                     # fine cell 0 at coarse pad_c
    # The mip convention is block *maxima* (a lower coarse value could hide
    # far-field terrain).  Two ingredients approach the TIN's true
    # per-cell maximum from below within a tight bound:
    # (a) rasterise at `sub` x the coarse resolution and max-pool, which
    #     bounds the residual by the TIN gradient times the sub-cell size;
    # (b) scatter the TIN's own vertices (where piecewise-linear maxima
    #     live) into their containing cells.
    corner = (grid.x0 - oj * grid.dx, grid.y0 - oi * grid.dy)
    sub = min(r, 4)
    while sub > 1 and (n_i * sub) * (n_j * sub) > 2 * 10 ** 8:
        sub //= 2                            # cap host raster memory
    z_s = rasterize_tin(vert_simp, tri_ind_simp, origin_xy=corner,
                        spacing_xy=(grid.dx * r / sub, grid.dy * r / sub),
                        shape=(n_i * sub, n_j * sub))
    z_coarse = z_s.reshape(n_i, sub, n_j, sub).max(axis=(1, 3))
    verts3 = np.asarray(vert_simp, dtype=np.float64).reshape(-1, 3)
    tris3 = np.asarray(tri_ind_simp, dtype=np.int64).reshape(-1)
    used = verts3[np.unique(tris3)]
    ci_v = np.floor((used[:, 1] - corner[1]) / (grid.dy * r)).astype(int)
    cj_v = np.floor((used[:, 0] - corner[0]) / (grid.dx * r)).astype(int)
    ok = (ci_v >= 0) & (ci_v < n_i) & (cj_v >= 0) & (cj_v < n_j)
    np.maximum.at(z_coarse, (ci_v[ok], cj_v[ok]),
                  used[ok, 2].astype(np.float32))
    # overlay the fine grid's own max-pooled blocks (exact where known)
    hp = hf - hf % r
    wp = wf - wf % r
    pooled = np.asarray(z_fine)[:hp, :wp] \
        .reshape(hp // r, r, wp // r, r).max(axis=(1, 3))
    ci, cj = oi // r, oj // r
    z_coarse[ci:ci + hp // r, cj:cj + wp // r] = np.maximum(
        z_coarse[ci:ci + hp // r, cj:cj + wp // r], pooled)
    return z_coarse, (oi, oj)


def _validate_fine_halo(schedule, ratio_log2, step, offset, inner_shape,
                        fine_shape):
    """Raise if phases reading fine-derived levels can leave the fine
    grid's halo (they would sample sentinel padding instead of terrain)."""
    in0, in1 = inner_shape
    off0, off1 = offset
    hf, wf = fine_shape
    halo = min(off0, off1, hf - off0 - in0, wf - off1 - in1)
    s_fine_max = 0.0
    for ph, s_vals in zip(schedule.phases, schedule.s_values):
        if ph.level < ratio_log2:
            s_fine_max = max(s_fine_max, float(s_vals[-1]))
    halo_needed = int(math.ceil(s_fine_max / step)) + 2
    if halo < halo_needed:
        raise ValueError(
            f"fine-grid halo ({halo} cells) too small for the schedule: "
            f"phases below level {ratio_log2} march to {s_fine_max:.0f} m "
            f"(= {halo_needed} cells).  Widen the fine halo or use a "
            f"smaller spacing ratio.")
    return halo


#: Hashable static config of one multires Pallas horizon invocation (the
#: custom-VJP nondiff argument; see :func:`_mr_hz`).
_MrCfg = collections.namedtuple("_MrCfg", [
    "levels_meta", "phases_meta", "pads", "tile", "a_chunk", "azim_num",
    "offset", "inner_shape", "dx", "dy", "step", "dist", "near_ex",
    "n_safe", "ray_org_elev", "elev_lims", "rel_err", "max_level",
    "ratio_log2", "coarse_offset", "tile_map", "interpret"])


def _mr_schedule(cfg):
    return _sweep.build_schedule(cfg.step, cfg.dist, cfg.rel_err,
                                 max_level=cfg.max_level)


def _mr_pyramid(cfg, z_fine, z_coarse):
    from horayzon_tpu.ops import pallas_sweep as _pallas
    return combined_pyramid(z_fine, z_coarse, cfg.ratio_log2,
                            cfg.coarse_offset, _mr_schedule(cfg),
                            pad_extra=_pallas.LEVEL_PAD_EXTRA)


def _mr_fwd_value(cfg, z_fine, z_coarse, emit_argmax=False):
    from horayzon_tpu.ops import pallas_sweep as _pallas
    pyramid = _mr_pyramid(cfg, z_fine, z_coarse)
    tmap = jnp.asarray(np.asarray(cfg.tile_map, np.int32).reshape(-1, 2))
    out = _pallas._pallas_core(
        z_fine, None, tmap, jnp.zeros((4,), jnp.int32),
        levels_meta=cfg.levels_meta, phases_meta=cfg.phases_meta,
        pads=cfg.pads, tile=cfg.tile, a_chunk=cfg.a_chunk,
        a_num=cfg.azim_num, n_az_out=cfg.azim_num,
        offset=cfg.offset, inner_shape=cfg.inner_shape,
        dx=cfg.dx, dy=cfg.dy, step=cfg.step, dist=cfg.dist,
        near_ex=cfg.near_ex, n_safe=cfg.n_safe,
        ray_org_elev=cfg.ray_org_elev, elev_lims=cfg.elev_lims,
        interpret=cfg.interpret, pyramid=tuple(pyramid),
        emit_argmax=emit_argmax)
    if emit_argmax:
        return out
    return jnp.moveaxis(out, 0, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mr_hz(cfg, z_fine, z_coarse):
    """Differentiable multires fused-kernel horizon: Pallas forward over
    the combined fine+coarse pyramid, winner-replay Pallas backward.  The
    replay kernel re-reads no heights; its per-level window cotangents
    route through the VJP of :func:`combined_pyramid` (max-pools + the
    coarse base embedding), so gradients reach BOTH the fine grid and the
    coarse far field — the capability the reference's one-way TIN
    simplification cannot express (gridded_planar_DEM_2m.py:130-265)."""
    return _mr_fwd_value(cfg, z_fine, z_coarse)


def _mr_fwd(cfg, z_fine, z_coarse):
    raw, ids, aux = _mr_fwd_value(cfg, z_fine, z_coarse, emit_argmax=True)
    out = jnp.clip(jnp.arctan(jnp.moveaxis(raw, 0, -1)),
                   math.radians(cfg.elev_lims[0]),
                   math.radians(cfg.elev_lims[1]))
    return out, (z_fine, z_coarse, raw, ids, aux)


def _mr_bwd(cfg, residuals, g):
    from horayzon_tpu.ops import pallas_sweep as _pallas
    z_fine, z_coarse, raw, ids, aux = residuals
    graw = jnp.moveaxis(g, -1, 0)
    th = jnp.arctan(raw)
    lo = math.radians(cfg.elev_lims[0])
    hi = math.radians(cfg.elev_lims[1])
    graw = jnp.where((th >= lo) & (th <= hi), graw, 0.0) \
        / (1.0 + raw * raw)

    in0, in1 = cfg.inner_shape
    bt0, bt1 = _pallas._bwd_tile_for(cfg.inner_shape, cfg.tile)
    lm_b, pm_b = _pallas._build_metas(_mr_schedule(cfg), bt0, bt1,
                                      cfg.step)
    tmap_b = tuple(map(tuple, _pallas.tile_schedule(
        (in0, in1), (bt0, bt1)).tolist()))
    budget = max(1, (1 << 20) // (bt0 * bt1 * 4))
    a_chunk_b = min(budget, cfg.azim_num)
    while cfg.azim_num % a_chunk_b:
        a_chunk_b -= 1

    def pyr_fn(zf, zc):
        return tuple(_mr_pyramid(cfg, zf, zc))

    pyramid, vjp_pyr = jax.vjp(pyr_fn, z_fine, z_coarse)
    level_cots, zcot = _pallas.backward_replay_fn(
        z_fine, graw, ids, aux, jnp.zeros((4,), jnp.int32),
        tile_map_static=tmap_b, levels_meta=tuple(lm_b),
        phases_meta=tuple(pm_b), pads=cfg.pads, tile=(bt0, bt1),
        a_chunk=a_chunk_b, a_num=cfg.azim_num, a_den=cfg.azim_num,
        offset=cfg.offset, inner_shape=cfg.inner_shape,
        dx=cfg.dx, dy=cfg.dy, step=cfg.step, dist=cfg.dist,
        near_ex=cfg.near_ex, ray_org_elev=cfg.ray_org_elev,
        interpret=cfg.interpret,
        level_shapes=tuple(tuple(a.shape) for a in pyramid))
    dzf, dzc = vjp_pyr(tuple(level_cots))
    off0, off1 = cfg.offset
    dzf = dzf.at[off0:off0 + in0, off1:off1 + in1].add(zcot)
    return dzf, dzc


_mr_hz.defvjp(_mr_fwd, _mr_bwd)


def horizon_sweep_multires_pallas(z_fine, z_coarse, *, ratio_log2,
                                  coarse_offset, dx, dy, offset,
                                  inner_shape, azim_num, dist_search,
                                  hori_acc=0.25, elev_ang_low_lim=-15.0,
                                  elev_ang_up_lim=89.98, ray_org_elev=0.01,
                                  rel_err=None, max_level=10,
                                  tile=(128, 256), a_chunk=None, mask=None,
                                  interpret=False):
    """Gridded horizon with a coarse far field on the fused Pallas engine.

    Same accuracy contract as :func:`horizon_sweep_multires`, same engine
    as :func:`horayzon_tpu.ops.pallas_sweep.horizon_sweep_pallas` — only
    the pyramid levels at and above ``ratio_log2`` come from ``z_coarse``,
    so the full-resolution outer grid never needs to exist (at the
    reference's 2 m Alps scale it would not fit HBM;
    examples/horizon/gridded_planar_DEM_2m.py:130-265).

    Differentiable w.r.t. ``z_fine`` AND ``z_coarse`` (winner-replay
    custom VJP, :func:`_mr_hz`).  Planar.  Returns (in0, in1, azim_num)
    float32 [radian].
    """
    from horayzon_tpu.ops import pallas_sweep as _pallas

    z_fine = jnp.asarray(z_fine, dtype=jnp.float32)
    plan = _pallas.plan_sweep(
        z_fine.shape, inner_shape=inner_shape, offset=offset, tile=tile,
        azim_num=azim_num, dist_search=dist_search, dx=dx, dy=dy,
        hori_acc=hori_acc, rel_err=rel_err, max_level=max_level,
        a_chunk=a_chunk)
    schedule = _sweep.build_schedule(plan["step"], plan["dist"],
                                     plan["rel_err"],
                                     max_level=plan["max_level"])
    _validate_fine_halo(schedule, ratio_log2, plan["step"], offset,
                        plan["inner_shape"], z_fine.shape)

    tmap = _pallas.tile_schedule(plan["inner_shape"], plan["tile"], mask)
    in0, in1 = plan["inner_shape"]
    lo = math.radians(float(elev_ang_low_lim))
    if tmap.shape[0] == 0:
        return jnp.full((in0, in1, azim_num), jnp.float32(lo))
    cfg = _MrCfg(
        levels_meta=plan["levels_meta"], phases_meta=plan["phases_meta"],
        pads=plan["pads"], tile=plan["tile"], a_chunk=plan["a_chunk"],
        azim_num=int(azim_num), offset=plan["offset"],
        inner_shape=plan["inner_shape"], dx=plan["dx"], dy=plan["dy"],
        step=plan["step"], dist=plan["dist"], near_ex=plan["near_ex"],
        n_safe=plan["n_safe"], ray_org_elev=float(ray_org_elev),
        elev_lims=(float(elev_ang_low_lim), float(elev_ang_up_lim)),
        rel_err=plan["rel_err"], max_level=plan["max_level"],
        ratio_log2=int(ratio_log2),
        coarse_offset=(int(coarse_offset[0]), int(coarse_offset[1])),
        tile_map=tuple(map(tuple, tmap.tolist())),
        interpret=bool(interpret))
    return _mr_hz(cfg, z_fine, jnp.asarray(z_coarse, dtype=jnp.float32))


def horizon_sweep_multires(z_fine, z_coarse, *, ratio_log2, coarse_offset,
                           dx, dy, offset, inner_shape, azim, dist_search,
                           hori_acc=0.25, elev_ang_low_lim=-15.0,
                           elev_ang_up_lim=89.98, ray_org_elev=0.01,
                           geom=None, u_xy=None, rel_err=None,
                           max_level=10):
    """Gridded horizon with a coarse far field.

    Same contract as :func:`horayzon_tpu.ops.sweep.horizon_sweep`, with the
    outer heightfield split into ``z_fine`` (inner + halo at full
    resolution) and ``z_coarse`` (far field at ``2**ratio_log2`` x spacing).

    The fine halo must be wide enough that all schedule phases at levels
    below ``ratio_log2`` stay inside the fine grid; a ValueError explains
    the required halo otherwise.
    """
    z_fine = jnp.asarray(z_fine, dtype=jnp.float32)
    step = min(abs(dx), abs(dy))
    if rel_err is None:
        rel_err = _sweep.default_rel_err(hori_acc)
    schedule = _sweep.build_schedule(step, dist_search, rel_err,
                                     max_level=max_level)

    in0, in1 = inner_shape
    off0, off1 = offset
    hf, wf = z_fine.shape
    _validate_fine_halo(schedule, ratio_log2, step, offset, inner_shape,
                        z_fine.shape)

    pyramid = combined_pyramid(z_fine, z_coarse, ratio_log2, coarse_offset,
                               schedule)
    azim = np.asarray(azim, dtype=np.float64)
    tables_np = _sweep.horizon_shift_tables(schedule, azim, dx, dy, offset,
                                            u_xy=u_xy)
    import jax
    tables = jax.tree_util.tree_map(jnp.asarray, tables_np)
    if u_xy is None:
        u_xy = np.stack([np.sin(azim), np.cos(azim)], axis=-1)
    trig = {
        "sin": jnp.asarray(np.sin(azim), dtype=jnp.float32),
        "cos": jnp.asarray(np.cos(azim), dtype=jnp.float32),
        "ux": jnp.asarray(u_xy[:, 0], dtype=jnp.float32),
        "uy": jnp.asarray(u_xy[:, 1], dtype=jnp.float32),
    }
    z_inner = z_fine[off0:off0 + in0, off1:off1 + in1]
    planar = geom is None
    if planar:
        z_org = z_inner + jnp.float32(ray_org_elev)
        geom_in = None
    else:
        geom_in = {k: jnp.asarray(v, dtype=jnp.float32)
                   for k, v in geom.items()}
        z_org = z_inner + jnp.float32(ray_org_elev) * geom_in["mz"]

    hori, _ = _sweep._horizon_core(
        pyramid, z_org, z_inner, geom_in, tables, trig,
        sched_meta=schedule.meta(), pads=schedule.pads,
        inner_shape=tuple(inner_shape), planar=planar, track_dist=False,
        outer_shape=(hf, wf))
    lo = math.radians(elev_ang_low_lim)
    hi = math.radians(elev_ang_up_lim)
    return jnp.clip(hori, lo, hi)
