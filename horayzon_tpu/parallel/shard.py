# Copyright (c) 2026
# MIT License
"""Sharded horizon/shadow sweeps over a TPU device mesh.

TBB work distribution over grid rows (reference horizon_comp.cpp:739-800)
becomes ``shard_map`` over a (tile, azim) mesh: the outer heightfield is
replicated (each shard needs terrain out to ``dist_search`` beyond its rows,
which for typical search distances is a large fraction of the domain), the
inner-domain rows are sharded along ``tile`` and the azimuth axis along
``azim``.  Results assemble with no communication beyond output layout; the
backward pass (gradients w.r.t. the shared heightfield) psums automatically
through the ``shard_map`` transpose.
"""

import collections
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from horayzon_tpu.ops import pallas_sweep as _pallas
from horayzon_tpu.ops import sweep as _sweep
from horayzon_tpu.parallel import mesh as _mesh

try:  # JAX >= 0.4.35 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map




def horizon_sweep_pallas_sharded(mesh, z_outer, *, dx, dy, offset,
                                 inner_shape, azim_num, dist_search,
                                 hori_acc=0.25, elev_ang_low_lim=-15.0,
                                 elev_ang_up_lim=89.98, ray_org_elev=0.01,
                                 rel_err=None, max_level=10,
                                 tile=(128, 256), a_chunk=None,
                                 tilt_ramp=None, interpret=False):
    """Multi-device *fused-Pallas* horizon sweep.

    The reference parallelises its entire hot path over TBB threads
    (horizon_comp.cpp:739-800); here the fused kernel itself runs per
    shard: inner rows are sharded along the mesh's ``tile`` axis and
    azimuths along ``azim``, each shard launching the Pallas grid over its
    local tiles with global (row, azimuth) shard offsets.  The outer
    heightfield is replicated (every shard's rays march up to
    ``dist_search`` past its rows).

    Same contract as :func:`horayzon_tpu.ops.pallas_sweep.
    horizon_sweep_pallas`.  Differentiable w.r.t. ``z_outer`` and
    ``tilt_ramp``: a custom VJP recomputes through a *sharded* XLA sweep
    (per-shard recompute; the gradient of the replicated heightfield
    psums through the ``shard_map`` transpose — SURVEY.md section 7
    step 8).

    Requirements: ``inner_shape[0]`` divisible by ``n_tile * tile[0]``,
    ``azim_num`` divisible by the azim axis (and the per-shard count by
    ``a_chunk``).
    """
    n_tile = mesh.shape[_mesh.AXIS_TILE]
    n_azim = mesh.shape[_mesh.AXIS_AZIM]
    in0, in1 = inner_shape
    if in0 % n_tile != 0:
        raise ValueError(f"inner rows {in0} not divisible by tile axis "
                         f"{n_tile}")
    if azim_num % n_azim != 0:
        raise ValueError(f"azimuth count {azim_num} not divisible by azim "
                         f"axis {n_azim}")
    rows = in0 // n_tile
    az_loc = azim_num // n_azim

    z_outer = jnp.asarray(z_outer, dtype=jnp.float32)
    plan = _pallas.plan_sweep(
        z_outer.shape, inner_shape=(rows, in1), offset=offset, tile=tile,
        azim_num=az_loc, dist_search=dist_search, dx=dx, dy=dy,
        hori_acc=hori_acc, rel_err=rel_err, max_level=max_level,
        a_chunk=a_chunk)
    cfg = _PShCfg(
        levels_meta=plan["levels_meta"], phases_meta=plan["phases_meta"],
        pads=plan["pads"], tile=plan["tile"], a_chunk=plan["a_chunk"],
        a_num=int(azim_num), az_loc=az_loc, rows=rows,
        offset=plan["offset"], inner_shape=(int(in0), int(in1)),
        outer_shape=tuple(z_outer.shape), dx=plan["dx"], dy=plan["dy"],
        step=plan["step"], dist=plan["dist"], near_ex=plan["near_ex"],
        ray_org_elev=float(ray_org_elev),
        elev_lims=(float(elev_ang_low_lim), float(elev_ang_up_lim)),
        rel_err=plan["rel_err"], max_level=plan["max_level"],
        interpret=bool(interpret))
    if tilt_ramp is not None:
        tilt_ramp = tuple(jnp.asarray(r, dtype=jnp.float32)
                          for r in tilt_ramp)
    return _pallas_hz_sharded(mesh, cfg, z_outer, tilt_ramp)


#: Hashable static config of one sharded Pallas horizon invocation (the
#: custom-VJP nondiff argument; see :func:`_pallas_hz_sharded`).
_PShCfg = collections.namedtuple("_PShCfg", [
    "levels_meta", "phases_meta", "pads", "tile", "a_chunk", "a_num",
    "az_loc", "rows", "offset", "inner_shape", "outer_shape", "dx", "dy",
    "step", "dist", "near_ex", "ray_org_elev", "elev_lims", "rel_err",
    "max_level", "interpret"])


def _psh_fwd_value(mesh, cfg, z_outer, tilt_ramp, emit_argmax=False):
    """Sharded fused-Pallas forward: per-shard pallas_call with global
    (row, azimuth) shard offsets.  Returns (in0, in1, azim_num), or with
    ``emit_argmax`` the raw triple ``(ratio, winner ids, stationary
    denominators)`` each shaped (azim_num, in0, in1) and sharded
    (azim, tile) — the winner-replay backward's residuals."""
    in0, in1 = cfg.inner_shape
    rows, az_loc = cfg.rows, cfg.az_loc
    # n_safe must hold for *every* shard: use the full-domain halo (the
    # last row shard has the least room below), not the per-shard one.
    off0, off1 = cfg.offset
    h_out, w_out = cfg.outer_shape
    halo = min(off0, off1, h_out - off0 - in0, w_out - off1 - in1)
    statics = dict(
        levels_meta=cfg.levels_meta, phases_meta=cfg.phases_meta,
        pads=cfg.pads, tile=cfg.tile, a_chunk=cfg.a_chunk,
        a_num=cfg.a_num, n_az_out=az_loc, offset=cfg.offset,
        inner_shape=(rows, in1), dx=cfg.dx, dy=cfg.dy,
        step=cfg.step, dist=cfg.dist, near_ex=cfg.near_ex,
        n_safe=max(0, halo - 2), ray_org_elev=cfg.ray_org_elev,
        elev_lims=cfg.elev_lims, interpret=cfg.interpret)
    tmap = jnp.asarray(_pallas.tile_schedule((rows, in1), cfg.tile))

    def shard_fn(z_rep, ramp_sh, tmap_rep):
        row0 = jax.lax.axis_index(_mesh.AXIS_TILE) * rows
        az0 = jax.lax.axis_index(_mesh.AXIS_AZIM) * az_loc
        zero = jnp.int32(0)
        soff = jnp.stack([row0, zero, az0, zero]).astype(jnp.int32)
        out = _pallas.pallas_forward_fn(z_rep, ramp_sh, tmap_rep, soff,
                                        emit_argmax=emit_argmax, **statics)
        return out                        # (az_loc, rows, in1) [x3]

    ramp_specs = jax.tree_util.tree_map(
        lambda _: P(_mesh.AXIS_TILE, None), tilt_ramp)
    out_spec = P(_mesh.AXIS_AZIM, _mesh.AXIS_TILE, None)
    # check_vma=False: pallas_call out_shapes carry no varying-axes type,
    # so the vma checker cannot thread them; sharding correctness is
    # covered by the equality tests (tests/test_sharding.py).
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, None), ramp_specs, P(None, None)),
        out_specs=(out_spec, out_spec, out_spec) if emit_argmax
        else out_spec,
        check_vma=False)
    out = jax.jit(fn, static_argnames=())(z_outer, tilt_ramp, tmap)
    if emit_argmax:
        return out                        # raw, ids, aux (global, sharded)
    return jnp.moveaxis(out, 0, -1)


def _psh_xla_equiv(mesh, cfg, z_outer, tilt_ramp):
    """Sharded XLA-sweep reproduction of the sharded Pallas forward, used
    to generate the backward pass: same schedule knobs, the kernel's f32
    azimuth-trig convention (bit-identical mip sample indices), tilt-ramp
    terms added to the raw ratio before the arctan.  Rows shard along
    'tile', azimuths along 'azim'; the replicated heightfield's cotangent
    psums automatically through the shard_map transpose."""
    schedule = _sweep.build_schedule(cfg.step, cfg.dist, cfg.rel_err,
                                     max_level=cfg.max_level)
    in0, in1 = cfg.inner_shape
    off0, off1 = cfg.offset
    h_out, w_out = cfg.outer_shape
    rows, az_loc = cfg.rows, cfg.az_loc
    halo = min(off0, off1, h_out - off0 - in0, w_out - off1 - in1)
    schedule = _sweep.mark_safe_phases(schedule, halo)
    azim = ((2.0 * np.pi) / cfg.a_num
            * np.arange(cfg.a_num)).astype(np.float32).astype(np.float64)
    tables_np = _sweep.horizon_shift_tables(schedule, azim, cfg.dx, cfg.dy,
                                            cfg.offset)
    tables = jax.tree_util.tree_map(jnp.asarray, tables_np)
    trig = {
        "sin": jnp.asarray(np.sin(azim), dtype=jnp.float32),
        "cos": jnp.asarray(np.cos(azim), dtype=jnp.float32),
        "ux": jnp.asarray(np.sin(azim), dtype=jnp.float32),
        "uy": jnp.asarray(np.cos(azim), dtype=jnp.float32),
    }
    z_inner = jax.lax.dynamic_slice(z_outer, (off0, off1), (in0, in1))
    z_org = z_inner + jnp.float32(cfg.ray_org_elev)
    sched_meta = schedule.meta()
    pads = schedule.pads

    def shard_fn(z_rep, z_org_sh, ramp_sh, tables_sh, trig_sh):
        row0 = jax.lax.axis_index(_mesh.AXIS_TILE) * rows
        z_rep = jax.lax.pcast(
            z_rep, (_mesh.AXIS_TILE, _mesh.AXIS_AZIM), to="varying")
        z_org_sh = jax.lax.pcast(z_org_sh, (_mesh.AXIS_AZIM,), to="varying")
        ramp_sh = jax.tree_util.tree_map(
            lambda a: jax.lax.pcast(a, (_mesh.AXIS_AZIM,), to="varying"),
            ramp_sh)
        adj = []
        for p, (kind, level, pad, *_rest) in enumerate(sched_meta):
            t = dict(tables_sh[f"p{p}"])
            if kind == "d2":
                t["m_i0"] = t["m_i0"] + row0
                t["e_i0"] = t["e_i0"] + row0
            elif kind == "d1":
                t["i0"] = t["i0"] + row0
            else:
                k = 2 ** level
                ci = (t["base_i"] - pad) * k + t["r_i"] + row0
                t["base_i"] = jnp.floor_divide(ci, k) + pad
                t["r_i"] = jnp.mod(ci, k)
            adj.append(t)
        z_inner_sh = z_org_sh - cfg.ray_org_elev
        ratio, _ = _sweep.horizon_core_fn(
            z_rep, z_org_sh, z_inner_sh, None, adj, trig_sh,
            sched_meta=sched_meta, pads=pads,
            inner_shape=(rows, in1), planar=True, track_dist=False,
            apply_arctan=False)
        if ramp_sh is not None:
            ratio = (ratio + trig_sh["sin"] * ramp_sh[0][..., None]
                     + trig_sh["cos"] * ramp_sh[1][..., None])
        return ratio

    tables_named = {f"p{p}": t for p, t in enumerate(tables)}
    table_specs = jax.tree_util.tree_map(
        lambda _: P(_mesh.AXIS_AZIM, None, None), tables_named)
    trig_specs = jax.tree_util.tree_map(lambda _: P(_mesh.AXIS_AZIM), trig)
    ramp_specs = jax.tree_util.tree_map(
        lambda _: P(_mesh.AXIS_TILE, None), tilt_ramp)
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, None), P(_mesh.AXIS_TILE, None), ramp_specs,
                  table_specs, trig_specs),
        out_specs=P(_mesh.AXIS_TILE, None, _mesh.AXIS_AZIM))
    ratio = fn(z_outer, z_org, tilt_ramp, tables_named, trig)
    return jnp.clip(jnp.arctan(ratio),
                    math.radians(cfg.elev_lims[0]),
                    math.radians(cfg.elev_lims[1]))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _pallas_hz_sharded(mesh, cfg, z_outer, tilt_ramp):
    """Differentiable sharded fused-kernel horizon: Pallas forward under
    shard_map, winner-replay Pallas backward (per-shard replay of the
    argmax-emitting forward's recorded winners; the replicated
    heightfield's cotangent psums over the mesh).  The single-device
    analog is pallas_sweep._pallas_hz; HZT_GRAD_RECOMPUTE=1 selects the
    round-3 sharded-XLA-recompute VJP as a debugging fallback."""
    return _psh_fwd_value(mesh, cfg, z_outer, tilt_ramp)


def _psh_fwd(mesh, cfg, z_outer, tilt_ramp):
    if _pallas._grad_mode() == "recompute":
        return (_psh_fwd_value(mesh, cfg, z_outer, tilt_ramp),
                (z_outer, tilt_ramp, None, None, None))
    raw, ids, aux = _psh_fwd_value(mesh, cfg, z_outer, tilt_ramp,
                                   emit_argmax=True)
    out = jnp.clip(jnp.arctan(jnp.moveaxis(raw, 0, -1)),
                   math.radians(cfg.elev_lims[0]),
                   math.radians(cfg.elev_lims[1]))
    return out, (z_outer, tilt_ramp, raw, ids, aux)


def _psh_bwd(mesh, cfg, residuals, g):
    z_outer, tilt_ramp, raw, ids, aux = residuals
    if raw is None:
        _, vjp = jax.vjp(lambda z, r: _psh_xla_equiv(mesh, cfg, z, r),
                         z_outer, tilt_ramp)
        return vjp(g)
    return _psh_bwd_replay(mesh, cfg, z_outer, tilt_ramp, raw, ids, aux, g)


def _psh_bwd_replay(mesh, cfg, z_outer, tilt_ramp, raw, ids, aux, g):
    """Sharded winner-replay backward: chain the cotangent through
    clip/arctan globally (elementwise — the residuals stay sharded), then
    run the replay kernel per shard with its global (row, azimuth) offsets
    and psum the replicated heightfield's cotangent over the mesh
    (SURVEY.md:159-162 — the TBB std::plus reduction of
    horizon_comp.cpp:739-800 made differentiable)."""
    in0, in1 = cfg.inner_shape
    rows, az_loc = cfg.rows, cfg.az_loc
    graw = jnp.moveaxis(g, -1, 0)
    th = jnp.arctan(raw)
    lo = math.radians(cfg.elev_lims[0])
    hi = math.radians(cfg.elev_lims[1])
    inside = (th >= lo) & (th <= hi)
    graw = jnp.where(inside, graw, 0.0) / (1.0 + raw * raw)

    dr = None
    if tilt_ramp is not None:
        azim32 = ((2.0 * np.pi) / cfg.a_num
                  * np.arange(cfg.a_num)).astype(np.float32)
        sin_t = jnp.asarray(np.sin(azim32.astype(np.float64)),
                            dtype=jnp.float32)
        cos_t = jnp.asarray(np.cos(azim32.astype(np.float64)),
                            dtype=jnp.float32)
        dr = (jnp.einsum("aij,a->ij", graw, sin_t),
              jnp.einsum("aij,a->ij", graw, cos_t))

    # Per-shard backward statics: the replay kernel re-tiles at the
    # (smaller) backward tile over the SHARD-LOCAL inner block.
    bt0, bt1 = _pallas._bwd_tile_for((rows, in1), cfg.tile)
    schedule = _sweep.build_schedule(cfg.step, cfg.dist, cfg.rel_err,
                                     max_level=cfg.max_level)
    lm_b, pm_b = _pallas._build_metas(schedule, bt0, bt1, cfg.step)
    tmap_b = tuple(map(tuple, _pallas.tile_schedule(
        (rows, in1), (bt0, bt1)).tolist()))
    budget = max(1, (1 << 20) // (bt0 * bt1 * 4))
    a_chunk_b = min(budget, az_loc)
    while az_loc % a_chunk_b:
        a_chunk_b -= 1
    statics = dict(
        tile_map_static=tmap_b, levels_meta=tuple(lm_b),
        phases_meta=tuple(pm_b), pads=cfg.pads, tile=(bt0, bt1),
        a_chunk=a_chunk_b, a_num=az_loc, a_den=cfg.a_num,
        offset=cfg.offset, inner_shape=(rows, in1), dx=cfg.dx, dy=cfg.dy,
        step=cfg.step, dist=cfg.dist, near_ex=cfg.near_ex,
        ray_org_elev=cfg.ray_org_elev, interpret=cfg.interpret,
        traced_assembly=True)

    def bwd_shard_fn(z_rep, graw_sh, ids_sh, aux_sh):
        row0 = jax.lax.axis_index(_mesh.AXIS_TILE) * rows
        az0 = jax.lax.axis_index(_mesh.AXIS_AZIM) * az_loc
        zero = jnp.int32(0)
        soff = jnp.stack([row0, zero, az0, zero]).astype(jnp.int32)
        dz = _pallas.backward_replay_fn(z_rep, graw_sh, ids_sh, aux_sh,
                                        soff, **statics)
        return jax.lax.psum(dz, (_mesh.AXIS_TILE, _mesh.AXIS_AZIM))

    sh_spec = P(_mesh.AXIS_AZIM, _mesh.AXIS_TILE, None)
    fn = shard_map(
        bwd_shard_fn, mesh=mesh,
        in_specs=(P(None, None), sh_spec, sh_spec, sh_spec),
        out_specs=P(None, None),
        check_vma=False)
    dz = jax.jit(fn)(z_outer, graw, ids, aux)
    return dz, dr


_pallas_hz_sharded.defvjp(_psh_fwd, _psh_bwd)


#: Hashable static config of one sharded multires Pallas invocation (the
#: custom-VJP nondiff argument; see :func:`_mr_hz_sharded`).
_MrShCfg = collections.namedtuple("_MrShCfg", [
    "levels_meta", "phases_meta", "pads", "tile", "a_chunk", "a_num",
    "az_loc", "rows", "offset", "inner_shape", "fine_shape", "dx", "dy",
    "step", "dist", "near_ex", "n_safe", "ray_org_elev", "elev_lims",
    "rel_err", "max_level", "ratio_log2", "coarse_offset", "is_fine",
    "origins", "lengths", "pyr_shapes", "interpret"])


def _mrsh_schedule(cfg):
    return _sweep.build_schedule(cfg.step, cfg.dist, cfg.rel_err,
                                 max_level=cfg.max_level)


def _mrsh_pyramid(cfg, z_fine, z_coarse):
    from horayzon_tpu.ops import multires as _mr
    return tuple(_mr.combined_pyramid(
        z_fine, z_coarse, cfg.ratio_log2, cfg.coarse_offset,
        _mrsh_schedule(cfg), pad_extra=_pallas.LEVEL_PAD_EXTRA))


def _mrsh_level_args(cfg, pyramid):
    """Per-shard level inputs from the combined pyramid, all-traced: fine
    levels become equal-length stacked row windows (one per tile shard,
    8-aligned origins, bottom-padded with the sentinel where a window
    overruns the level array); coarse levels pass through replicated.
    The VJP of this slicing (overlap-add of the window cotangents back
    into the level arrays) is exactly the backward's assembly step."""
    from horayzon_tpu.ops import mip as _mip
    args = []
    for p, m in enumerate(cfg.levels_meta):
        arr = pyramid[p]
        if not cfg.is_fine[p]:
            args.append(arr)
            continue
        length = cfg.lengths[p]
        origs = cfg.origins[p]
        overrun = max(o + length for o in origs) - arr.shape[0]
        if overrun > 0:
            arr = jnp.pad(arr, ((0, overrun), (0, 0)),
                          constant_values=_mip.PAD_VALUE)
        args.append(jnp.stack([
            jax.lax.slice(arr, (o, 0), (o + length, arr.shape[1]))
            for o in origs]))
    return tuple(args)


def _mrsh_soff(cfg, row0, az0):
    """In-kernel shard offsets: global (row, azim) starts plus each fine
    level's slice origin (the same static formula the host slicing used,
    evaluated on the traced row0)."""
    zero = jnp.int32(0)
    origs = [((cfg.offset[0] + row0) // (2 ** m[0]) + 2) // 8 * 8
             if cfg.is_fine[p] else zero
             for p, m in enumerate(cfg.levels_meta)]
    return jnp.stack([row0, zero, az0, zero] + origs).astype(jnp.int32)


def _mrsh_fwd_value(mesh, cfg, z_fine, z_coarse, emit_argmax=False):
    in0, in1 = cfg.inner_shape
    rows, az_loc = cfg.rows, cfg.az_loc
    off0, off1 = cfg.offset
    hf, wf = cfg.fine_shape
    pyramid = _mrsh_pyramid(cfg, z_fine, z_coarse)
    level_args = _mrsh_level_args(cfg, pyramid)
    statics = dict(
        levels_meta=cfg.levels_meta, phases_meta=cfg.phases_meta,
        pads=cfg.pads, tile=cfg.tile, a_chunk=cfg.a_chunk,
        a_num=cfg.a_num, n_az_out=az_loc, offset=cfg.offset,
        inner_shape=(rows, in1), dx=cfg.dx, dy=cfg.dy,
        step=cfg.step, dist=cfg.dist, near_ex=cfg.near_ex,
        n_safe=cfg.n_safe, ray_org_elev=cfg.ray_org_elev,
        elev_lims=cfg.elev_lims, inner_start=(0, off1),
        outer_shape=(hf, wf), interpret=cfg.interpret,
        emit_argmax=emit_argmax)
    tmap = jnp.asarray(_pallas.tile_schedule((rows, in1), cfg.tile))
    z_rows = z_fine[off0:off0 + in0, :]

    def shard_fn(z_sh, tmap_rep, *lvl_args):
        row0 = jax.lax.axis_index(_mesh.AXIS_TILE) * rows
        az0 = jax.lax.axis_index(_mesh.AXIS_AZIM) * az_loc
        soff = _mrsh_soff(cfg, row0, az0)
        pyr = tuple(a[0] if cfg.is_fine[p] else a
                    for p, a in enumerate(lvl_args))
        return _pallas.pallas_forward_fn(z_sh, None, tmap_rep, soff,
                                         pyramid=pyr, **statics)

    lvl_specs = tuple(P(_mesh.AXIS_TILE, None, None) if f
                      else P(None, None) for f in cfg.is_fine)
    out_spec = P(_mesh.AXIS_AZIM, _mesh.AXIS_TILE, None)
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(_mesh.AXIS_TILE, None), P(None, None)) + lvl_specs,
        out_specs=(out_spec, out_spec, out_spec) if emit_argmax
        else out_spec,
        check_vma=False)
    out = jax.jit(fn)(z_rows, tmap, *level_args)
    if emit_argmax:
        return out
    return jnp.moveaxis(out, 0, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _mr_hz_sharded(mesh, cfg, z_fine, z_coarse):
    """Differentiable memory-scalable sharded multires horizon: per-shard
    fused-Pallas forward over sliced fine windows + replicated coarse far
    field, winner-replay backward whose window cotangents route through
    the VJP of the window slicing + combined-pyramid build — gradients
    reach both ``z_fine`` (sharded overlap-add) and ``z_coarse``."""
    return _mrsh_fwd_value(mesh, cfg, z_fine, z_coarse)


def _mrsh_fwd(mesh, cfg, z_fine, z_coarse):
    raw, ids, aux = _mrsh_fwd_value(mesh, cfg, z_fine, z_coarse,
                                    emit_argmax=True)
    out = jnp.clip(jnp.arctan(jnp.moveaxis(raw, 0, -1)),
                   math.radians(cfg.elev_lims[0]),
                   math.radians(cfg.elev_lims[1]))
    return out, (z_fine, z_coarse, raw, ids, aux)


def _mrsh_bwd(mesh, cfg, residuals, g):
    z_fine, z_coarse, raw, ids, aux = residuals
    in0, in1 = cfg.inner_shape
    rows, az_loc = cfg.rows, cfg.az_loc
    off0, off1 = cfg.offset
    graw = jnp.moveaxis(g, -1, 0)
    th = jnp.arctan(raw)
    lo = math.radians(cfg.elev_lims[0])
    hi = math.radians(cfg.elev_lims[1])
    graw = jnp.where((th >= lo) & (th <= hi), graw, 0.0) \
        / (1.0 + raw * raw)

    bt0, bt1 = _pallas._bwd_tile_for((rows, in1), cfg.tile)
    lm_b, pm_b = _pallas._build_metas(_mrsh_schedule(cfg), bt0, bt1,
                                      cfg.step)
    tmap_b = tuple(map(tuple, _pallas.tile_schedule(
        (rows, in1), (bt0, bt1)).tolist()))
    budget = max(1, (1 << 20) // (bt0 * bt1 * 4))
    a_chunk_b = min(budget, az_loc)
    while az_loc % a_chunk_b:
        a_chunk_b -= 1
    # per-shard level-cotangent shapes: the sliced windows for fine
    # levels, the full arrays for coarse ones
    shard_shapes = tuple(
        (cfg.lengths[p], cfg.pyr_shapes[p][1]) if cfg.is_fine[p]
        else cfg.pyr_shapes[p]
        for p in range(len(cfg.levels_meta)))
    statics = dict(
        tile_map_static=tmap_b, levels_meta=tuple(lm_b),
        phases_meta=tuple(pm_b), pads=cfg.pads, tile=(bt0, bt1),
        a_chunk=a_chunk_b, a_num=az_loc, a_den=cfg.a_num,
        offset=cfg.offset, inner_shape=(rows, in1), dx=cfg.dx, dy=cfg.dy,
        step=cfg.step, dist=cfg.dist, near_ex=cfg.near_ex,
        ray_org_elev=cfg.ray_org_elev, interpret=cfg.interpret,
        level_shapes=shard_shapes, traced_assembly=True)
    z_rows = z_fine[off0:off0 + in0, :]

    def bwd_shard_fn(z_sh, graw_sh, ids_sh, aux_sh):
        row0 = jax.lax.axis_index(_mesh.AXIS_TILE) * rows
        az0 = jax.lax.axis_index(_mesh.AXIS_AZIM) * az_loc
        soff = _mrsh_soff(cfg, row0, az0)
        level_cots, zcot = _pallas.backward_replay_fn(
            z_sh, graw_sh, ids_sh, aux_sh, soff,
            inner_start=(0, off1), **statics)
        outs = []
        for p, c in enumerate(level_cots):
            if cfg.is_fine[p]:
                # windows differ per tile shard; azim shards share them
                outs.append(jax.lax.psum(c, (_mesh.AXIS_AZIM,))[None])
            else:
                outs.append(jax.lax.psum(
                    c, (_mesh.AXIS_TILE, _mesh.AXIS_AZIM)))
        zcot = jax.lax.psum(zcot, (_mesh.AXIS_AZIM,))
        return tuple(outs), zcot

    sh_spec = P(_mesh.AXIS_AZIM, _mesh.AXIS_TILE, None)
    cot_specs = tuple(P(_mesh.AXIS_TILE, None, None) if f
                      else P(None, None) for f in cfg.is_fine)
    fn = shard_map(
        bwd_shard_fn, mesh=mesh,
        in_specs=(P(_mesh.AXIS_TILE, None), sh_spec, sh_spec, sh_spec),
        out_specs=(cot_specs, P(_mesh.AXIS_TILE, None)),
        check_vma=False)
    level_cots, zcot = jax.jit(fn)(z_rows, graw, ids, aux)

    def slice_fn(zf, zc):
        return _mrsh_level_args(cfg, _mrsh_pyramid(cfg, zf, zc))

    _, vjp_slice = jax.vjp(slice_fn, z_fine, z_coarse)
    dzf, dzc = vjp_slice(tuple(level_cots))
    dzf = dzf.at[off0:off0 + in0, off1:off1 + in1].add(zcot)
    return dzf, dzc


_mr_hz_sharded.defvjp(_mrsh_fwd, _mrsh_bwd)


def horizon_sweep_multires_pallas_sharded(
        mesh, z_fine, z_coarse, *, ratio_log2, coarse_offset, dx, dy,
        offset, inner_shape, azim_num, dist_search, hori_acc=0.25,
        elev_ang_low_lim=-15.0, elev_ang_up_lim=89.98, ray_org_elev=0.01,
        rel_err=None, max_level=10, tile=(128, 256), a_chunk=None,
        interpret=False):
    """Memory-scalable multi-device multires horizon (fused Pallas engine).

    The composition the 2 m Alps workflow needs
    (examples/horizon/gridded_planar_DEM_2m.py:130-265 +
    horizon_comp.cpp:739-800 in the reference): inner rows shard along the
    mesh's ``tile`` axis and azimuths along ``azim``, and — unlike
    :func:`horizon_sweep_pallas_sharded`, which replicates the full outer
    heightfield — each shard holds only

    * its own *window* of every fine-derived pyramid level (its rows plus
      the marching halo, sliced at an 8-aligned row origin so pooled
      companions and early exits stay bitwise equal to the single-device
      kernel), and
    * the shared coarse far-field levels (tiny: the whole search distance
      at ``2**ratio_log2`` x spacing), replicated.

    Per-shard fine memory is ``O(rows_per_shard + halo)`` instead of
    ``O(inner rows + 2 * search distance)``, so domain size scales with
    chip count.  Same accuracy contract as
    :func:`horayzon_tpu.ops.multires.horizon_sweep_multires_pallas`;
    planar.  Differentiable w.r.t. ``z_fine`` AND ``z_coarse``
    (winner-replay custom VJP, :func:`_mr_hz_sharded`).  Returns
    (in0, in1, azim_num) float32 [radian].

    Requirements: ``inner_shape[0]`` divisible by ``n_tile * tile[0]``
    and ``azim_num`` by the azim axis.
    """
    from horayzon_tpu.ops import multires as _mr

    n_tile = mesh.shape[_mesh.AXIS_TILE]
    n_azim = mesh.shape[_mesh.AXIS_AZIM]
    in0, in1 = inner_shape
    if in0 % n_tile != 0:
        raise ValueError(f"inner rows {in0} not divisible by tile axis "
                         f"{n_tile}")
    if azim_num % n_azim != 0:
        raise ValueError(f"azimuth count {azim_num} not divisible by azim "
                         f"axis {n_azim}")
    rows = in0 // n_tile
    az_loc = azim_num // n_azim

    z_fine = jnp.asarray(z_fine, dtype=jnp.float32)
    z_coarse = jnp.asarray(z_coarse, dtype=jnp.float32)
    hf, wf = z_fine.shape
    plan = _pallas.plan_sweep(
        z_fine.shape, inner_shape=(rows, in1), offset=offset, tile=tile,
        azim_num=az_loc, dist_search=dist_search, dx=dx, dy=dy,
        hori_acc=hori_acc, rel_err=rel_err, max_level=max_level,
        a_chunk=a_chunk)
    schedule = _sweep.build_schedule(plan["step"], plan["dist"],
                                     plan["rel_err"],
                                     max_level=plan["max_level"])
    _mr._validate_fine_halo(schedule, ratio_log2, plan["step"], offset,
                            inner_shape, z_fine.shape)
    off0, off1 = plan["offset"]
    t0, _t1 = plan["tile"]
    lm = plan["levels_meta"]
    # n_safe must hold for every shard: use the full-domain halo.
    halo = min(off0, off1, hf - off0 - in0, wf - off1 - in1)

    # Per-shard window geometry for the fine-derived levels.  Origins are
    # 8-aligned DMA-start lower bounds; windows are equal-length
    # (shard_map blocks must agree) and must also cover the BACKWARD
    # kernel's (smaller-tile, hence higher-start) window positions, whose
    # alignment rounding can land a few rows past the forward windows.
    bt0, bt1 = _pallas._bwd_tile_for((rows, in1), plan["tile"])
    lm_b, _ = _pallas._build_metas(schedule, bt0, bt1, plan["step"])

    def _origin(s, k):
        return ((off0 + s * rows) // k + 2) // 8 * 8

    is_fine = tuple(m[0] < ratio_log2 for m in lm)
    pyr_shapes = tuple(
        tuple(s.shape) for s in jax.eval_shape(
            lambda zf, zc: tuple(_mr.combined_pyramid(
                zf, zc, ratio_log2,
                (int(coarse_offset[0]), int(coarse_offset[1])),
                schedule, pad_extra=_pallas.LEVEL_PAD_EXTRA)),
            z_fine, z_coarse))
    origins = []
    lengths = []
    for p, m in enumerate(lm):
        if not is_fine[p]:
            origins.append(())
            lengths.append(0)
            continue
        k = 2 ** m[0]
        origs = tuple(_origin(s, k) for s in range(n_tile))
        length = max(
            max(((off0 + (s + 1) * rows - t0) // k + 2 - origs[s])
                // 8 * 8 + m[2],
                ((off0 + (s + 1) * rows - bt0) // k + 2 - origs[s])
                // 8 * 8 + lm_b[p][2]) for s in range(n_tile))
        origins.append(origs)
        lengths.append(int(length))

    cfg = _MrShCfg(
        levels_meta=lm, phases_meta=plan["phases_meta"],
        pads=plan["pads"], tile=plan["tile"], a_chunk=plan["a_chunk"],
        a_num=int(azim_num), az_loc=az_loc, rows=rows,
        offset=plan["offset"], inner_shape=(int(in0), int(in1)),
        fine_shape=(int(hf), int(wf)), dx=plan["dx"], dy=plan["dy"],
        step=plan["step"], dist=plan["dist"], near_ex=plan["near_ex"],
        n_safe=max(0, halo - 2), ray_org_elev=float(ray_org_elev),
        elev_lims=(float(elev_ang_low_lim), float(elev_ang_up_lim)),
        rel_err=plan["rel_err"], max_level=plan["max_level"],
        ratio_log2=int(ratio_log2),
        coarse_offset=(int(coarse_offset[0]), int(coarse_offset[1])),
        is_fine=is_fine, origins=tuple(origins), lengths=tuple(lengths),
        pyr_shapes=pyr_shapes, interpret=bool(interpret))
    return _mr_hz_sharded(mesh, cfg, z_fine, z_coarse)


#: Hashable static config of one sharded Pallas shadow invocation (the
#: custom-VJP nondiff argument; see :func:`_sh_sharded`).
_ShShCfg = collections.namedtuple("_ShShCfg", [
    "levels_meta", "phases_meta", "pads", "tile", "t_chunk", "num_sun",
    "t_pad", "rows", "offset", "inner_shape", "dx", "dy", "step", "dist",
    "near_ex", "n_safe", "grid_origin", "interpret"])


def shadow_metric_pallas_sharded(mesh, z_outer, z_org_r, z_inner_r,
                                 sun_table, *, schedule, offset,
                                 inner_shape, dx, dy, grid_origin,
                                 tile=(128, 256), t_chunk=None,
                                 interpret=False):
    """Multi-device fused-Pallas shadow occlusion metric.

    Same contract as :func:`horayzon_tpu.ops.pallas_sweep.
    shadow_metric_pallas` with ``exact_metric=True``: rows sharded over
    the mesh's ``tile`` axis, the whole sun batch computed per shard (the
    azim axis, if present, carries replicated work).  Mirrors reference
    shadow_comp.cpp:390-489 (TBB rows).  Differentiable w.r.t.
    ``z_outer`` and ``z_org_r`` via the shadow winner-replay custom VJP
    (per-shard replay; the replicated heightfield's cotangent psums over
    the tile axis)."""
    n_tile = mesh.shape[_mesh.AXIS_TILE]
    in0, in1 = inner_shape
    if in0 % n_tile != 0:
        raise ValueError(f"inner rows {in0} not divisible by tile axis "
                         f"{n_tile}")
    rows = in0 // n_tile

    z_outer = jnp.asarray(z_outer, dtype=jnp.float32)
    sun_table = np.asarray(sun_table, dtype=np.float32)
    num_sun = sun_table.shape[0]
    t0, t1 = tile
    t0 = min(t0, rows)
    t1 = min(t1, in1)
    if rows % t0 or in1 % t1:
        raise ValueError(f"per-shard rows {(rows, in1)} must be divisible "
                         f"by tile {(t0, t1)}")
    if t_chunk is None:
        t_chunk = min(num_sun, 8)
    t_pad = ((num_sun + t_chunk - 1) // t_chunk) * t_chunk
    if t_pad != num_sun:
        sun_table = np.concatenate(
            [sun_table, np.repeat(sun_table[-1:], t_pad - num_sun, 0)], 0)

    levels_meta, phases_meta = _pallas._build_metas(schedule, t0, t1,
                                                    schedule.step)
    off0, off1 = offset
    h_out, w_out = z_outer.shape
    halo = min(off0, off1, h_out - off0 - in0, w_out - off1 - in1)
    near_ex = (schedule.phases[0].num
               if schedule.phases[0].kind == "d2" else 0)
    cfg = _ShShCfg(
        levels_meta=tuple(levels_meta), phases_meta=tuple(phases_meta),
        pads=schedule.pads, tile=(t0, t1), t_chunk=t_chunk,
        num_sun=int(num_sun), t_pad=int(t_pad), rows=rows,
        offset=(int(off0), int(off1)), inner_shape=(int(in0), int(in1)),
        dx=float(dx), dy=float(dy), step=float(schedule.step),
        dist=float(schedule.dist), near_ex=near_ex,
        n_safe=max(0, halo - 2),
        grid_origin=(float(grid_origin[0]), float(grid_origin[1])),
        interpret=bool(interpret))
    return _sh_sharded(mesh, cfg, z_outer,
                       jnp.asarray(z_org_r, jnp.float32),
                       jnp.asarray(z_inner_r, jnp.float32),
                       jnp.asarray(sun_table))


def _shsh_fwd_value(mesh, cfg, z_outer, z_org_r, z_inner_r, sun_table,
                    emit_argmax=False):
    in0, in1 = cfg.inner_shape
    rows = cfg.rows
    statics = dict(
        levels_meta=cfg.levels_meta, phases_meta=cfg.phases_meta,
        pads=cfg.pads, tile=cfg.tile, t_chunk=cfg.t_chunk,
        offset=cfg.offset, inner_shape=(rows, in1), dx=cfg.dx, dy=cfg.dy,
        step=cfg.step, dist=cfg.dist, near_ex=cfg.near_ex,
        n_safe=cfg.n_safe, grid_origin=cfg.grid_origin,
        interpret=cfg.interpret, emit_argmax=emit_argmax)
    tmap = jnp.asarray(_pallas.tile_schedule((rows, in1), cfg.tile))

    def shard_fn(z_rep, z_org_sh, z_inner_sh, table_rep, tmap_rep):
        row0 = jax.lax.axis_index(_mesh.AXIS_TILE) * rows
        zero = jnp.int32(0)
        soff = jnp.stack([row0, zero, zero, zero]).astype(jnp.int32)
        return _pallas.shadow_forward_fn(
            z_rep, z_org_sh, z_inner_sh, table_rep, tmap_rep, soff,
            **statics)

    out_spec = P(None, _mesh.AXIS_TILE, None)
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, None), P(_mesh.AXIS_TILE, None),
                  P(_mesh.AXIS_TILE, None), P(None, None), P(None, None)),
        out_specs=(out_spec, out_spec, out_spec) if emit_argmax
        else out_spec,
        check_vma=False)
    return jax.jit(fn)(z_outer, z_org_r, z_inner_r, sun_table, tmap)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _sh_sharded(mesh, cfg, z_outer, z_org_r, z_inner_r, sun_table):
    return _shsh_fwd_value(mesh, cfg, z_outer, z_org_r, z_inner_r,
                           sun_table)[:cfg.num_sun]


def _shsh_fwd(mesh, cfg, z_outer, z_org_r, z_inner_r, sun_table):
    met, ids, aux = _shsh_fwd_value(mesh, cfg, z_outer, z_org_r,
                                    z_inner_r, sun_table,
                                    emit_argmax=True)
    return met[:cfg.num_sun], (z_outer, z_org_r, z_inner_r, sun_table,
                               ids, aux)


def _shsh_bwd(mesh, cfg, residuals, g):
    z_outer, z_org_r, z_inner_r, sun_table, ids, aux = residuals
    if cfg.t_pad > cfg.num_sun:
        g = jnp.pad(g, ((0, cfg.t_pad - cfg.num_sun), (0, 0), (0, 0)))
    in0, in1 = cfg.inner_shape
    rows = cfg.rows
    bt0, bt1 = _pallas._bwd_tile_for((rows, in1), cfg.tile)
    lm_b, pm_b = _pallas._metas_for_tile(cfg.pads, cfg.phases_meta,
                                         bt0, bt1)
    tmap_b = tuple(map(tuple, _pallas.tile_schedule(
        (rows, in1), (bt0, bt1)).tolist()))
    statics = dict(
        tile_map_static=tmap_b, levels_meta=tuple(lm_b),
        phases_meta=tuple(pm_b), pads=cfg.pads, tile=(bt0, bt1),
        t_chunk=cfg.t_chunk, num_sun=cfg.t_pad, offset=cfg.offset,
        inner_shape=(rows, in1), dx=cfg.dx, dy=cfg.dy, step=cfg.step,
        dist=cfg.dist, near_ex=cfg.near_ex, grid_origin=cfg.grid_origin,
        interpret=cfg.interpret, traced_assembly=True)

    def bwd_shard_fn(z_rep, zorg_sh, g_sh, ids_sh, aux_sh, table_rep):
        row0 = jax.lax.axis_index(_mesh.AXIS_TILE) * rows
        zero = jnp.int32(0)
        soff = jnp.stack([row0, zero, zero, zero]).astype(jnp.int32)
        dz, dzorg = _pallas.shadow_backward_replay_fn(
            z_rep, zorg_sh, g_sh, ids_sh, aux_sh, table_rep,
            shard_off=soff, **statics)
        # the sun batch is replicated over the azim axis (identical work
        # per azim shard), so only the tile axis sums contributions
        return jax.lax.psum(dz, (_mesh.AXIS_TILE,)), dzorg

    sh_spec = P(None, _mesh.AXIS_TILE, None)
    fn = shard_map(
        bwd_shard_fn, mesh=mesh,
        in_specs=(P(None, None), P(_mesh.AXIS_TILE, None), sh_spec,
                  sh_spec, sh_spec, P(None, None)),
        out_specs=(P(None, None), P(_mesh.AXIS_TILE, None)),
        check_vma=False)
    dz, dzorg = jax.jit(fn)(z_outer, z_org_r, g, ids, aux, sun_table)
    return (dz, dzorg, jnp.zeros_like(z_inner_r),
            jnp.zeros_like(sun_table))


_sh_sharded.defvjp(_shsh_fwd, _shsh_bwd)


def horizon_sweep_sharded(mesh, z_outer, *, dx, dy, offset, inner_shape,
                          azim, dist_search, hori_acc=0.25,
                          elev_ang_low_lim=-15.0, elev_ang_up_lim=89.98,
                          ray_org_elev=0.01, geom=None, u_xy=None,
                          rel_err=None):
    """Multi-device horizon sweep; same contract as
    :func:`horayzon_tpu.ops.sweep.horizon_sweep`.

    Requirements: ``inner_shape[0]`` divisible by the mesh's tile axis and
    ``len(azim)`` divisible by its azim axis.
    """
    n_tile = mesh.shape[_mesh.AXIS_TILE]
    n_azim = mesh.shape[_mesh.AXIS_AZIM]
    in0, in1 = inner_shape
    a_num = len(azim)
    if in0 % n_tile != 0:
        raise ValueError(f"inner rows {in0} not divisible by tile axis "
                         f"{n_tile}")
    if a_num % n_azim != 0:
        raise ValueError(f"azimuth count {a_num} not divisible by azim axis "
                         f"{n_azim}")
    rows = in0 // n_tile

    z_outer = jnp.asarray(z_outer, dtype=jnp.float32)
    step = min(abs(dx), abs(dy))
    if rel_err is None:
        rel_err = _sweep.default_rel_err(hori_acc)
    schedule = _sweep.build_schedule(step, dist_search * 1.0, rel_err)
    azim = np.asarray(azim, dtype=np.float64)
    tables_np = _sweep.horizon_shift_tables(schedule, azim, dx, dy, offset,
                                            u_xy=u_xy)
    tables = jax.tree_util.tree_map(jnp.asarray, tables_np)
    if u_xy is None:
        u_xy = np.stack([np.sin(azim), np.cos(azim)], axis=-1)
    trig = {
        "sin": jnp.asarray(np.sin(azim), dtype=jnp.float32),
        "cos": jnp.asarray(np.cos(azim), dtype=jnp.float32),
        "ux": jnp.asarray(u_xy[:, 0], dtype=jnp.float32),
        "uy": jnp.asarray(u_xy[:, 1], dtype=jnp.float32),
    }
    off0, off1 = offset
    z_inner = jax.lax.dynamic_slice(z_outer, (off0, off1), (in0, in1))
    planar = geom is None
    if planar:
        z_org = z_inner + jnp.float32(ray_org_elev)
        geom_in = {}
    else:
        geom_in = {k: jnp.asarray(v, dtype=jnp.float32)
                   for k, v in geom.items()}
        z_org = z_inner + jnp.float32(ray_org_elev) * geom_in["mz"]

    sched_meta = schedule.meta()
    pads = schedule.pads

    # Per-shard: shift row-slice starts by the tile's first row.
    def shard_fn(z_outer_rep, z_org_sh, geom_sh, tables_sh, trig_sh):
        tile_idx = jax.lax.axis_index(_mesh.AXIS_TILE)
        row0 = tile_idx * rows
        # Tile-sharded fields combine with azim-sharded tables inside the
        # sweep's scans; mark them varying over the azim axis too so the
        # scan carry types line up.
        z_outer_rep = jax.lax.pcast(
            z_outer_rep, (_mesh.AXIS_TILE, _mesh.AXIS_AZIM), to="varying")
        z_org_sh = jax.lax.pcast(z_org_sh, (_mesh.AXIS_AZIM,), to="varying")
        geom_sh = jax.tree_util.tree_map(
            lambda a: jax.lax.pcast(a, (_mesh.AXIS_AZIM,), to="varying"),
            geom_sh)
        adj = []
        for p, (kind, level, pad, *_rest) in enumerate(sched_meta):
            t = dict(tables_sh[f"p{p}"])
            if kind == "d2":
                t["m_i0"] = t["m_i0"] + row0
                t["e_i0"] = t["e_i0"] + row0
            elif kind == "d1":
                t["i0"] = t["i0"] + row0
            else:
                k = 2 ** level
                ci = (t["base_i"] - pad) * k + t["r_i"] + row0
                t["base_i"] = jnp.floor_divide(ci, k) + pad
                t["r_i"] = jnp.mod(ci, k)
            adj.append(t)
        z_inner_sh = (z_org_sh - ray_org_elev if planar
                      else z_org_sh - ray_org_elev * geom_sh["mz"])
        hori, _ = _sweep.horizon_core_fn(
            z_outer_rep, z_org_sh, z_inner_sh,
            geom_sh if not planar else None,
            adj, trig_sh,
            sched_meta=sched_meta, pads=pads,
            inner_shape=(rows, in1), planar=planar, track_dist=False)
        return hori

    tables_named = {f"p{p}": t for p, t in enumerate(tables)}

    table_specs = jax.tree_util.tree_map(
        lambda _: P(_mesh.AXIS_AZIM, None, None), tables_named)
    trig_specs = jax.tree_util.tree_map(lambda _: P(_mesh.AXIS_AZIM), trig)
    geom_specs = jax.tree_util.tree_map(
        lambda _: P(_mesh.AXIS_TILE, None), geom_in)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, None), P(_mesh.AXIS_TILE, None), geom_specs,
                  table_specs, trig_specs),
        out_specs=P(_mesh.AXIS_TILE, None, _mesh.AXIS_AZIM))
    hori = jax.jit(fn)(z_outer, z_org, geom_in, tables_named, trig)
    lo = math.radians(elev_ang_low_lim)
    hi = math.radians(elev_ang_up_lim)
    return jnp.clip(hori, lo, hi)


def shadow_metric_sharded(mesh, z_outer, z_org, z_inner, m_slope, u_cells,
                          schedule, offset, inner_shape):
    """Multi-device shadow occlusion metric (rows sharded over 'tile').

    Same contract as :func:`horayzon_tpu.ops.sweep.shadow_metric`; the sun
    direction/slope may be traced (per-timestep).  The azim mesh axis, if
    present, is unused (replicated work)."""
    n_tile = mesh.shape[_mesh.AXIS_TILE]
    in0, in1 = inner_shape
    if in0 % n_tile != 0:
        raise ValueError(f"inner rows {in0} not divisible by tile axis "
                         f"{n_tile}")
    rows = in0 // n_tile
    s_phases = tuple(
        jnp.asarray(_sweep._pad_unroll(s[None, :], _sweep.UNROLL)[0])
        for s in schedule.s_values)
    sched_meta = schedule.meta()
    pads = schedule.pads

    def shard_fn(z_rep, z_org_sh, z_inner_sh, m_sh, u_c, phases):
        row0 = jax.lax.axis_index(_mesh.AXIS_TILE) * rows
        return _sweep.shadow_metric_core_fn(
            z_rep, z_org_sh, z_inner_sh, m_sh, u_c, phases,
            sched_meta=sched_meta, pads=pads,
            offset=(int(offset[0]), int(offset[1])),
            inner_shape=(rows, in1), row_shift=row0)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, None), P(_mesh.AXIS_TILE, None),
                  P(_mesh.AXIS_TILE, None), P(_mesh.AXIS_TILE, None),
                  P(None), jax.tree_util.tree_map(lambda _: P(None, None),
                                                  s_phases)),
        out_specs=P(_mesh.AXIS_TILE, None))
    return jax.jit(fn)(
        jnp.asarray(z_outer, jnp.float32), jnp.asarray(z_org, jnp.float32),
        jnp.asarray(z_inner, jnp.float32),
        jnp.asarray(m_slope, jnp.float32),
        jnp.asarray(u_cells, jnp.float32), s_phases)
