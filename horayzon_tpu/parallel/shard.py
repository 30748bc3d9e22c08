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


def _psh_fwd_value(mesh, cfg, z_outer, tilt_ramp):
    """Sharded fused-Pallas forward: per-shard pallas_call with global
    (row, azimuth) shard offsets.  Returns (in0, in1, azim_num)."""
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
                                        **statics)
        return out                        # (az_loc, rows, in1)

    ramp_specs = jax.tree_util.tree_map(
        lambda _: P(_mesh.AXIS_TILE, None), tilt_ramp)
    # check_vma=False: pallas_call out_shapes carry no varying-axes type,
    # so the vma checker cannot thread them; sharding correctness is
    # covered by the equality tests (tests/test_sharding.py).
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, None), ramp_specs, P(None, None)),
        out_specs=P(_mesh.AXIS_AZIM, _mesh.AXIS_TILE, None),
        check_vma=False)
    out = jax.jit(fn)(z_outer, tilt_ramp, tmap)
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
    shard_map, sharded-XLA-sweep backward (recompute-based custom VJP; the
    single-device analog is pallas_sweep._pallas_hz)."""
    return _psh_fwd_value(mesh, cfg, z_outer, tilt_ramp)


def _psh_fwd(mesh, cfg, z_outer, tilt_ramp):
    return _psh_fwd_value(mesh, cfg, z_outer, tilt_ramp), \
        (z_outer, tilt_ramp)


def _psh_bwd(mesh, cfg, residuals, g):
    z_outer, tilt_ramp = residuals
    _, vjp = jax.vjp(lambda z, r: _psh_xla_equiv(mesh, cfg, z, r),
                     z_outer, tilt_ramp)
    return vjp(g)


_pallas_hz_sharded.defvjp(_psh_fwd, _psh_bwd)


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
    forward-only, planar.  Returns (in0, in1, azim_num) float32 [radian].

    Requirements: ``inner_shape[0]`` divisible by ``n_tile * tile[0]``
    and ``azim_num`` by the azim axis.
    """
    from horayzon_tpu.ops import mip as _mip
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
    pyramid = _mr.combined_pyramid(z_fine, z_coarse, ratio_log2,
                                   coarse_offset, schedule,
                                   pad_extra=_pallas.LEVEL_PAD_EXTRA)
    off0, off1 = plan["offset"]
    t0, _t1 = plan["tile"]
    lm = plan["levels_meta"]
    # n_safe must hold for every shard: use the full-domain halo.
    halo = min(off0, off1, hf - off0 - in0, wf - off1 - in1)

    # Host-side per-shard windows of the fine-derived levels.  Origins are
    # 8-aligned DMA-start lower bounds; windows are equal-length (shard_map
    # blocks must agree), bottom-padded with the sentinel where a shard's
    # window overruns the level array.
    def _origin(s, k):
        return ((off0 + s * rows) // k + 2) // 8 * 8

    is_fine = [m[0] < ratio_log2 for m in lm]
    level_args = []
    for p, m in enumerate(lm):
        lvl, wsz0 = m[0], m[2]
        arr = np.asarray(pyramid[p])
        if not is_fine[p]:
            level_args.append(jnp.asarray(arr))
            continue
        k = 2 ** lvl
        origs = [_origin(s, k) for s in range(n_tile)]
        length = max(
            ((off0 + (s + 1) * rows - t0) // k + 2 - origs[s]) // 8 * 8
            + wsz0 for s in range(n_tile))
        overrun = max(o + length for o in origs) - arr.shape[0]
        if overrun > 0:
            arr = np.pad(arr, ((0, overrun), (0, 0)),
                         constant_values=_mip.PAD_VALUE)
        level_args.append(jnp.asarray(np.stack(
            [arr[o:o + length] for o in origs])))

    statics = dict(
        levels_meta=lm, phases_meta=plan["phases_meta"],
        pads=plan["pads"], tile=plan["tile"], a_chunk=plan["a_chunk"],
        a_num=int(azim_num), n_az_out=az_loc, offset=plan["offset"],
        inner_shape=(rows, in1), dx=plan["dx"], dy=plan["dy"],
        step=plan["step"], dist=plan["dist"], near_ex=plan["near_ex"],
        n_safe=max(0, halo - 2), ray_org_elev=float(ray_org_elev),
        elev_lims=(float(elev_ang_low_lim), float(elev_ang_up_lim)),
        inner_start=(0, off1), outer_shape=(hf, wf),
        interpret=interpret)
    tmap = jnp.asarray(_pallas.tile_schedule((rows, in1), plan["tile"]))
    z_rows = z_fine[off0:off0 + in0, :]

    def shard_fn(z_sh, tmap_rep, *lvl_args):
        row0 = jax.lax.axis_index(_mesh.AXIS_TILE) * rows
        az0 = jax.lax.axis_index(_mesh.AXIS_AZIM) * az_loc
        zero = jnp.int32(0)
        origs = [((off0 + row0) // (2 ** m[0]) + 2) // 8 * 8
                 if is_fine[p] else zero for p, m in enumerate(lm)]
        soff = jnp.stack([row0, zero, az0, zero] + origs).astype(jnp.int32)
        pyr = tuple(a[0] if is_fine[p] else a
                    for p, a in enumerate(lvl_args))
        return _pallas.pallas_forward_fn(z_sh, None, tmap_rep, soff,
                                         pyramid=pyr, **statics)

    lvl_specs = tuple(P(_mesh.AXIS_TILE, None, None) if f else P(None, None)
                      for f in is_fine)
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(_mesh.AXIS_TILE, None), P(None, None)) + lvl_specs,
        out_specs=P(_mesh.AXIS_AZIM, _mesh.AXIS_TILE, None),
        check_vma=False)
    out = jax.jit(fn)(z_rows, tmap, *level_args)
    return jnp.moveaxis(out, 0, -1)


def shadow_metric_pallas_sharded(mesh, z_outer, z_org_r, z_inner_r,
                                 sun_table, *, schedule, offset,
                                 inner_shape, dx, dy, grid_origin,
                                 tile=(128, 256), t_chunk=None,
                                 interpret=False):
    """Multi-device fused-Pallas shadow occlusion metric.

    Same contract as :func:`horayzon_tpu.ops.pallas_sweep.
    shadow_metric_pallas`: rows sharded over the mesh's ``tile`` axis, the
    whole sun batch computed per shard (the azim axis, if present, is
    unused).  Mirrors reference shadow_comp.cpp:390-489 (TBB rows)."""
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
    statics = dict(
        levels_meta=tuple(levels_meta), phases_meta=tuple(phases_meta),
        pads=schedule.pads, tile=(t0, t1), t_chunk=t_chunk,
        offset=(int(off0), int(off1)), inner_shape=(rows, in1),
        dx=float(dx), dy=float(dy), step=float(schedule.step),
        dist=float(schedule.dist), near_ex=near_ex,
        n_safe=max(0, halo - 2),
        grid_origin=(float(grid_origin[0]), float(grid_origin[1])),
        interpret=interpret)
    tmap = jnp.asarray(_pallas.tile_schedule((rows, in1), (t0, t1)))

    def shard_fn(z_rep, z_org_sh, z_inner_sh, table_rep, tmap_rep):
        row0 = jax.lax.axis_index(_mesh.AXIS_TILE) * rows
        zero = jnp.int32(0)
        soff = jnp.stack([row0, zero, zero, zero]).astype(jnp.int32)
        return _pallas.shadow_forward_fn(
            z_rep, z_org_sh, z_inner_sh, table_rep, tmap_rep, soff,
            **statics)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, None), P(_mesh.AXIS_TILE, None),
                  P(_mesh.AXIS_TILE, None), P(None, None), P(None, None)),
        out_specs=P(None, _mesh.AXIS_TILE, None),
        check_vma=False)
    out = jax.jit(fn)(
        z_outer, jnp.asarray(z_org_r, jnp.float32),
        jnp.asarray(z_inner_r, jnp.float32), jnp.asarray(sun_table),
        tmap)
    return out[:num_sun]


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
