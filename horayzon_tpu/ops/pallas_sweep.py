# Copyright (c) 2026
# MIT License
"""Pallas TPU kernel for the planar horizon sweep.

The XLA scan implementation (:mod:`.sweep`) re-reads its carry arrays from
HBM on every marching step (~36 MB of carry traffic per step at 1024^2),
which makes it HBM-bound.  This kernel fuses the *entire* azimuth x sample
loop for a tile into one Pallas program:

* the level-0 heightfield window (tile + marching halo) and the mip-level
  windows are DMA'd from HBM into VMEM once per tile;
* the running-maximum accumulator, the segment carry and all reads live in
  VMEM for the whole sweep — HBM traffic is one window set per tile plus one
  output write;
* sample shifts are computed in-kernel from the loop indices (azimuth angle
  and distance are closed-form in (k, m)), so there are no index tables;
* Mosaic requires dynamically-indexed vector loads to be (8, 128)-aligned,
  so shifted reads load an aligned slab (``pl.multiple_of`` hints) and
  finish the shift with dynamic lane/sublane rolls (``pltpu.roll``).

Planar geometry only (the general per-cell-basis mode falls back to the XLA
path).  Numerically identical to ops.sweep up to float32 associativity.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from horayzon_tpu.ops import mip as _mip
from horayzon_tpu.ops import sweep as _sweep

_NEG_INIT = -3.0e38
_DEN_EPS = 1.0e-6


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _roll_neg(x, amount, axis):
    """Roll left by ``amount`` (>= 0): dynamic rolls with *negative* shifts
    mis-rotate on the sublane axis on current Mosaic, so express the left
    roll as the equivalent positive right roll of (size - amount) % size."""
    size = x.shape[axis]
    shift = jnp.where(amount == 0, 0, size - amount)
    return pltpu.roll(x, shift, axis)


def _shifted_window(win_ref, start_i, start_j, rows, cols):
    """Read win_ref[start_i:start_i+rows, start_j:start_j+cols] with
    *dynamic* unaligned starts: aligned slab load + dynamic rolls."""
    ia = pl.multiple_of((start_i // 8) * 8, 8)
    ja = pl.multiple_of((start_j // 128) * 128, 128)
    r = _round_up(rows + 8, 8)
    c = _round_up(cols + 128, 128)
    slab = win_ref[pl.ds(ia, r), pl.ds(ja, c)]
    slab = _roll_neg(slab, start_i - ia, 0)
    slab = _roll_neg(slab, start_j - ja, 1)
    return slab[:rows, :cols]


def _kernel(z_org_ref, z_inner_ref, *refs, levels_meta, phases_meta,
            tile, a_chunk, a_num, off0, off1, outer_shape, dx, dy, step,
            dist):
    """Pallas kernel body.

    refs layout: [lvl_0, ..., lvl_{L-1}] (ANY), out_ref, then scratch:
    [win_0, ..., win_{L-1}, acc, h_prev, sems].
    """
    n_levels = len(levels_meta)
    lvl_refs = refs[:n_levels]
    out_ref = refs[n_levels]
    win_refs = refs[n_levels + 1:2 * n_levels + 1]
    acc_ref = refs[2 * n_levels + 1]
    hp_ref = refs[2 * n_levels + 2]
    vp_ref = refs[2 * n_levels + 3]
    sem = refs[2 * n_levels + 4]

    t0, t1 = tile
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    ak = pl.program_id(2)
    a_base = off0 + ti * t0          # global outer row of tile cell (0, .)
    b_base = off1 + tj * t1

    # ---- DMA the per-tile windows (once per tile: first azimuth chunk) ----
    # DMA source starts are rounded down to the (8, 128) tiling; the
    # remainders are added to every in-window read start below.
    deltas = []
    for p, (lvl, wpad, wsz0, wsz1) in enumerate(levels_meta):
        k = 2 ** lvl
        src_i = (a_base // k) + 2              # low-pad = pads[lvl] + 4
        src_j = (b_base // k) + 2
        src_i_al = pl.multiple_of((src_i // 8) * 8, 8)
        src_j_al = pl.multiple_of((src_j // 128) * 128, 128)
        deltas.append((src_i - src_i_al, src_j - src_j_al))

    @pl.when(ak == 0)
    def _():
        dmas = []
        for p, (lvl, wpad, wsz0, wsz1) in enumerate(levels_meta):
            k = 2 ** lvl
            src_i = (a_base // k) + 2
            src_j = (b_base // k) + 2
            src_i_al = pl.multiple_of((src_i // 8) * 8, 8)
            src_j_al = pl.multiple_of((src_j // 128) * 128, 128)
            dma = pltpu.make_async_copy(
                lvl_refs[p].at[pl.ds(src_i_al, wsz0),
                               pl.ds(src_j_al, wsz1)],
                win_refs[p],
                sem.at[p])
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()

    h, w = outer_shape
    row_g = (jax.lax.broadcasted_iota(jnp.int32, (t0, t1), 0)
             + a_base)               # global outer row per cell
    col_g = (jax.lax.broadcasted_iota(jnp.int32, (t0, t1), 1)
             + b_base)

    z_org = z_org_ref[...]
    z_inner = z_inner_ref[...]
    wpad0 = levels_meta[0][1]

    d0_i, d0_j = deltas[0]

    def read0(di, dj, fi, fj):
        win = _shifted_window(win_refs[0], di + wpad0 + d0_i,
                              dj + wpad0 + d0_j, t0 + 1, t1 + 1)
        top = (1.0 - fj) * win[:-1, :-1] + fj * win[:-1, 1:]
        bot = (1.0 - fj) * win[1:, :-1] + fj * win[1:, 1:]
        return (1.0 - fi) * top + fi * bot

    def inside0(di, dj):
        ri = row_g + di
        cj = col_g + dj
        return (ri >= 0) & (ri + 1 <= h - 1) & (cj >= 0) & (cj + 1 <= w - 1)

    def azim_loop(k_local, _):
        k_glob = ak * a_chunk + k_local
        phi = (2.0 * np.pi / a_num) * k_glob.astype(jnp.float32)
        ux = jnp.sin(phi)
        uy = jnp.cos(phi)
        sh_i = uy / dy   # row cells per metre
        sh_j = ux / dx

        acc_ref[...] = jnp.full((t0, t1), _NEG_INIT, dtype=jnp.float32)
        hp_ref[...] = z_inner
        vp_ref[...] = jnp.ones((t0, t1), dtype=jnp.float32)

        # ---- Phase 0: dense segments with interior quadratic maxima ----
        n_seg = phases_meta[0][1]

        def seg_body(m, _):
            s_end = (m + 1).astype(jnp.float32) * step
            s_mid = s_end - 0.5 * step
            s_start = s_end - step
            dim_f = s_mid * sh_i
            djm_f = s_mid * sh_j
            die_f = s_end * sh_i
            dje_f = s_end * sh_j
            dim = jnp.floor(dim_f)
            djm = jnp.floor(djm_f)
            die = jnp.floor(die_f)
            dje = jnp.floor(dje_f)
            hm = read0(dim.astype(jnp.int32), djm.astype(jnp.int32),
                       dim_f - dim, djm_f - djm)
            he = read0(die.astype(jnp.int32), dje.astype(jnp.int32),
                       die_f - die, dje_f - dje)
            acc = acc_ref[...]
            acc = jnp.maximum(acc, (he - z_org) / s_end)
            # interior quadratic max
            h_prev = hp_ref[...]
            inv_l = 1.0 / step
            a_c = (2.0 * he + 2.0 * h_prev - 4.0 * hm) * inv_l * inv_l
            b_c = (4.0 * hm - 3.0 * h_prev - he) * inv_l
            a_safe = jnp.where(jnp.abs(a_c) > 1e-12, a_c,
                               jnp.float32(1e-12))
            rad = s_start * s_start - (b_c * s_start - h_prev + z_org) \
                / a_safe
            pos = rad > 0.0
            t_int = -s_start + jnp.sqrt(jnp.where(pos, rad, 1.0))
            v_mid = inside0(dim.astype(jnp.int32), djm.astype(jnp.int32))
            v_end = inside0(die.astype(jnp.int32), dje.astype(jnp.int32))
            # previous-endpoint validity lives in a float scratch ref —
            # Mosaic cannot carry i1 vectors through scf.for
            valid = ((jnp.abs(a_c) > 1e-12) & pos
                     & (t_int > 1e-3) & (t_int < step - 1e-3)
                     & (vp_ref[...] > 0.5) & v_mid & v_end)
            t_c = jnp.clip(t_int, 0.0, step)
            h_t = a_c * t_c * t_c + b_c * t_c + h_prev
            s_t = jnp.maximum(s_start + t_c, _DEN_EPS)
            acc = jnp.maximum(acc, jnp.where(valid, (h_t - z_org) / s_t,
                                             _NEG_INIT))
            acc_ref[...] = acc
            hp_ref[...] = he
            vp_ref[...] = jnp.where(v_end, 1.0, 0.0)
            return 0

        lax.fori_loop(0, n_seg, seg_body, 0)

        # ---- Mip phases: conservative point samples ----
        for p in range(1, len(phases_meta)):
            lvl, n_m, s_first, step_l = phases_meta[p]
            kpow = 2 ** lvl
            wpad = levels_meta[p][1]
            sz0 = (t0 + kpow - 2) // kpow + 1
            sz1 = (t1 + kpow - 2) // kpow + 1

            def mip_body(m, _, lvl=lvl, kpow=kpow, wpad=wpad, sz0=sz0,
                         sz1=sz1, s_first=s_first, step_l=step_l, p=p):
                s = jnp.minimum(s_first + m.astype(jnp.float32) * step_l,
                                dist)
                ri = jnp.round(s * sh_i).astype(jnp.int32)
                rj = jnp.round(s * sh_j).astype(jnp.int32)
                c0 = a_base + ri
                c1 = b_base + rj
                st_i = lax.div(c0, kpow) - lax.div(a_base, kpow) + wpad
                st_j = lax.div(c1, kpow) - lax.div(b_base, kpow) + wpad
                al_i = lax.rem(c0, kpow)
                al_i = jnp.where(al_i < 0, al_i + kpow, al_i)
                al_j = lax.rem(c1, kpow)
                al_j = jnp.where(al_j < 0, al_j + kpow, al_j)
                win = _shifted_window(win_refs[p], st_i + deltas[p][0],
                                      st_j + deltas[p][1], sz0, sz1)
                up = pltpu.repeat(pltpu.repeat(win, kpow, axis=0),
                                  kpow, axis=1)
                up = _roll_neg(up, al_i, 0)
                up = _roll_neg(up, al_j, 1)
                hs = up[:t0, :t1]
                acc_ref[...] = jnp.maximum(acc_ref[...],
                                           (hs - z_org) / s)
                return 0

            lax.fori_loop(0, n_m, mip_body, 0)

        # atan is applied outside the kernel (no Pallas TPU lowering);
        # the kernel emits the max elevation-angle ratio.
        out_ref[k_local, :, :] = acc_ref[...]
        return 0

    lax.fori_loop(0, a_chunk, azim_loop, 0)


def horizon_sweep_pallas(z_outer, *, dx, dy, offset, inner_shape, azim_num,
                         dist_search, hori_acc=0.25, elev_ang_low_lim=-15.0,
                         elev_ang_up_lim=89.98, ray_org_elev=0.01,
                         rel_err=None, max_level=10, tile=(128, 256),
                         a_chunk=None, interpret=False):
    """Planar gridded horizon via the fused Pallas kernel.

    Same contract as :func:`horayzon_tpu.ops.sweep.horizon_sweep` (planar
    mode, uniform azimuths ``2*pi*k/azim_num``, no distance tracking).
    """
    z_outer = jnp.asarray(z_outer, dtype=jnp.float32)
    step = float(min(abs(dx), abs(dy)))
    if rel_err is None:
        rel_err = _sweep.default_rel_err(hori_acc)
    schedule = _sweep.build_schedule(step, float(dist_search), rel_err,
                                     max_level=max_level)
    in0, in1 = inner_shape
    t0, t1 = tile
    t0 = min(t0, in0)
    t1 = min(t1, in1)
    if in0 % t0 or in1 % t1:
        raise ValueError(f"inner_shape {inner_shape} must be divisible by "
                         f"tile {(t0, t1)}")
    if a_chunk is None:
        a_chunk = min(azim_num, 16)
    if azim_num % a_chunk:
        raise ValueError("azim_num must be divisible by a_chunk")

    # Per-level arrays: low pad = schedule pad + 4 (window DMA start >= 0),
    # high pads add the aligned-slab roll margins.
    levels = _mip.build_pyramid(z_outer, schedule.num_levels)
    pads = schedule.pads
    padded = []
    for lvl, z_l in enumerate(levels):
        lo = pads[lvl] + 4
        # High-side pads cover the window size round-ups (rows: +16 slab
        # margin + 8 round-up; cols: +256 slab margin + 128 round-up).
        padded.append(jnp.pad(
            z_l, ((lo, pads[lvl] + 48), (lo, pads[lvl] + 648)),
            constant_values=_mip.PAD_VALUE))

    # Merge the level-0 phases (d2 + d1 in the XLA path) into one dense
    # phase: this kernel uses midpoint+endpoint reads for every dense step.
    levels_meta = []
    phases_meta = []
    n_dense_steps = sum(ph.num for ph in schedule.phases if ph.level == 0)
    wpad0 = schedule.pads[0] + 2
    levels_meta.append((0, wpad0,
                        _round_up(t0 + 2 * wpad0 + 2 + 16 + 8, 8),
                        _round_up(t1 + 2 * wpad0 + 2 + 256 + 128, 128)))
    phases_meta.append((0, n_dense_steps, step, step))
    for p, ph in enumerate(schedule.phases):
        if ph.level == 0:
            continue
        lvl = ph.level
        wpad = schedule.pads[lvl] + 2
        k = 2 ** lvl
        # +8 rows / +128 cols: DMA source-start alignment remainder
        wsz0 = _round_up(t0 // k + 2 * wpad + 2 + 16 + 8, 8)
        wsz1 = _round_up(t1 // k + 2 * wpad + 2 + 256 + 128, 128)
        levels_meta.append((lvl, wpad, wsz0, wsz1))
        s_vals = schedule.s_values[p]
        step_l = float(s_vals[1] - s_vals[0]) if ph.num > 1 else step * k
        phases_meta.append((lvl, ph.num, float(s_vals[0]), step_l))

    off0, off1 = offset
    z_inner = lax.dynamic_slice(z_outer, (off0, off1), (in0, in1))
    z_org = z_inner + jnp.float32(ray_org_elev)

    grid = (in0 // t0, in1 // t1, azim_num // a_chunk)

    kernel = functools.partial(
        _kernel,
        levels_meta=tuple(levels_meta), phases_meta=tuple(phases_meta),
        tile=(t0, t1), a_chunk=a_chunk, a_num=azim_num,
        off0=off0, off1=off1, outer_shape=tuple(z_outer.shape),
        dx=float(dx), dy=float(dy), step=step,
        dist=float(dist_search))

    in_specs = [
        pl.BlockSpec((t0, t1), lambda ti, tj, ak: (ti, tj),
                     memory_space=pltpu.VMEM),                     # z_org
        pl.BlockSpec((t0, t1), lambda ti, tj, ak: (ti, tj),
                     memory_space=pltpu.VMEM),                     # z_inner
    ] + [pl.BlockSpec(memory_space=pltpu.ANY) for _ in levels_meta]

    scratch_shapes = (
        [pltpu.VMEM((m[2], m[3]), jnp.float32) for m in levels_meta]
        + [pltpu.VMEM((t0, t1), jnp.float32),       # acc
           pltpu.VMEM((t0, t1), jnp.float32),       # h_prev
           pltpu.VMEM((t0, t1), jnp.float32),       # v_prev (0/1)
           pltpu.SemaphoreType.DMA((len(levels_meta),))])

    # Azimuth leads the output layout so the per-azimuth store indexes the
    # (cheap) leading dimension; transpose once at the end.
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((a_chunk, t0, t1),
                               lambda ti, tj, ak: (ak, ti, tj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((azim_num, in0, in1), jnp.float32),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(z_org, z_inner, *padded)
    out = jnp.clip(jnp.arctan(out),
                   math.radians(elev_ang_low_lim),
                   math.radians(elev_ang_up_lim))
    return jnp.moveaxis(out, 0, -1)
