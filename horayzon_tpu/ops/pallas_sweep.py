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

import collections
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
_POS_INIT = 3.0e38
_DEN_EPS = 1.0e-6
#: argmax-forward sentinel for "no candidate won" (masked cells / the
#: untouched init); larger than any real candidate id
ID_NONE = 1 << 30

#: Profiling-only ablation flags (static: consulted at trace time, so each
#: setting compiles a different kernel).  Used by tools/ablate_kernel.py to
#: attribute kernel time to its components on real hardware; NEVER set in
#: production (most flags produce wrong results by design).  Flags:
#: "no_roll" (skip the dynamic rolls in shifted reads; "no_roll0"/
#: "no_roll1" per axis), "no_quad" (skip interior parabola updates),
#: "no_mip" (skip far-field phases), "no_skip" (disable early exits),
#: "one_read" (d1 pairs reuse the first read).
_ABLATE = frozenset()

#: EXPERIMENT knob (tools/ablate_kernel.py --bf16-mip): store mip levels
#: >= 1 in bfloat16 rounded toward +inf — the conservative upper-bound
#: property of the max-mip survives (values only move up, by <= 1 bf16
#: ulp), halving the far-field window DMA and slab-read traffic that the
#: measured roofline identifies as the binding resource.  The <= 1-ulp
#: upward slack (~relief/256) is charged to the hori_acc budget.  See
#: BASELINE.md round-5 for the measured keep/reject verdict.
_MIP_BF16 = False


def _round_up_bf16(x):
    """Cast f32 -> bf16 rounding toward +inf (conservative for maxima):
    nearest-even cast, then bump one ulp wherever the cast landed low."""
    y = x.astype(jnp.bfloat16)
    low = y.astype(jnp.float32) < x
    bits = jax.lax.bitcast_convert_type(y, jnp.uint16)
    up = jnp.where(bits & 0x8000 > 0, bits - 1, bits + 1)  # +1 ulp
    y_up = jax.lax.bitcast_convert_type(up.astype(jnp.uint16),
                                        jnp.bfloat16)
    return jnp.where(low, y_up, y)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _pool8(padded, levels_meta):
    """8x8 max-pooled companion of each padded level array, over-padded so
    any in-kernel pooled-window DMA slice stays in bounds.  Feeds the
    directional early-exit bounds (see ``dir_max`` in the kernel)."""
    pooled = []
    for p, z_l in enumerate(padded):
        psz0, psz1 = levels_meta[p][4], levels_meta[p][5]
        h8 = _round_up(z_l.shape[0], 8)
        w8 = _round_up(z_l.shape[1], 8)
        zp = jnp.pad(z_l.astype(jnp.float32),
                     ((0, h8 - z_l.shape[0]), (0, w8 - z_l.shape[1])),
                     constant_values=_mip.PAD_VALUE)
        pw = lax.reduce_window(zp, jnp.float32(_mip.PAD_VALUE), lax.max,
                               (8, 8), (8, 8), "VALID")
        pooled.append(jnp.pad(pw, ((0, psz0 + 8), (0, psz1 + 128)),
                              constant_values=_mip.PAD_VALUE))
    return pooled


#: Mip strip-chunk parameters: a chunk of up to _STRIP_GK/k consecutive
#: mip steps shares one fine-resolution upsampled strip (built with two
#: one-hot matmuls), so the per-step work drops to a dense-style shifted
#: read.  Levels coarser than _STRIP_KMAX use the per-step path (their
#: strips would not fit VMEM; such phases are rare and short).
_STRIP_GK = 64
_STRIP_KMAX = 16


def _strip_scratch_shape(levels_meta, tile):
    """VMEM scratch shape for the mip strip buffer (None if no level uses
    the strip path).  Includes the +8/+128 aligned-read margins."""
    t0, t1 = tile
    u0 = u1 = 0
    for lvl, *_ in levels_meta[1:]:
        k = 2 ** lvl
        if k > _STRIP_KMAX:
            continue
        g = max(1, _STRIP_GK // k)
        u0 = max(u0, t0 + (g + 1) * k)
        u1 = max(u1, t1 + (g + 1) * k + 1)
    if u0 == 0:
        return None
    return (_round_up(u0 + 8, 8), _round_up(u1 + 128, 128))


def _roll_neg(x, amount, axis):
    """Roll left by ``amount`` (>= 0): dynamic rolls with *negative* shifts
    mis-rotate on the sublane axis on current Mosaic, so express the left
    roll as the equivalent positive right roll of (size - amount) % size."""
    size = x.shape[axis]
    shift = jnp.where(amount == 0, 0, size - amount)
    return pltpu.roll(x, shift, axis)


def _shifted_window(win_ref, start_i, start_j, rows, cols):
    """Read win_ref[start_i:start_i+rows, start_j:start_j+cols] with
    *dynamic* unaligned starts: aligned slab load + dynamic rolls.

    The slab must cover [start, start + rows) with start - aligned_start
    <= 7 (sublanes) / 127 (lanes), so the margins are exactly 7 and 127;
    the rounded slab is the roll input, so keeping it one tile smaller
    (136x640 vs 144x768 for a (129, 513) read) cuts the dominant
    dynamic-roll cost by ~20%."""
    ia = pl.multiple_of((start_i // 8) * 8, 8)
    ja = pl.multiple_of((start_j // 128) * 128, 128)
    r = _round_up(rows + 7, 8)
    c = _round_up(cols + 127, 128)
    slab = win_ref[pl.ds(ia, r), pl.ds(ja, c)]
    if not _ABLATE & {"no_roll", "no_roll0"}:
        slab = _roll_neg(slab, start_i - ia, 0)
    if not _ABLATE & {"no_roll", "no_roll1"}:
        slab = _roll_neg(slab, start_j - ja, 1)
    return slab[:rows, :cols]


def _kernel(tmap_ref, soff_ref, z_org_ref, z_inner_ref, *refs, levels_meta,
            phases_meta, tile, a_chunk, a_num, off0, off1, outer_shape, dx,
            dy, step, dist, near_exact, n_safe, mode="horizon",
            grid_origin=(0.0, 0.0), has_mask=False, emit_argmax=False,
            exact_metric=True):
    """Pallas kernel body (horizon sweep / shadow occlusion metric).

    The grid is 2-D: (tile slot, azimuth/sun chunk).  Scalar-prefetch
    arguments map grid slots to work:

    * ``tmap_ref`` (n_tiles, 2) int32 — tile coordinates per slot.  A
      compacted list implements the reference's mask-driven cell skipping
      at tile granularity (horizon_comp.cpp:685-695,749): fully masked
      tiles have no slot, so no DMA and no sweep runs for them.
    * ``soff_ref`` (4 + n_levels,) int32 — (row0, col0, azim0, unused,
      orig_0, ..., orig_{L-1}) shard offsets: under ``shard_map`` each
      shard passes its global row / azimuth start so in-kernel geometry
      stays global while block indices stay local (the TBB row-range
      analog, horizon_comp.cpp:739-800).  ``orig_p`` is the row at which
      level p's HBM array was sliced out of the full padded level (in
      level-p cells, a multiple of 8): memory-scalable sharding passes
      per-shard fine-level windows instead of replicating the full outer
      heightfield, and the kernel subtracts the origin from every DMA
      source start (SURVEY.md section 7 step 7).  All-zero for unsliced
      (replicated or single-device) levels.

    refs layout: [sun_ref (shadow mode only), lvl_0, ..., lvl_{L-1},
    pool_0, ..., pool_{L-1}] (ANY), out_ref, then scratch:
    [win_0, ..., win_{L-1}, pwin_0, ..., pwin_{L-1}, wmax, sems].

    mode="horizon": the third grid axis is an azimuth chunk; the update is
    the running max of the elevation-angle ratio (he - z_org) / s.
    mode="shadow": the third grid axis is a sun-position chunk; per sun the
    kernel computes the per-cell ray slope from the sun coordinates (SMEM
    table rows: sun_x, sun_y, sun_z, kx_u, ky_u, ui, uj) and the update is
    the running max of the clearance he - (z_org + s * m_slope) — positive
    anywhere along the march means the cell is occluded
    (shadow_comp.cpp:454-467 semantics, tfar = domain diagonal)."""
    shadow = mode == "shadow"
    mask_ref = None
    if has_mask:
        # Per-cell mask tile (float 0/1).  Masked cells start their running
        # max at +inf, so (a) every tile-level min reduction feeding the
        # early-exit bounds ranges over *unmasked* cells only — partially
        # masked tiles skip chunks/phases as aggressively as their unmasked
        # cells allow (the sub-tile analog of the reference's per-cell mask
        # skip, horizon_comp.cpp:749) — and (b) masked outputs saturate and
        # are overwritten by the caller's fill value.  Unmasked outputs are
        # bit-equal to the unmasked kernel (skips are value-exact).
        mask_ref = refs[0]
        refs = refs[1:]
    if shadow:
        sun_ref = refs[0]
        refs = refs[1:]
    else:
        # (a_num, 2) SMEM table of (sin az, cos az) in float32: indices of
        # mip samples must be bitwise identical to the XLA sweep's host
        # tables — in-kernel transcendentals are only ~1 ulp accurate, and
        # a 1-ulp shift across a round() boundary reads the neighbouring
        # max-pooled block (up to the inter-block relief in height).
        trig_ref = refs[0]
        refs = refs[1:]
    ramp_refs = None
    if mode == "horizon_tilt":
        # Curved-Earth fast path: per-(cell, azimuth) ratio offset
        # sin(az)*A + cos(az)*B with A = m_x/m_z, B = m_y/m_z (the
        # horizontal components of the per-cell ellipsoid normal).  The
        # curvature drop itself is already in the planarised lattice
        # heights, so the offset is all that distinguishes the local
        # tangent frame from the lattice frame (to first order in the
        # normal tilt, <= 1e-4 rad over 100 km domains).
        ramp_refs = refs[:2]
        refs = refs[2:]
    n_levels = len(levels_meta)
    lvl_refs = refs[:n_levels]
    pool_refs = refs[n_levels:2 * n_levels]
    out_ref = refs[2 * n_levels]
    idout_ref = None
    auxout_ref = None
    n_out = 1
    if emit_argmax:
        # Gradient-path forward: a second int32 output records, per
        # (azimuth, cell), the id of the candidate that produced the
        # running max, and a third f32 output the winning interior
        # parabola's stationary denominator D = s_start + t*, so the
        # backward kernel replays only winning candidates and needs no
        # height re-reads (SURVEY.md section 7 step 8).
        idout_ref = refs[2 * n_levels + 1]
        auxout_ref = refs[2 * n_levels + 2]
        n_out = 3
    win_refs = refs[2 * n_levels + n_out:3 * n_levels + n_out]
    pwin_refs = refs[3 * n_levels + n_out:4 * n_levels + n_out]
    wmax_ref = refs[4 * n_levels + n_out]   # SMEM (n_levels + 1,): per-level
    #                                     window maxima (shadow mode) and,
    #                                     at index n_levels, the level-0
    #                                     window MINIMUM (the parabola
    #                                     overshoot floor of the dense
    #                                     chunk-skip bound)
    sem = refs[4 * n_levels + n_out + 1]
    strip_ref = (refs[4 * n_levels + n_out + 2]
                 if _strip_scratch_shape(levels_meta, tile) is not None
                 else None)             # mip strip buffer (see _STRIP_GK)

    t0, t1 = tile
    ti = pl.program_id(0)
    ak = pl.program_id(1)
    # global outer row/col of tile cell (0, 0)
    a_base = off0 + soff_ref[0] + tmap_ref[ti, 0] * t0
    b_base = off1 + soff_ref[1] + tmap_ref[ti, 1] * t1

    # ---- DMA the per-tile windows (once per tile: first azimuth chunk) ----
    # DMA source starts are rounded down to the (8, 128) tiling; the
    # remainders are added to every in-window read start below.  Only the
    # level-0 window is waited for up front; each mip window is waited for
    # right before its phase's first use, so the coarse-window transfers
    # overlap the dense-phase compute of the first azimuth/sun.
    deltas = []
    pstarts = []
    for p, (lvl, wpad, wsz0, wsz1, psz0, psz1) in enumerate(levels_meta):
        k = 2 ** lvl
        # low-pad = pads[lvl] + 4; soff[4+p] re-bases a sliced level array
        src_i = (a_base // k) + 2 - soff_ref[4 + p]
        src_j = (b_base // k) + 2
        src_i_al = pl.multiple_of((src_i // 8) * 8, 8)
        src_j_al = pl.multiple_of((src_j // 128) * 128, 128)
        deltas.append((src_i - src_i_al, src_j - src_j_al))
        # Pooled (8x8 max) companion window: pooled-array index pp covers
        # padded-level rows [8*pp, 8*pp + 8); align the DMA start down.
        ppi = src_i_al // 8
        ppj = src_j_al // 8
        ppi_al = pl.multiple_of((ppi // 8) * 8, 8)
        ppj_al = pl.multiple_of((ppj // 128) * 128, 128)
        pstarts.append((ppi_al, ppj_al))

    def _dma(p):
        wsz0, wsz1 = levels_meta[p][2], levels_meta[p][3]
        k = 2 ** levels_meta[p][0]
        src_i = (a_base // k) + 2 - soff_ref[4 + p]
        src_j = (b_base // k) + 2
        src_i_al = pl.multiple_of((src_i // 8) * 8, 8)
        src_j_al = pl.multiple_of((src_j // 128) * 128, 128)
        return pltpu.make_async_copy(
            lvl_refs[p].at[pl.ds(src_i_al, wsz0), pl.ds(src_j_al, wsz1)],
            win_refs[p],
            sem.at[p])

    n_lv = len(levels_meta)

    def _dma_pool(p):
        psz0, psz1 = levels_meta[p][4], levels_meta[p][5]
        return pltpu.make_async_copy(
            pool_refs[p].at[pl.ds(pstarts[p][0], psz0),
                            pl.ds(pstarts[p][1], psz1)],
            pwin_refs[p],
            sem.at[n_lv + p])

    n_lv_used = 1 if "no_mip" in _ABLATE else len(levels_meta)

    @pl.when(ak == 0)
    def _():
        for p in range(n_lv_used):
            _dma(p).start()
            _dma_pool(p).start()
        _dma(0).wait()
        for p in range(n_lv_used):
            _dma_pool(p).wait()
        # Level-0 window minimum: the floor of any dense-phase sample, used
        # to bound the interpolating parabola's overshoot above the pooled
        # maximum (a parabola through 3 equispaced samples in [lo, hi] can
        # reach hi + (hi - lo)/8) in the d1 chunk-skip bound.
        wmax_ref[n_levels] = jnp.min(win_refs[0][...])

    h, w = outer_shape
    z_org = z_org_ref[...]
    z_inner = z_inner_ref[...]
    z_org_min = jnp.min(z_org)
    wpad0 = levels_meta[0][1]

    d0_i, d0_j = deltas[0]

    def inside0(di, dj):
        ri = jax.lax.broadcasted_iota(jnp.int32, (t0, t1), 0) + a_base + di
        cj = jax.lax.broadcasted_iota(jnp.int32, (t0, t1), 1) + b_base + dj
        return (ri >= 0) & (ri + 1 <= h - 1) & (cj >= 0) & (cj + 1 <= w - 1)

    n_dense = phases_meta[0][1]
    nx = min(near_exact, n_dense)      # two-read near field
    ns2 = min(nx, n_safe)              # safe d2 steps
    ns1 = max(nx, min(n_dense, n_safe))  # end of safe d1 steps
    if ns1 < n_dense:
        # keep d1 pair parity GLOBAL across the safe/masked boundary (a
        # pair never straddles it) so results match the XLA sweep's paired
        # interior updates exactly; costs at most one extra masked step
        ns1 = nx + ((ns1 - nx) // 2) * 2

    if shadow:
        # Per-cell lattice coordinates for the per-sun ray-slope field
        # (integer iota then cast: Mosaic's iota is integer-only)
        xr = ((jax.lax.broadcasted_iota(jnp.int32, (t0, t1), 1)
               + b_base).astype(jnp.float32)) * dx + grid_origin[0]
        yr = ((jax.lax.broadcasted_iota(jnp.int32, (t0, t1), 0)
               + a_base).astype(jnp.float32)) * dy + grid_origin[1]

    def azim_loop(k_local, _):
        if shadow:
            sun_x = sun_ref[k_local, 0]
            sun_y = sun_ref[k_local, 1]
            sun_z = sun_ref[k_local, 2]
            kx_u = sun_ref[k_local, 3]
            ky_u = sun_ref[k_local, 4]
            sh_i = sun_ref[k_local, 5]   # row cells per metre
            sh_j = sun_ref[k_local, 6]
            sxr = sun_x - xr
            syr = sun_y - yr
            szr = sun_z - z_org
            mag = jnp.sqrt(sxr * sxr + syr * syr + szr * szr)
            adv = (sxr * kx_u + syr * ky_u) / mag
            m = (szr / mag) / jnp.maximum(adv, 1.0e-4)
            # per-(tile, sun) minimum ray slope: feeds the directional
            # skip bounds (the dynamic analog of capping tfar at
            # (max_z - min_z)/tan(elev) instead of the domain diagonal,
            # cf. shadow_comp.cpp:454-467 whose tfar = inf semantics are
            # preserved exactly - skips are value-exact)
            m_min = jnp.min(m)
        else:
            k_glob = soff_ref[2] + ak * a_chunk + k_local
            ux = trig_ref[k_glob, 0]
            uy = trig_ref[k_glob, 1]
            sh_i = uy / dy   # row cells per metre
            sh_j = ux / dx

        def read0(s):
            """Bilinear level-0 read at arc distance ``s`` (+ floor shifts)."""
            dif = s * sh_i
            djf = s * sh_j
            di = jnp.floor(dif)
            dj = jnp.floor(djf)
            fi = dif - di
            fj = djf - dj
            win = _shifted_window(
                win_refs[0], di.astype(jnp.int32) + wpad0 + d0_i,
                dj.astype(jnp.int32) + wpad0 + d0_j, t0 + 1, t1 + 1)
            top = (1.0 - fj) * win[:-1, :-1] + fj * win[:-1, 1:]
            bot = (1.0 - fj) * win[1:, :-1] + fj * win[1:, 1:]
            return ((1.0 - fi) * top + fi * bot,
                    di.astype(jnp.int32), dj.astype(jnp.int32))

        def quad_update(acc, a_c, b_c, h0, s_start, length, t_lo, extra,
                        cid=None):
            """Max-update with the parabola's interior stationary value.

            Horizon: at the stationary point t* of (P(t) + C)/(s + t) with
            P = a t^2 + b t, C = h0 - z_org, the ratio equals P'(t*) =
            2 a t* + b and t* = -s + sqrt(rad), rad = s^2 - (b s - C)/a.
            Division-free form (divides were ~1/4 of kernel time,
            tools/ablate_kernel.py "no_quad"): with u = a s^2 - b s + C
            (= a * rad), 2 a sqrt(rad) = 2 sign(a) sqrt(a u), and the
            window test t* in (t_lo, length) becomes the sign-robust
            product test (u - a lo^2)(u - a hi^2) < 0 with lo = s + t_lo,
            hi = s + length (degenerate a fails it automatically — no
            epsilon clamps).  Any stationary point is a true value of the
            ratio on the segment, so max-updating with it is always safe.

            Shadow: the stationary point of P(t) - m t is the vertex
            t* = (m - b)/(2a) (a maximum only for concave segments,
            a < 0) with value C0 - (b - m)^2 / (4 a), C0 = h0 - z_org -
            s m."""
            if "no_quad" in _ABLATE:
                return acc
            if shadow:
                a_s = jnp.where(a_c < -1e-12, a_c, jnp.float32(-1e-12))
                d = b_c - m
                lo2a = 2.0 * (t_lo + 1e-3) * a_c
                hi2a = 2.0 * (length - 1e-3) * a_c
                valid = ((a_c < -1e-12)
                         & ((d + lo2a) * (d + hi2a) < 0.0))
                r_int = (h0 - z_org - s_start * m
                         - 0.25 * d * d / a_s)
                if extra is not None:
                    valid = valid & extra
                cand = jnp.where(valid, r_int, _NEG_INIT)
                if not emit_argmax:
                    return jnp.maximum(acc, cand)
                # Grad path: record D = s_start + t* (t* = -d/(2a)) so
                # the backward's envelope partials are closed-form in
                # q*t* with no height re-reads (same polynomials as the
                # horizon mode, without the 1/D ratio chain).  The
                # divide is DEFERRED: the accumulator carries the
                # winning (numerator, denominator) pair and one divide
                # per (cell, azimuth) runs at emit time, instead of one
                # per quad candidate (round-5 grad-overhead trim).
                a0, i0, n0, d0 = acc
                upd = cand > a0
                return (jnp.where(upd, cand, a0),
                        jnp.where(upd, cid, i0),
                        jnp.where(upd, 2.0 * a_s * s_start - d, n0),
                        jnp.where(upd, 2.0 * a_s, d0))
            else:
                c0 = h0 - z_org
                u = (a_c * s_start - b_c) * s_start + c0
                if "approx_sqrt" in _ABLATE:
                    g = a_c * u
                else:
                    g = jnp.sqrt(jnp.maximum(a_c * u, 0.0))
                    g = jnp.where(a_c >= 0.0, g, -g)
                r_int = b_c - 2.0 * a_c * s_start + 2.0 * g
                lo = s_start + t_lo + 1e-3
                hi = s_start + length - 1e-3
                if "no_quad_valid" in _ABLATE:
                    valid = a_c < 0.0
                else:
                    valid = (u - a_c * (lo * lo)) \
                        * (u - a_c * (hi * hi)) < 0.0
            if extra is not None:
                valid = valid & extra
            cand = jnp.where(valid, r_int, _NEG_INIT)
            if not emit_argmax:
                return jnp.maximum(acc, cand)
            # Grad path: also record the stationary denominator
            # D = s_start + t* = g / a so the backward's envelope
            # partials need NO height re-reads.  The divide is DEFERRED
            # (see the shadow branch): carry the winning (g, a) pair and
            # divide once per (cell, azimuth) at emit time — bit-equal
            # to the per-candidate divide (identical operands).
            a0, i0, n0, d0 = acc
            upd = cand > a0
            return (jnp.where(upd, cand, a0), jnp.where(upd, cid, i0),
                    jnp.where(upd, g, n0), jnp.where(upd, a_c, d0))

        def point_update(acc, he, s_end, cid=None):
            if shadow:
                cand = he - z_org - s_end * m
            else:
                cand = (he - z_org) * (1.0 / s_end)
            if not emit_argmax:
                return jnp.maximum(acc, cand)
            a0, i0, n0, d0 = acc
            upd = cand > a0
            return (jnp.where(upd, cand, a0), jnp.where(upd, cid, i0),
                    n0, d0)

        inv_l0 = 1.0 / step
        inv_l1 = 0.5 / step

        def _val(a):
            return a[0] if emit_argmax else a

        def dir_max(p, sA, sB):
            """Directional terrain bound: max of the 8x8-pooled level-p
            window over the hexagonal strip the tile's rays sample for arc
            distances s in [sA, sB] along the current azimuth — the TPU
            analog of the reference's warm-start ray saving
            (horizon_comp.cpp:436-496), but per (tile, azimuth, segment).

            Conservative: pooled blocks are dilated by sigma coarse cells
            (block half-extent 4 + read/bilinear smear) in every
            constraint, so every cell any ray in the segment can touch is
            inside the mask."""
            lvl, wpad = levels_meta[p][0], levels_meta[p][1]
            psz0, psz1 = levels_meta[p][4], levels_meta[p][5]
            kpow = 2 ** lvl
            ci = sh_i / kpow            # coarse cells per metre
            cj = sh_j / kpow
            T0f = float(t0) / kpow
            T1f = float(t1) / kpow
            sigma = 8.0
            a_div = lax.div(a_base, kpow).astype(jnp.float32)
            b_div = lax.div(b_base, kpow).astype(jnp.float32)
            # pooled-window cell (pi, pj) -> block-centre offset (coarse
            # cells) from the tile origin: padded-level row 8*(ppal + pi)
            # + 3.5 plus the slice origin soff[4+p] (the slice start is a
            # multiple of 8, so local pooled blocks coincide with global
            # ones), minus the level's low pad (wpad + 2), minus the tile
            # origin a_base // k.
            base_i = (8.0 * pstarts[p][0].astype(jnp.float32) + 3.5
                      + soff_ref[4 + p].astype(jnp.float32)
                      - (wpad + 2) - a_div)
            base_j = (8.0 * pstarts[p][1].astype(jnp.float32) + 3.5
                      - (wpad + 2) - b_div)
            # integer iota then cast (Mosaic's iota is integer-only)
            oi = base_i + 8.0 * jax.lax.broadcasted_iota(
                jnp.int32, (psz0, psz1), 0).astype(jnp.float32)
            oj = base_j + 8.0 * jax.lax.broadcasted_iota(
                jnp.int32, (psz0, psz1), 1).astype(jnp.float32)
            si_lo = jnp.minimum(sA * ci, sB * ci)
            si_hi = jnp.maximum(sA * ci, sB * ci)
            sj_lo = jnp.minimum(sA * cj, sB * cj)
            sj_hi = jnp.maximum(sA * cj, sB * cj)
            m_ij = ((oi >= si_lo - sigma) & (oi <= T0f + si_hi + sigma)
                    & (oj >= sj_lo - sigma) & (oj <= T1f + sj_hi + sigma))
            cr = oi * cj - oj * ci
            cslack = sigma * (jnp.abs(ci) + jnp.abs(cj))
            cr_lo = (jnp.minimum(0.0, T0f * cj)
                     + jnp.minimum(0.0, -T1f * ci) - cslack)
            cr_hi = (jnp.maximum(0.0, T0f * cj)
                     + jnp.maximum(0.0, -T1f * ci) + cslack)
            mask = m_ij & (cr >= cr_lo) & (cr <= cr_hi)
            return jnp.max(jnp.where(mask, pwin_refs[p][...], _NEG_INIT))

        # ---- d2 near field: midpoint + endpoint reads, exact parabola
        # per one-step window (carries live in loop state, not VMEM refs) --
        def d2_step(m, acc, h1, masked):
            s_end = (m + 1).astype(jnp.float32) * step
            s_start = s_end - step
            hm, dim, djm = read0(s_end - 0.5 * step)
            he, die, dje = read0(s_end)
            acc = point_update(acc, he, s_end, 2 * m)
            a_c = (2.0 * he + 2.0 * h1 - 4.0 * hm) * (inv_l0 * inv_l0)
            b_c = (4.0 * hm - 3.0 * h1 - he) * inv_l0
            extra = None
            v_end = None
            if masked:
                v_end = inside0(die, dje)
                extra = inside0(dim, djm) & v_end
            acc = quad_update(acc, a_c, b_c, h1, s_start, step, 0.0, extra,
                              2 * m + 1)
            return acc, he, v_end

        # ---- d1 mid field: one read per step; parabola through the last
        # three endpoint samples.  Steps are processed in PAIRS: the first
        # step of a pair only point-samples, the second also runs the
        # interior (quad) update with t_lo=0 so its window covers both
        # trailing intervals — identical interval coverage at half the
        # sqrt/div cost (the quad update is ~1/3 of kernel time otherwise).
        # (A pair-shared slab was tried twice and REVERTED: one aligned
        # slab per pair with the two reads picked by data selects measured
        # 0.240 s and by 3-node zero-weight sums 0.196 s vs 0.183 s for
        # two plain reads at the bench shape — the extra lane-offset
        # slices/madds cost more than the saved roll pass.)
        def d1_pair(m, acc, h1, masked, v1=None):
            """Two marching steps ending at (m+1)*step and (m+2)*step;
            h1 = sample at m*step.  Returns (acc, h_a, h_b[, v_a, v_b])."""
            s_a = (m + 1).astype(jnp.float32) * step
            s_b = s_a + step
            h_a, dia, dja = read0(s_a)
            acc = point_update(acc, h_a, s_a, 2 * m)
            if "one_read" in _ABLATE:
                h_b, dib, djb = h_a, dia, dja
            else:
                h_b, dib, djb = read0(s_b)
            acc = point_update(acc, h_b, s_b, 2 * (m + 1))
            a_c = (2.0 * h_b + 2.0 * h1 - 4.0 * h_a) * (inv_l1 * inv_l1)
            b_c = (4.0 * h_a - 3.0 * h1 - h_b) * inv_l1
            extra = None
            v_a = v_b = None
            if masked:
                v_a = inside0(dia, dja)
                v_b = inside0(dib, djb)
                extra = (v1 > 0.5) & v_a & v_b
            acc = quad_update(acc, a_c, b_c, h1, s_b - 2.0 * step,
                              2.0 * step, 0.0, extra, 2 * (m + 1) + 1)
            return acc, h_a, h_b, v_a, v_b

        def d1_single(m, acc, h2, h1, masked, v2=None, v1=None):
            """Trailing odd step: point sample + quad over the new interval
            only (t_lo = step), using the carried h2/h1 history."""
            s_end = (m + 1).astype(jnp.float32) * step
            he, die, dje = read0(s_end)
            acc = point_update(acc, he, s_end, 2 * m)
            a_c = (2.0 * he + 2.0 * h2 - 4.0 * h1) * (inv_l1 * inv_l1)
            b_c = (4.0 * h1 - 3.0 * h2 - he) * inv_l1
            extra = None
            v_end = None
            if masked:
                v_end = inside0(die, dje)
                extra = (v2 > 0.5) & (v1 > 0.5) & v_end
            acc = quad_update(acc, a_c, b_c, h2, s_end - 2.0 * step,
                              2.0 * step, step, extra, 2 * m + 1)
            return acc, he, v_end

        if mask_ref is None:
            neg = z_org * 0.0 + _NEG_INIT
        else:
            neg = jnp.where(mask_ref[...] > 0.5, _NEG_INIT, _POS_INIT)
        ones = z_org * 0.0 + 1.0
        if emit_argmax:
            # no-winner sentinel: larger than any candidate id, so range
            # presence tests in the backward never match it; the deferred
            # aux divide starts at 1/1
            neg = (neg, jnp.full((t0, t1), ID_NONE, jnp.int32),
                   jnp.full((t0, t1), 1.0, jnp.float32),
                   jnp.full((t0, t1), 1.0, jnp.float32))
        acc, h2, h1 = neg, z_inner, z_inner

        if ns2 > 0:
            def b_d2(m, c):
                acc, h2, h1 = c
                acc, he, _ = d2_step(m, acc, h1, False)
                return (acc, h1, he)
            acc, h2, h1 = lax.fori_loop(0, ns2, b_d2, (acc, h2, h1))
        v2, v1 = ones, ones
        if nx > ns2:
            # unsafe d2 steps: carry endpoint validity as float 0/1
            # (Mosaic cannot carry i1 vectors through scf.for)
            def b_d2u(m, c):
                acc, h2, h1, v2, v1 = c
                acc, he, v_end = d2_step(m, acc, h1, True)
                return (acc, h1, he, v1, jnp.where(v_end, 1.0, 0.0))
            acc, h2, h1, v2, v1 = lax.fori_loop(
                ns2, nx, b_d2u, (acc, h2, h1, v2, v1))
        if ns1 > nx:
            n_pairs = (ns1 - nx) // 2
            if n_pairs > 0:
                def b_d1(i, c):
                    acc, h1 = c
                    acc, _, h_b, _, _ = d1_pair(nx + 2 * i, acc, h1, False)
                    return (acc, h_b)
                # seed: h1 = sample at nx*step is the previous phase's last
                # endpoint (carried in h1)
                if ns1 == n_dense and (ns1 - nx) % 2 == 0 \
                        and n_pairs >= 8:
                    # Chunk the safe d1 range; skip far chunks whose
                    # directional terrain bound cannot raise any cell.  A
                    # skipped chunk re-reads its last sample so the next
                    # chunk's parabola history stays correct.
                    n_chunks = 4
                    bnds = [round(n_pairs * g / n_chunks)
                            for g in range(n_chunks + 1)]
                    c = (acc, h1)
                    acc_min = None
                    for g in range(n_chunks):
                        b0, b1 = bnds[g], bnds[g + 1]
                        if b1 <= b0:
                            continue
                        def run_g(c, b0=b0, b1=b1):
                            return lax.fori_loop(b0, b1, b_d1, c)
                        if g == 0:
                            c = run_g(c)
                            continue
                        sA = (nx + 2 * b0 + 1) * step
                        sB = (nx + 2 * b1) * step
                        def skip_g(c, sB=sB):
                            return (c[0], read0(jnp.float32(sB))[0])
                        if "no_skip" in _ABLATE:
                            c = run_g(c)
                            continue
                        if acc_min is None:
                            # one reduction reused by every later chunk: a
                            # stale (smaller) min only makes skips rarer,
                            # never unsafe (acc is non-decreasing)
                            acc_min = jnp.min(_val(c[0]))
                        # Skipped candidates include interior-parabola
                        # stationary ratios, whose height can overshoot the
                        # pooled sample maximum by (hi - lo)/8 (parabola
                        # through 3 equispaced samples in [lo, hi]); lo is
                        # floored by the level-0 window minimum.  The first
                        # pair's interval starts at sA - step, so that is
                        # both the strip start and the divisor for
                        # non-negative numerators; terrain below the origin
                        # yields the least-negative ratio at the far end.
                        dmax = dir_max(0, sA - step, sB)
                        num = (dmax - z_org_min
                               + 0.125 * jnp.maximum(
                                   dmax - wmax_ref[n_levels], 0.0))
                        if shadow:
                            bound = num - jnp.minimum(
                                (sA - step) * m_min, sB * m_min)
                        else:
                            bound = num * jnp.where(num >= 0.0,
                                                    1.0 / (sA - step),
                                                    1.0 / sB)
                        skip = bound <= acc_min
                        if shadow and not exact_metric:
                            # sign-exact mode (Terrain queries only use
                            # metric > 0): skips may also fire when no
                            # candidate can be positive (bound <= 0) or
                            # every cell is already occluded
                            skip = (skip | (bound <= 0.0)
                                    | (acc_min > 0.0))
                        c = lax.cond(skip, skip_g, run_g, c)
                    acc, h1n = c
                else:
                    acc, h1n = lax.fori_loop(0, n_pairs, b_d1, (acc, h1))
                # reconstruct h2 for a possible trailing single step
                if (ns1 - nx) % 2:
                    s_m1 = jnp.float32((nx + 2 * n_pairs - 1) * step)
                    h2 = read0(s_m1)[0]
                h1 = h1n
            if (ns1 - nx) % 2:
                m_last = nx + 2 * n_pairs
                acc, he, _ = d1_single(jnp.int32(m_last), acc, h2, h1, False)
                h2, h1 = h1, he
        if n_dense > ns1:
            n_pairs = (n_dense - ns1) // 2
            if n_pairs > 0:
                def b_d1u(i, c):
                    acc, h1, v1 = c
                    acc, _, h_b, _, v_b = d1_pair(ns1 + 2 * i, acc, h1,
                                                  True, v1)
                    return (acc, h_b, jnp.where(v_b, 1.0, 0.0))
                acc, h1n, v1n = lax.fori_loop(
                    0, n_pairs, b_d1u, (acc, h1, v1))
                if (n_dense - ns1) % 2:
                    s_m1 = jnp.float32((ns1 + 2 * n_pairs - 1) * step)
                    he, die, dje = read0(s_m1)
                    h2, v2 = he, jnp.where(inside0(die, dje), 1.0, 0.0)
                h1, v1 = h1n, v1n
            if (n_dense - ns1) % 2:
                m_last = ns1 + 2 * n_pairs
                acc, he, _ = d1_single(jnp.int32(m_last), acc, h2, h1,
                                       True, v2, v1)

        # ---- Mip phases: conservative point samples ----
        # Nearest-neighbour upsample of the coarse window to the fine tile,
        # engineered around Mosaic costs (measured with
        # tools/ablate_kernel.py: jnp.repeat on sublanes, full-width lane
        # rolls and relayouts dominated the first implementation):
        #
        # * one aligned slab load, ONE dynamic lane roll at *coarse*
        #   resolution (the cheapest place to do the large shift);
        # * the row-axis k-repeat, sub-coarse row shift and slab row
        #   alignment fuse into a single dynamic one-hot matmul R @ slab
        #   (the MXU does the spread; building R is t0 x r8 iota compares);
        # * the column-axis k-repeat is a static one-hot matmul (hoisted);
        # * the remaining sub-coarse lane shift is < k lanes, so shallow
        #   levels use log2(k) select stages instead of a dynamic roll.
        #
        # No masks: mip reads are nearest (no blending), so off-grid
        # samples return the sentinel and never win the running max.
        n_dense_ids = 2 * phases_meta[0][1]
        mip_id_off = [0] * len(phases_meta)
        _off = n_dense_ids
        for _p in range(1, len(phases_meta)):
            mip_id_off[_p] = _off
            _off += phases_meta[_p][1]

        for p in range(1, 1 if "no_mip" in _ABLATE else len(phases_meta)):
            @pl.when((ak == 0) & (k_local == 0))
            def _(p=p):
                _dma(p).wait()
            lvl, n_m, s_first, step_l = phases_meta[p]
            # one min-reduction per phase, shared by the phase-level skip
            # and every chunk-level skip inside it (stale-min-safe: acc is
            # non-decreasing, so reusing the phase-entry min only makes
            # skips rarer, never unsafe)
            amin_p = jnp.min(_val(acc))
            kpow = 2 ** lvl
            wpad = levels_meta[p][1]
            s_last = s_first + (n_m - 1) * step_l
            sz0 = _round_up(t0 // kpow + 2 + 8, 8)
            sz1 = _round_up(t1 // kpow + 128 // kpow + 2 + 8, 128)
            t1_pad = _round_up(t1 + kpow + 1, 128)
            r8 = _round_up(sz0 + 7, 8)
            c128 = _round_up(sz1 + 127, 128)
            # one-hot column-upsample operator: S[c, y] = (y // k == c).
            c_idx = jax.lax.broadcasted_iota(jnp.int32, (sz1, t1_pad), 0)
            y_idx = jax.lax.broadcasted_iota(jnp.int32, (sz1, t1_pad), 1)
            s_op = (y_idx // kpow == c_idx).astype(jnp.float32)
            # static bias keeps div/rem operands positive (floor semantics)
            bias = kpow * 16384

            def mip_body(m, acc, lvl=lvl, kpow=kpow, wpad=wpad, sz0=sz0,
                         sz1=sz1, t1_pad=t1_pad, r8=r8, c128=c128,
                         s_op=s_op, bias=bias, s_first=s_first,
                         step_l=step_l, p=p):
                s = jnp.minimum(s_first + m.astype(jnp.float32) * step_l,
                                dist)
                ri = jnp.round(s * sh_i).astype(jnp.int32)
                rj = jnp.round(s * sh_j).astype(jnp.int32)
                c0 = a_base + ri
                c1 = b_base + rj
                st_i = lax.div(c0 + bias, kpow) - (bias // kpow) \
                    - lax.div(a_base, kpow) + wpad
                st_j = lax.div(c1 + bias, kpow) - (bias // kpow) \
                    - lax.div(b_base, kpow) + wpad
                al_i = lax.rem(c0 + bias, kpow)
                al_j = lax.rem(c1 + bias, kpow)
                start_i = st_i + deltas[p][0]
                start_j = st_j + deltas[p][1]
                ia = pl.multiple_of((start_i // 8) * 8, 8)
                ja = pl.multiple_of((start_j // 128) * 128, 128)
                slab = win_refs[p][pl.ds(ia, r8), pl.ds(ja, c128)]
                if slab.dtype != jnp.float32:
                    # bf16 experiment: halve the HBM DMA + VMEM load
                    # traffic; Mosaic's dynamic rotate needs f32, so
                    # upcast right after the load
                    slab = slab.astype(jnp.float32)
                slab = _roll_neg(slab, start_j - ja, 1)[:, :sz1]
                # fused row upsample + alignment:
                #   rows[y, :] = slab[(start_i - ia) + (y + al_i)//k, :]
                yy = jax.lax.broadcasted_iota(jnp.int32, (t0, r8), 0)
                cc = jax.lax.broadcasted_iota(jnp.int32, (t0, r8), 1)
                r_op = (lax.div(yy + al_i, kpow) + (start_i - ia)
                        == cc).astype(slab.dtype)
                rows = jnp.dot(r_op, slab,
                               preferred_element_type=jnp.float32)
                up = jnp.dot(rows, s_op,
                             preferred_element_type=jnp.float32)
                # final sub-coarse lane shift by al_j in [0, k)
                if lvl <= 2:
                    hs = up
                    for b in range(lvl):
                        sh = 1 << b
                        bit = ((al_j >> b) & 1) > 0
                        hs = jnp.where(
                            bit, jnp.pad(hs[:, sh:], ((0, 0), (0, sh))),
                            hs)
                    hs = hs[:, :t1]
                else:
                    hs = _roll_neg(up, al_j, 1)[:, :t1]
                return point_update(acc, hs, s, mip_id_off[p] + m)

            # ---- Strip-chunk path: amortise the upsample over a chunk ----
            # Up to _STRIP_GK/k consecutive steps read from ONE fine-
            # resolution strip built with the two one-hot matmuls; each
            # step is then a dense-style shifted read (the per-step
            # upsample machinery was ~36% of kernel time at the bench
            # shape, tools/ablate_kernel.py).  Values are bitwise equal to
            # the per-step path: the strip holds exactly the NN-upsampled
            # level, and reads land on the same cells.
            if strip_ref is not None and kpow <= _STRIP_KMAX:
                g_n = max(1, _STRIP_GK // kpow)
                n_ch = (n_m + g_n - 1) // g_n
                u0 = t0 + (g_n + 1) * kpow
                u1 = t1 + (g_n + 1) * kpow + 1
                u0r = _round_up(u0, 8)
                u1r = _round_up(u1, 128)
                sg0 = _round_up(u0 // kpow + 2 + 7, 8)
                sg1 = _round_up(u1 // kpow + 2 + 127, 128)
                cs = jax.lax.broadcasted_iota(jnp.int32, (sg1, u1r), 0)
                ys = jax.lax.broadcasted_iota(jnp.int32, (sg1, u1r), 1)
                s_opg = (ys // kpow == cs).astype(jnp.float32)

                def chunk_body(c, acc, kpow=kpow, wpad=wpad, bias=bias,
                               p=p, g_n=g_n, n_m=n_m, s_first=s_first,
                               step_l=step_l, u0r=u0r, u1r=u1r, sg0=sg0,
                               sg1=sg1, s_opg=s_opg):
                    def stw(s):
                        ri = jnp.round(s * sh_i).astype(jnp.int32)
                        rj = jnp.round(s * sh_j).astype(jnp.int32)
                        c0 = a_base + ri
                        c1 = b_base + rj
                        st_i = lax.div(c0 + bias, kpow) - (bias // kpow) \
                            - lax.div(a_base, kpow) + wpad + deltas[p][0]
                        st_j = lax.div(c1 + bias, kpow) - (bias // kpow) \
                            - lax.div(b_base, kpow) + wpad + deltas[p][1]
                        return (st_i, st_j, lax.rem(c0 + bias, kpow),
                                lax.rem(c1 + bias, kpow))

                    def s_of(m):
                        return jnp.minimum(
                            s_first + m.astype(jnp.float32) * step_l, dist)

                    m_lo = c * g_n
                    m_hi = jnp.minimum(m_lo + g_n - 1, n_m - 1)

                    def _run(acc):
                        qa_i, qa_j, _, _ = stw(s_of(m_lo))
                        qb_i, qb_j, _, _ = stw(s_of(m_hi))
                        # shifts are monotone in s, so chunk extrema are at
                        # the endpoints; anchor the strip at the minimum
                        q0_i = jnp.minimum(qa_i, qb_i)
                        q0_j = jnp.minimum(qa_j, qb_j)
                        ia = pl.multiple_of((q0_i // 8) * 8, 8)
                        ja = pl.multiple_of((q0_j // 128) * 128, 128)
                        slab = win_refs[p][pl.ds(ia, sg0), pl.ds(ja, sg1)]
                        if slab.dtype != jnp.float32:
                            slab = slab.astype(jnp.float32)
                        slab = _roll_neg(slab, q0_j - ja, 1)
                        yy = jax.lax.broadcasted_iota(
                            jnp.int32, (u0r, sg0), 0)
                        cc = jax.lax.broadcasted_iota(
                            jnp.int32, (u0r, sg0), 1)
                        r_opg = (lax.div(yy, kpow) + (q0_i - ia)
                                 == cc).astype(slab.dtype)
                        rows = jnp.dot(r_opg, slab,
                                       preferred_element_type=jnp.float32)
                        if "no_strip_mm2" in _ABLATE:
                            strip_ref[:u0r, :sg1] = rows
                        elif "no_strip_mm1" in _ABLATE:
                            strip_ref[:u0r, :u1r] = jnp.zeros(
                                (u0r, u1r), jnp.float32)
                        else:
                            strip_ref[:u0r, :u1r] = jnp.dot(
                                rows[:, :sg1], s_opg,
                                preferred_element_type=jnp.float32)

                        def g_body(g, acc, p=p):
                            m = jnp.minimum(m_lo + g, n_m - 1)  # tail
                            s = s_of(m)                  # re-reads (no-op)
                            si, sj, ai, aj = stw(s)
                            di = ai + (si - q0_i) * kpow
                            dj = aj + (sj - q0_j) * kpow
                            hs = _shifted_window(strip_ref, di, dj, t0, t1)
                            return point_update(acc, hs, s,
                                                mip_id_off[p] + m)
                        return lax.fori_loop(0, g_n, g_body, acc)

                    if "no_skip" in _ABLATE:
                        return _run(acc)
                    # Chunk-granular provably-safe early exit (the far
                    # chunks are the most skippable: the reference's
                    # warm-start saves the same rays,
                    # horizon_comp.cpp:436-496).  Value-exact: the bound
                    # dominates every candidate the chunk could produce,
                    # so skipping cannot change any cell's running max.
                    # Horizon: for terrain below the ray origin the ratio
                    # is largest at the FAR end of the segment, hence the
                    # sign-dependent divisor.  Shadow: clearance
                    # he - z_org - s*m bounded with the per-(tile, sun)
                    # minimum ray slope (mip candidates are point samples
                    # so no overshoot margin is needed).
                    sA = s_of(m_lo)
                    sB = jnp.maximum(s_of(m_hi), sA)
                    num = dir_max(p, sA, sB) - z_org_min
                    if shadow:
                        bound = num - jnp.minimum(sA * m_min, sB * m_min)
                        skip = bound <= amin_p
                        if not exact_metric:
                            skip = (skip | (bound <= 0.0)
                                    | (amin_p > 0.0))
                    else:
                        bound = num * jnp.where(num >= 0.0, 1.0 / sA,
                                                1.0 / sB)
                        skip = bound <= amin_p
                    return lax.cond(skip, lambda a: a, _run, acc)

                def run_phase(a, n_ch=n_ch, chunk_body=chunk_body):
                    return lax.fori_loop(0, n_ch, chunk_body, a)
            else:
                def run_phase(a, n_m=n_m, mip_body=mip_body):
                    return lax.fori_loop(0, n_m, mip_body, a)

            # Provably-safe early exit: skip the phase when no terrain
            # the segment can sample is able to raise any cell's running
            # value.  Both modes use the directional (strip-masked) pooled
            # bound; shadow additionally folds in the per-(tile, sun)
            # minimum ray slope — far phases skip once
            # s * m_min outgrows the relief, the dynamic analog of a
            # (max_z - min_z)/tan(elev) tfar cap.  Skips are value-exact
            # (the metric magnitude stays tiling-independent, as the
            # sharded tests assert) unless exact_metric=False, where an
            # "every cell already occluded" arm may also fire —
            # sign-exact only, for callers that just threshold the metric
            # (Terrain).
            if shadow:
                num = dir_max(p, s_first, s_last) - z_org_min
                bound = num - jnp.minimum(
                    s_first * m_min, s_last * m_min)
                skip = bound <= amin_p
                if not exact_metric:
                    skip = (skip | (bound <= 0.0)
                            | (amin_p > 0.0))
            else:
                num = dir_max(p, s_first, s_last) - z_org_min
                bound = num * jnp.where(num >= 0.0, 1.0 / s_first,
                                        1.0 / s_last)
                skip = bound <= amin_p
            if "no_skip" in _ABLATE:
                acc = run_phase(acc)
            else:
                acc = lax.cond(skip, lambda a: a, run_phase, acc)

        if emit_argmax:
            acc, aid, nsel, dsel = acc
            idout_ref[k_local, :, :] = aid
            auxout_ref[k_local, :, :] = nsel / jnp.where(
                jnp.abs(dsel) > 1e-30, dsel, 1e-30)
        if ramp_refs is not None:
            acc = acc + ux * ramp_refs[0][...] + uy * ramp_refs[1][...]
        # atan is applied outside the kernel (no Pallas TPU lowering);
        # the kernel emits the max elevation-angle ratio.
        out_ref[k_local, :, :] = acc
        return 0

    lax.fori_loop(0, a_chunk, azim_loop, 0)


def _pool_sizes(wsz0, wsz1):
    # 8x8-pooled companion window: window span in pooled blocks plus
    # the DMA start-alignment remainders (<= 7 rows / 127 lanes).
    return (_round_up(wsz0 // 8 + 1 + 7, 8),
            _round_up(wsz1 // 8 + 1 + 127, 128))


def _metas_for_tile(pads, phases_meta, t0, t1):
    """Per-level window metadata for a NEW tile shape from an existing
    ``phases_meta`` (window geometry depends only on pads, phase levels
    and the tile — no schedule rebuild needed; used by the backward
    kernels, which re-tile smaller than the forward)."""
    levels_meta = []
    wpad0 = pads[0] + 2
    wsz = (_round_up(t0 + 2 * wpad0 + 2 + 16 + 8, 8),
           _round_up(t1 + 2 * wpad0 + 2 + 256 + 128, 128))
    levels_meta.append((0, wpad0) + wsz + _pool_sizes(*wsz))
    for p in range(1, len(phases_meta)):
        lvl = phases_meta[p][0]
        wpad = pads[lvl] + 2
        k = 2 ** lvl
        # +8 rows / +128 cols: DMA source-start alignment remainder; a
        # further +8/+128 covers the aligned in-kernel read and another
        # +8/+128 the strip-chunk slab (see the kernel's mip phases)
        wsz = (_round_up(t0 // k + 2 * wpad + 2 + 16 + 8 + 8 + 8, 8),
               _round_up(t1 // k + 2 * wpad + 2 + 256 + 128 + 128 + 128,
                         128))
        levels_meta.append((lvl, wpad) + wsz + _pool_sizes(*wsz))
    return levels_meta, list(phases_meta)


def _build_metas(schedule, t0, t1, step):
    """Static per-level window metadata and per-phase marching metadata.

    Merges the level-0 phases into one dense phase entry; the kernel
    re-splits it statically into d2 (near_exact two-read steps) and d1
    (one-read steps), and into safe/masked ranges via n_safe.
    """
    n_dense_steps = sum(ph.num for ph in schedule.phases if ph.level == 0)
    phases_meta = [(0, n_dense_steps, step, step)]
    for p, ph in enumerate(schedule.phases):
        if ph.level == 0:
            continue
        s_vals = schedule.s_values[p]
        step_l = (float(s_vals[1] - s_vals[0]) if ph.num > 1
                  else step * 2 ** ph.level)
        phases_meta.append((ph.level, ph.num, float(s_vals[0]), step_l))
    return _metas_for_tile(schedule.pads, phases_meta, t0, t1)


def _vmem_limit(levels_meta, t0, t1, a_chunk, n_tensors=4, n_out=1):
    """Scoped-VMEM budget for the kernel: window + pooled scratch, the
    double-buffered in/out blocks, plus ~4 MiB headroom for roll slabs and
    fused temporaries.  The compiler's 16 MiB default rejects deep-schedule
    cases (the 2 m workflow has 11 mip levels, each with a ~460-cell
    marching halo); v5e/v5p physical VMEM is 128 MiB, so sizing the limit
    from the real footprint is safe.  ``n_out``: number of
    (a_chunk, t0, t1) output blocks — 3 on the argmax-emitting grad path
    (value + winner ids + stationary denominators)."""
    scratch = sum(m[2] * m[3] + m[4] * m[5] for m in levels_meta) * 4
    strip = _strip_scratch_shape(levels_meta, (t0, t1))
    if strip is not None:
        scratch += strip[0] * strip[1] * 4
    blocks = 2 * (n_tensors * t0 * t1 + n_out * a_chunk * t0 * t1) * 4
    # Headroom for roll slabs + fused temporaries: the dense-read slab is
    # (t0+16, t1+256) f32 with several live copies during the selects, so
    # the margin must scale with the tile (6 MiB flat rejected t0=256)
    slab = (t0 + 16) * (t1 + 256) * 4
    return min(int(scratch + blocks + 8 * slab + (6 << 20)), 100 << 20)


def default_a_chunk(azim_num, t0, t1):
    """Azimuths per grid step: budget the VMEM output block (a_chunk, t0,
    t1) at ~1 MiB — the real chip's 16 MiB scoped-vmem limit is otherwise
    exceeded at t1=512 (window slabs + roll scratch take the rest).

    ``a_chunk`` must divide the number of azimuth rows computed; see
    :func:`plan_azim` for the padding that keeps awkward counts (e.g.
    primes) efficient."""
    budget = min(azim_num, max(1, (1 << 20) // (t0 * t1 * 4)))
    a_chunk = budget
    while azim_num % a_chunk:
        a_chunk -= 1
    return a_chunk


def plan_azim(azim_num, t0, t1):
    """(a_chunk, azim_pad) for the single-device entry.

    ``a_chunk`` must divide the computed azimuth rows; an ``azim_num``
    with no divisor near the VMEM budget (e.g. a prime 359) would
    otherwise collapse ``a_chunk`` and multiply per-tile setup.  Instead
    the azimuth axis is padded up to the next multiple of the budget —
    the extra rows compute wrapped angles and are discarded — so
    azim_num=359 costs within a few percent of 360."""
    budget = min(azim_num, max(1, (1 << 20) // (t0 * t1 * 4)))
    a_chunk = budget
    while azim_num % a_chunk:
        a_chunk -= 1
    if a_chunk * 2 <= budget and azim_num > a_chunk:
        pad = ((azim_num + budget - 1) // budget) * budget
        return budget, pad
    return a_chunk, azim_num


def tile_schedule(inner_shape, tile, mask=None):
    """(n_tiles, 2) int32 tile coordinates; with ``mask`` (uint8/bool,
    inner_shape), tiles whose cells are all masked out are dropped — the
    tile-level analog of the reference's per-cell mask skip
    (horizon_comp.cpp:749)."""
    in0, in1 = inner_shape
    t0, t1 = tile
    nti, ntj = in0 // t0, in1 // t1
    coords = np.stack(np.meshgrid(np.arange(nti, dtype=np.int32),
                                  np.arange(ntj, dtype=np.int32),
                                  indexing="ij"), axis=-1).reshape(-1, 2)
    if mask is not None:
        mask = np.asarray(mask)
        if mask.shape != (in0, in1):
            raise ValueError(f"mask shape {mask.shape} != inner_shape "
                             f"{(in0, in1)}")
        active = (mask.reshape(nti, t0, ntj, t1) != 0).any(axis=(1, 3))
        coords = coords[active.reshape(-1)]
    return np.ascontiguousarray(coords, dtype=np.int32)


def plan_sweep(outer_shape, *, inner_shape, offset, tile, azim_num,
               dist_search, dx, dy, hori_acc=0.25, rel_err=None,
               max_level=10, a_chunk=None, allow_azim_pad=False):
    """Static planning shared by the single-device and sharded entries.

    Returns a dict of the static kernel parameters (window metadata, phase
    schedule, tile/chunk sizes, safe-march counts)."""
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
    azim_pad = azim_num
    if a_chunk is None:
        if allow_azim_pad:
            a_chunk, azim_pad = plan_azim(azim_num, t0, t1)
        else:
            a_chunk = default_a_chunk(azim_num, t0, t1)
    if azim_pad % a_chunk:
        raise ValueError("azim_num must be divisible by a_chunk")
    levels_meta, phases_meta = _build_metas(schedule, t0, t1, step)
    off0, off1 = offset
    # Leading dense steps that provably stay on-grid for every inner cell
    # (skips the per-step in-domain masks; cf. sweep.mark_safe_phases).
    h_out, w_out = outer_shape
    halo_cells = min(off0, off1, h_out - off0 - in0, w_out - off1 - in1)
    near_ex = (schedule.phases[0].num
               if schedule.phases[0].kind == "d2" else 0)
    return dict(
        levels_meta=tuple(levels_meta), phases_meta=tuple(phases_meta),
        pads=schedule.pads, tile=(t0, t1), a_chunk=a_chunk,
        offset=(int(off0), int(off1)), inner_shape=(in0, in1),
        dx=float(dx), dy=float(dy), step=step, dist=float(dist_search),
        near_ex=near_ex, n_safe=max(0, halo_cells - 2),
        rel_err=float(rel_err), max_level=int(max_level),
        azim_pad=int(azim_pad))


def horizon_sweep_pallas(z_outer, *, dx, dy, offset, inner_shape, azim_num,
                         dist_search, hori_acc=0.25, elev_ang_low_lim=-15.0,
                         elev_ang_up_lim=89.98, ray_org_elev=0.01,
                         rel_err=None, max_level=10, tile=(128, 256),
                         a_chunk=None, tilt_ramp=None, mask=None,
                         interpret=False):
    """Planar gridded horizon via the fused Pallas kernel.

    Same contract as :func:`horayzon_tpu.ops.sweep.horizon_sweep` (planar
    mode, uniform azimuths ``2*pi*k/azim_num``, no distance tracking).
    Differentiable w.r.t. ``z_outer`` and ``tilt_ramp`` via a custom VJP
    that recomputes through the XLA sweep (SURVEY.md section 7 step 8).

    ``tilt_ramp``: optional pair (A, B) of (in0, in1) arrays adding the
    per-(cell, azimuth) ratio offset ``sin(az)*A + cos(az)*B`` before the
    arctan — the curved-Earth local-tangent-frame correction with
    A = m_x/m_z, B = m_y/m_z of the per-cell ellipsoid normal.

    ``mask``: optional (in0, in1) uint8/bool array.  Tiles with no selected
    cell are skipped entirely (no DMA, no sweep) — their output cells hold
    **unspecified values**; callers apply their fill value, as
    :func:`horayzon_tpu.horizon.horizon_gridded` does.
    """
    z_outer = jnp.asarray(z_outer, dtype=jnp.float32)
    plan = plan_sweep(
        z_outer.shape, inner_shape=inner_shape, offset=offset, tile=tile,
        azim_num=azim_num, dist_search=dist_search, dx=dx, dy=dy,
        hori_acc=hori_acc, rel_err=rel_err, max_level=max_level,
        a_chunk=a_chunk, allow_azim_pad=a_chunk is None)
    tmap = tile_schedule(plan["inner_shape"], plan["tile"], mask)
    lo = math.radians(float(elev_ang_low_lim))
    in0, in1 = plan["inner_shape"]
    if tmap.shape[0] == 0:
        return jnp.full((in0, in1, azim_num), jnp.float32(lo))
    if tilt_ramp is not None:
        tilt_ramp = tuple(jnp.asarray(r, dtype=jnp.float32)
                          for r in tilt_ramp)
    cfg = _HzCfg(
        outer_shape=tuple(z_outer.shape), azim_num=int(azim_num),
        azim_pad=plan["azim_pad"],
        ray_org_elev=float(ray_org_elev),
        elev_lims=(float(elev_ang_low_lim), float(elev_ang_up_lim)),
        tile_map=tuple(map(tuple, tmap.tolist())),
        interpret=bool(interpret),
        **{k: plan[k] for k in ("levels_meta", "phases_meta", "pads",
                                "tile", "a_chunk", "offset", "inner_shape",
                                "dx", "dy", "step", "dist", "near_ex",
                                "n_safe", "rel_err", "max_level")})
    mask_arr = None
    if mask is not None:
        # uint8 on the wire (4x less host->device traffic than f32 over
        # slow links); pallas_forward_fn casts to f32 on device under jit
        mask_arr = jnp.asarray(np.asarray(mask, dtype=np.uint8))
    return _pallas_hz(cfg, z_outer, tilt_ramp, mask_arr)


#: Compiled-run cache for :func:`horizon_sweep_pallas_bands` (keyed by the
#: full static geometry including mask content hashes, so repeated calls
#: with the same plan reuse one compilation).
_BANDS_CACHE = {}
_BANDS_CACHE_MAX = 32


def horizon_sweep_pallas_bands(z_outer, *, dx, dy, offset, bands, azim_num,
                               dist_search, hori_acc=0.25,
                               elev_ang_low_lim=-15.0,
                               elev_ang_up_lim=89.98, ray_org_elev=0.01,
                               rel_err=None, max_level=10,
                               interpret=False):
    """Multi-rectangle masked horizon: one pyramid build, one fused-kernel
    launch per row band, all inside one jitted program.

    ``bands``: sequence of ``(blk0, shape, tile, mask)`` with ``blk0`` the
    band's inner-relative (row, col) start, ``shape`` its padded block
    shape, ``tile`` the (shared) kernel tile and ``mask`` an optional
    per-cell uint8 block mask.  Decomposing a masked region into per-band
    column bboxes lets the tile grid hug the unmasked shape much closer
    than one global bbox can (the reference gets this for free from its
    per-cell scalar loop, horizon_comp.cpp:749); every band's unmasked
    cells are bit-equal to the dense run (tile placement and mask-aware
    init are value-exact).

    Forward-only.  Returns a list of (shape[0], shape[1], azim_num)
    float32 [radian] band arrays in ``bands`` order.
    """
    import hashlib

    z_outer = jnp.asarray(z_outer, dtype=jnp.float32)
    off0, off1 = offset
    tile = tuple(bands[0][2])
    plans = []
    for blk0, shape, b_tile, _mask in bands:
        if tuple(b_tile) != tile:
            raise ValueError("all bands must share one tile shape")
        plans.append(plan_sweep(
            z_outer.shape, inner_shape=tuple(shape),
            offset=(off0 + int(blk0[0]), off1 + int(blk0[1])),
            tile=tile, azim_num=azim_num, dist_search=dist_search,
            dx=dx, dy=dy, hori_acc=hori_acc, rel_err=rel_err,
            max_level=max_level))
    pads = plans[0]["pads"]
    lm = plans[0]["levels_meta"]

    key_parts = [z_outer.shape, float(dx), float(dy), offset,
                 int(azim_num), float(dist_search), float(hori_acc),
                 float(ray_org_elev), bool(interpret), tile,
                 float(elev_ang_low_lim), float(elev_ang_up_lim),
                 None if rel_err is None else float(rel_err),
                 int(max_level)]
    tmaps = []
    mask_args = []
    for blk0, shape, _t, mask in bands:
        tmap = tile_schedule(tuple(shape), tile, mask)
        tmaps.append(tmap)
        key_parts.append((tuple(blk0), tuple(shape),
                          None if mask is None
                          else hashlib.sha1(
                              np.asarray(mask, np.uint8).tobytes())
                          .hexdigest()))
        mask_args.append(None if mask is None
                         else jnp.asarray(np.asarray(mask, np.uint8)))
    key = tuple(map(repr, key_parts))

    if key not in _BANDS_CACHE:
        statics = []
        for p, (blk0, shape, _t, mask) in zip(plans, bands):
            statics.append(dict(
                levels_meta=p["levels_meta"], phases_meta=p["phases_meta"],
                pads=p["pads"], tile=p["tile"], a_chunk=p["a_chunk"],
                a_num=int(azim_num), n_az_out=int(azim_num),
                offset=p["offset"], inner_shape=p["inner_shape"],
                dx=p["dx"], dy=p["dy"], step=p["step"], dist=p["dist"],
                near_ex=p["near_ex"], n_safe=p["n_safe"],
                ray_org_elev=float(ray_org_elev),
                elev_lims=(float(elev_ang_low_lim),
                           float(elev_ang_up_lim)),
                interpret=bool(interpret)))
        tmap_consts = [jnp.asarray(t) for t in tmaps]

        def core(z, masks):
            padded = _padded_levels(z, pads)
            pooled = _pool8(padded, lm)
            soff = jnp.zeros((4,), jnp.int32)
            outs = []
            for i, st in enumerate(statics):
                out = pallas_forward_fn(
                    z, None, tmap_consts[i], soff, pyramid=tuple(padded),
                    pooled=tuple(pooled), mask_arr=masks[i], **st)
                outs.append(jnp.moveaxis(out, 0, -1))
            return tuple(outs)

        while len(_BANDS_CACHE) >= _BANDS_CACHE_MAX:
            # FIFO eviction: compiled band programs (plus their captured
            # tile-map constants) are per-mask-content, so a long-running
            # service sweeping many regions must not accumulate them.
            _BANDS_CACHE.pop(next(iter(_BANDS_CACHE)))
        _BANDS_CACHE[key] = jax.jit(core)
    return list(_BANDS_CACHE[key](z_outer, mask_args))


#: Extra sentinel margins (lo, hi_rows, hi_cols) the Pallas kernel needs
#: around each pyramid level beyond the schedule pad: low +4 keeps window
#: DMA starts >= 0; highs cover the aligned-slab roll margins (rows: +16
#: slab margin + 8 round-up; cols: +256 slab margin + 128 round-up + 128
#: aligned in-kernel read margin).
LEVEL_PAD_EXTRA = (4, 56, 776)


def _padded_levels(z_outer, pads):
    """Padded mip levels only (no pooled companions) — the differentiable
    part of :func:`build_padded_pyramid` (reverse-mode flows through the
    2x2 max-pools; the 8x8 pooled arrays feed only value-exact skip
    decisions and carry no gradient)."""
    levels = _mip.build_pyramid(z_outer, len(pads))
    if _MIP_BF16:
        levels = [levels[0]] + [_round_up_bf16(z_l)
                                for z_l in levels[1:]]
    lo_e, hi_r, hi_c = LEVEL_PAD_EXTRA
    return [jnp.pad(
        z_l, ((pads[lvl] + lo_e, pads[lvl] + hi_r),
              (pads[lvl] + lo_e, pads[lvl] + hi_c)),
        constant_values=_mip.PAD_VALUE) for lvl, z_l in enumerate(levels)]


def build_padded_pyramid(z_outer, pads, levels_meta):
    """Mip pyramid with the kernel's sentinel margins, plus the 8x8
    max-pooled companions feeding the directional early exit.

    Initialise-once helper (the reference builds its BVH once in
    ``CppTerrain::initialise``, shadow_comp.cpp:318-380): callers that
    query many times — :class:`horayzon_tpu.shadow.Terrain` — build this
    once and pass it to every kernel invocation via ``pyramid=``/
    ``pooled=``, leaving only DMAs and the sweep as per-query work.

    Returns ``(padded, pooled)`` lists of jnp arrays (one per level).
    """
    padded = _padded_levels(z_outer, pads)
    return padded, _pool8(padded, levels_meta)


def pallas_forward_fn(z_outer, tilt_ramp, tile_map, shard_off, *,
                      levels_meta, phases_meta, pads, tile, a_chunk, a_num,
                      n_az_out, offset, inner_shape, dx, dy, step, dist,
                      near_ex, n_safe, ray_org_elev, elev_lims, interpret,
                      pyramid=None, pooled=None, inner_start=None,
                      outer_shape=None, mask_arr=None, emit_argmax=False):
    """Unjitted fused forward: mip pyramid + padding + Pallas sweep + arctan.

    Safe to embed in ``shard_map`` (the jitted single-device entry is
    :data:`_pallas_core`).  ``tile_map`` (n_tiles, 2) int32 selects which
    inner tiles run; ``shard_off`` (4,) int32 = (row0, col0, azim0, 0)
    shifts the in-kernel geometry for sharded execution.  ``a_num`` is the
    *global* azimuth count (sets the angle of azimuth index k);
    ``n_az_out`` the local number of azimuths computed here.

    ``pyramid``: optional tuple of *pre-built padded* level arrays (each
    with :data:`LEVEL_PAD_EXTRA` margins around the schedule pad), e.g. a
    multi-resolution terrain where the far-field levels come from a coarse
    grid (:func:`horayzon_tpu.ops.multires.combined_pyramid`) — then
    ``z_outer`` is only the fine grid (inner + halo) and the search
    distance may exceed its extent.  Level arrays may be row-sliced
    windows of the full padded levels if ``shard_off[4 + p]`` carries each
    slice's start row (see the kernel docstring) — the memory-scalable
    sharded path (:func:`horayzon_tpu.parallel.shard.
    horizon_sweep_multires_pallas_sharded`).

    ``inner_start``: where to slice the (in0, in1) inner block out of
    ``z_outer`` (defaults to ``offset + shard_off[:2]``; pass (0, off1)
    when ``z_outer`` is a per-shard row slab).  ``outer_shape``: the
    *global* fine-grid shape for the in-domain masks when ``z_outer`` is
    a shard-local slab (defaults to ``z_outer.shape``).

    Returns (n_az_out, in0, in1) float32 [radian] — azimuth leads so the
    per-azimuth store indexes the cheap leading dimension; callers
    transpose once at the end.
    """
    t0, t1 = tile
    in0, in1 = inner_shape
    off0, off1 = offset

    if pyramid is None:
        padded, pooled = build_padded_pyramid(z_outer, pads, levels_meta)
    else:
        padded = list(pyramid)
        if pooled is None:
            pooled = _pool8(padded, levels_meta)
        else:
            pooled = list(pooled)

    n_soff = 4 + len(levels_meta)
    if shard_off.shape[0] < n_soff:
        shard_off = jnp.concatenate(
            [shard_off,
             jnp.zeros((n_soff - shard_off.shape[0],), jnp.int32)])
    if inner_start is None:
        z_inner = lax.dynamic_slice(
            z_outer, (off0 + shard_off[0], off1 + shard_off[1]), (in0, in1))
    else:
        z_inner = lax.dynamic_slice(z_outer, inner_start, (in0, in1))
    z_org = z_inner + jnp.float32(ray_org_elev)

    n_tiles = tile_map.shape[0]
    grid = (n_tiles, n_az_out // a_chunk)

    kernel = functools.partial(
        _kernel,
        levels_meta=levels_meta, phases_meta=phases_meta,
        tile=(t0, t1), a_chunk=a_chunk, a_num=a_num,
        off0=off0, off1=off1,
        outer_shape=(tuple(z_outer.shape) if outer_shape is None
                     else tuple(outer_shape)),
        dx=dx, dy=dy, step=step, dist=dist,
        near_exact=near_ex, n_safe=n_safe,
        mode="horizon" if tilt_ramp is None else "horizon_tilt",
        has_mask=mask_arr is not None, emit_argmax=emit_argmax)

    # Per-azimuth (sin, cos) table in f32: the host-side XLA tables and the
    # kernel must derive mip sample indices from bit-identical trig (see
    # _kernel).  Angles are the f32 azimuth_angles convention.  When the
    # azimuth axis is padded (plan_azim), rows beyond ``a_num`` continue
    # the same formula (wrapped angles) — they are computed and discarded.
    n_trig = max(a_num, n_az_out)
    azim32 = ((2.0 * np.pi) / a_num
              * np.arange(n_trig)).astype(np.float32)
    trig = np.stack([np.sin(azim32.astype(np.float64)),
                     np.cos(azim32.astype(np.float64))],
                    axis=-1).astype(np.float32)

    tile_spec = pl.BlockSpec(
        (t0, t1), lambda ti, ak, tm, so: (tm[ti, 0], tm[ti, 1]),
        memory_space=pltpu.VMEM)
    in_specs = [tile_spec, tile_spec]                  # z_org, z_inner
    mask_args = ()
    if mask_arr is not None:
        in_specs += [tile_spec]                        # per-cell mask
        mask_args = (jnp.asarray(mask_arr, dtype=jnp.float32),)
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]   # trig table
    ramp_args = ()
    if tilt_ramp is not None:
        in_specs += [tile_spec, tile_spec]             # ramp A, B
        ramp_args = tuple(tilt_ramp)
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)
                 for _ in range(2 * len(levels_meta))]

    scratch_shapes = (
        [pltpu.VMEM((m[2], m[3]), padded[p].dtype)
         for p, m in enumerate(levels_meta)]
        + [pltpu.VMEM((m[4], m[5]), jnp.float32) for m in levels_meta]
        + [pltpu.SMEM((len(levels_meta) + 1,), jnp.float32),
           pltpu.SemaphoreType.DMA((2 * len(levels_meta),))])
    strip_shape = _strip_scratch_shape(levels_meta, (t0, t1))
    if strip_shape is not None:
        scratch_shapes = scratch_shapes + [
            pltpu.VMEM(strip_shape, jnp.float32)]

    out_spec = pl.BlockSpec(
        (a_chunk, t0, t1),
        lambda ti, ak, tm, so: (ak, tm[ti, 0], tm[ti, 1]),
        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_az_out, in0, in1), jnp.float32)
    out_specs = out_spec
    if emit_argmax:
        out_specs = [out_spec, out_spec, out_spec]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((n_az_out, in0, in1), jnp.int32),
                     jax.ShapeDtypeStruct((n_az_out, in0, in1),
                                          jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(
                levels_meta, t0, t1, a_chunk,
                n_tensors=2 + len(mask_args) + 2 * len(ramp_args),
                n_out=3 if emit_argmax else 1)),
        interpret=interpret,
    )(tile_map, shard_off, z_org, z_inner, *mask_args, jnp.asarray(trig),
      *ramp_args, *padded, *pooled)
    if emit_argmax:
        # raw ratio + winner ids + stationary denominators; the caller
        # applies arctan/clip and keeps these as residuals for the
        # winner-replay backward
        return out[0], out[1], out[2]
    return jnp.clip(jnp.arctan(out),
                    math.radians(elev_lims[0]),
                    math.radians(elev_lims[1]))


#: Jitted entry for :func:`pallas_forward_fn`.
_pallas_core = functools.partial(
    jax.jit,
    static_argnames=("levels_meta", "phases_meta", "pads", "tile",
                     "a_chunk", "a_num", "n_az_out", "offset",
                     "inner_shape", "dx", "dy", "step", "dist", "near_ex",
                     "n_safe", "ray_org_elev", "elev_lims", "interpret",
                     "emit_argmax"))(
    pallas_forward_fn)


#: Hashable static config of one Pallas horizon invocation (drives the
#: custom-VJP entry; ``tile_map`` is static so the backward pass needs no
#: integer cotangents).
_HzCfg = collections.namedtuple("_HzCfg", [
    "levels_meta", "phases_meta", "pads", "tile", "a_chunk", "azim_num",
    "azim_pad", "offset", "inner_shape", "outer_shape", "dx", "dy",
    "step", "dist", "near_ex", "n_safe", "ray_org_elev", "elev_lims",
    "rel_err", "max_level", "tile_map", "interpret"])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_hz(cfg, z_outer, tilt_ramp, mask_arr):
    """Differentiable fused-kernel horizon: Pallas forward, XLA-sweep
    backward (recompute-based custom VJP — the fused kernel's running
    maxima are cheap to re-derive through :func:`ops.sweep.horizon_core_fn`
    whose VJP XLA generates; SURVEY.md section 7 step 8).

    ``mask_arr``: optional (in0, in1) float 0/1 per-cell mask feeding the
    kernel's mask-aware accumulator init (non-differentiable)."""
    return _hz_fwd_value(cfg, z_outer, tilt_ramp, mask_arr)


def _hz_fwd_value(cfg, z_outer, tilt_ramp, mask_arr):
    tmap = jnp.asarray(np.asarray(cfg.tile_map, dtype=np.int32)
                       .reshape(-1, 2))
    soff = jnp.zeros((4,), dtype=jnp.int32)
    out = _pallas_core(
        z_outer, tilt_ramp, tmap, soff, mask_arr=mask_arr,
        levels_meta=cfg.levels_meta, phases_meta=cfg.phases_meta,
        pads=cfg.pads, tile=cfg.tile, a_chunk=cfg.a_chunk,
        a_num=cfg.azim_num, n_az_out=cfg.azim_pad, offset=cfg.offset,
        inner_shape=cfg.inner_shape, dx=cfg.dx, dy=cfg.dy, step=cfg.step,
        dist=cfg.dist, near_ex=cfg.near_ex, n_safe=cfg.n_safe,
        ray_org_elev=cfg.ray_org_elev, elev_lims=cfg.elev_lims,
        interpret=cfg.interpret)
    return jnp.moveaxis(out[:cfg.azim_num], 0, -1)


def _hz_xla_equiv(cfg, z_outer, tilt_ramp):
    """XLA-sweep reproduction of the Pallas forward (same schedule knobs),
    used to generate the backward pass.  Adds the tilt-ramp terms to the
    raw ratio before the arctan, exactly as the kernel does."""
    schedule = _sweep.build_schedule(cfg.step, cfg.dist, cfg.rel_err,
                                     max_level=cfg.max_level)
    in0, in1 = cfg.inner_shape
    off0, off1 = cfg.offset
    h_out, w_out = cfg.outer_shape
    halo = min(off0, off1, h_out - off0 - in0, w_out - off1 - in1)
    schedule = _sweep.mark_safe_phases(schedule, halo)
    # Match the kernel's f32 azimuth convention bit-for-bit (the SMEM trig
    # table in pallas_forward_fn rounds angles to f32 before sin/cos; mip
    # sample indices must come from identical trig or a round() boundary
    # can flip to a neighbouring max-pooled block).
    azim = ((2.0 * np.pi) / cfg.azim_num
            * np.arange(cfg.azim_num)).astype(np.float32).astype(np.float64)
    tables_np = _sweep.horizon_shift_tables(schedule, azim, cfg.dx, cfg.dy,
                                            cfg.offset)
    tables = jax.tree_util.tree_map(jnp.asarray, tables_np)
    trig = {
        "sin": jnp.asarray(np.sin(azim), dtype=jnp.float32),
        "cos": jnp.asarray(np.cos(azim), dtype=jnp.float32),
        "ux": jnp.asarray(np.sin(azim), dtype=jnp.float32),
        "uy": jnp.asarray(np.cos(azim), dtype=jnp.float32),
    }
    z_inner = lax.dynamic_slice(z_outer, (off0, off1), (in0, in1))
    z_org = z_inner + jnp.float32(cfg.ray_org_elev)
    ratio, _ = _sweep.horizon_core_fn(
        z_outer, z_org, z_inner, None, tables, trig,
        sched_meta=schedule.meta(), pads=schedule.pads,
        inner_shape=cfg.inner_shape, planar=True, track_dist=False,
        apply_arctan=False)
    if tilt_ramp is not None:
        ratio = (ratio + trig["sin"] * tilt_ramp[0][..., None]
                 + trig["cos"] * tilt_ramp[1][..., None])
    return jnp.clip(jnp.arctan(ratio),
                    math.radians(cfg.elev_lims[0]),
                    math.radians(cfg.elev_lims[1]))


#: Backward-pass implementation: "replay" (argmax-emitting Pallas forward
#: + winner-replay Pallas backward — grad wall ~ forward wall) or
#: "recompute" (XLA-sweep recompute VJP, the round-3 path, kept as a
#: debugging fallback; select with HZT_GRAD_RECOMPUTE=1).
def _grad_mode():
    import os
    return ("recompute" if os.environ.get("HZT_GRAD_RECOMPUTE") == "1"
            else "replay")


def _hz_fwd(cfg, z_outer, tilt_ramp, mask_arr):
    if _grad_mode() == "recompute":
        return (_hz_fwd_value(cfg, z_outer, tilt_ramp, mask_arr),
                (z_outer, tilt_ramp, mask_arr, None, None, None))
    tmap = jnp.asarray(np.asarray(cfg.tile_map, dtype=np.int32)
                       .reshape(-1, 2))
    soff = jnp.zeros((4,), dtype=jnp.int32)
    raw, ids, aux = _pallas_core(
        z_outer, tilt_ramp, tmap, soff, mask_arr=mask_arr,
        emit_argmax=True,
        levels_meta=cfg.levels_meta, phases_meta=cfg.phases_meta,
        pads=cfg.pads, tile=cfg.tile, a_chunk=cfg.a_chunk,
        a_num=cfg.azim_num, n_az_out=cfg.azim_pad, offset=cfg.offset,
        inner_shape=cfg.inner_shape, dx=cfg.dx, dy=cfg.dy, step=cfg.step,
        dist=cfg.dist, near_ex=cfg.near_ex, n_safe=cfg.n_safe,
        ray_org_elev=cfg.ray_org_elev, elev_lims=cfg.elev_lims,
        interpret=cfg.interpret)
    # ids/aux stay azimuth-padded (the backward grid needs rows divisible
    # by a_chunk); raw is sliced for the primal/chain
    raw = raw[:cfg.azim_num]
    out = jnp.clip(jnp.arctan(jnp.moveaxis(raw, 0, -1)),
                   math.radians(cfg.elev_lims[0]),
                   math.radians(cfg.elev_lims[1]))
    return out, (z_outer, tilt_ramp, mask_arr, raw, ids, aux)


def _hz_bwd(cfg, residuals, g):
    z_outer, tilt_ramp, mask_arr, raw, ids, aux = residuals
    dm = None
    if mask_arr is not None:
        # integer-dtype primal -> symbolic-zero cotangent
        dm = np.zeros(mask_arr.shape, dtype=jax.dtypes.float0)
    if raw is None:
        _, vjp = jax.vjp(lambda z, r: _hz_xla_equiv(cfg, z, r),
                         z_outer, tilt_ramp)
        dz, dr = vjp(g)
        return (dz, dr, dm)
    dz, dr = _hz_bwd_replay(cfg, z_outer, tilt_ramp, raw, ids, aux, g)
    return (dz, dr, dm)


_pallas_hz.defvjp(_hz_fwd, _hz_bwd)


#: Dense steps per presence-tested chunk in the backward kernel.
_BWD_DCH = 32

#: Profiling-only ablation flags for the backward kernel (see _ABLATE):
#: "no_scatter" (skip window-cotangent scatters), "no_quad" (skip
#: interior-parabola winners), "no_mip" (skip far-field winners),
#: "no_pres" (drop presence tests: process every step).
_BWD_ABLATE = frozenset()


def _bwd_kernel(tmap_ref, soff_ref, z_org_ref, g_ref, id_ref, aux_ref,
                *refs, levels_meta, phases_meta, tile, a_chunk, a_num,
                off0, off1, dx, dy, step, dist, near_exact,
                mode="horizon", grid_origin=(0.0, 0.0)):
    """Winner-replay backward kernel (horizon and shadow modes).

    Grid and tile/window geometry mirror :func:`_kernel`.  Inputs: the
    ratio cotangent ``g_ref`` and winner-id map ``id_ref`` (from the
    argmax-emitting forward, chained through arctan/clip by the caller).
    For each candidate id present in the tile (range presence tests skip
    whole dense chunks / mip phases; equality tests skip single steps),
    the kernel computes the candidate's closed-form partials — envelope
    theorem for interior-parabola winners: at the stationary point t* the
    total derivative equals the partial at fixed t*, and the forward
    recorded t* via ``aux_ref`` (D = s_start + t*), so NO heights are
    re-read — and accumulates bilinear-weighted contributions into
    per-tile, per-level window cotangents plus a per-cell ``z_org``
    cotangent.  The host overlap-adds the window blocks into full level
    arrays and routes them through the VJP of the pyramid build
    (max-pools) to ``z_outer``.

    mode="shadow": the second grid axis is a sun chunk and the metric is
    the clearance ``h(s) - z_org - s*m`` (shadow_comp.cpp:454-467 made
    differentiable).  The sample partial loses the horizon's 1/(s+t*)
    ratio chain (scatter coefficients are the bare envelope polynomials)
    and the ``z_org`` coefficient becomes ``-1 - S*dm/dz_org`` with
    S = s (points) or the recorded D (parabola winners): the per-cell ray
    slope ``m = (sun_z - z_org)/dot`` itself depends on the ray-origin
    height, dot being the horizontal advance toward the sun.

    refs layout: [trig (SMEM) / sun table (SMEM, shadow)] then outputs
    [wcot_0.. wcot_{L-1} (each (1, wsz0_p, wsz1_p)), zcot (1, t0, t1)]
    then scratch [zc (VMEM t0 x t1), strip (VMEM, when any level uses the
    strip-chunk adjoint)].
    """
    shadow = mode == "shadow"
    n_levels = len(levels_meta)
    trig_ref = refs[0]
    wcot_refs = refs[1:1 + n_levels]
    zcot_ref = refs[1 + n_levels]
    zc_ref = refs[2 + n_levels]
    strip_ref = (refs[3 + n_levels]
                 if _strip_scratch_shape(levels_meta, tile) is not None
                 else None)

    t0, t1 = tile
    ti = pl.program_id(0)
    ak = pl.program_id(1)
    a_base = off0 + soff_ref[0] + tmap_ref[ti, 0] * t0
    b_base = off1 + soff_ref[1] + tmap_ref[ti, 1] * t1
    wpad0 = levels_meta[0][1]

    # per-level DMA-alignment remainders (as in the forward)
    deltas = []
    for p, (lvl, wpad, wsz0, wsz1, psz0, psz1) in enumerate(levels_meta):
        k = 2 ** lvl
        src_i = (a_base // k) + 2 - soff_ref[4 + p]
        src_j = (b_base // k) + 2
        deltas.append((src_i - pl.multiple_of((src_i // 8) * 8, 8),
                       src_j - pl.multiple_of((src_j // 128) * 128, 128)))

    @pl.when(ak == 0)
    def _():
        for p in range(n_levels):
            wcot_refs[p][...] = jnp.zeros(wcot_refs[p].shape, jnp.float32)
        zcot_ref[...] = jnp.zeros(zcot_ref.shape, jnp.float32)

    z_org = z_org_ref[...]
    d0_i, d0_j = deltas[0]
    n_dense = phases_meta[0][1]
    nx = min(near_exact, n_dense)
    inv_l0 = 1.0 / step
    inv_l1 = 0.5 / step

    # static per-phase candidate-id offsets (match the forward)
    mip_id_off = [0] * len(phases_meta)
    _off = 2 * n_dense
    for _p in range(1, len(phases_meta)):
        mip_id_off[_p] = _off
        _off += phases_meta[_p][1]

    if shadow:
        xr = ((jax.lax.broadcasted_iota(jnp.int32, (t0, t1), 1)
               + b_base).astype(jnp.float32)) * dx + grid_origin[0]
        yr = ((jax.lax.broadcasted_iota(jnp.int32, (t0, t1), 0)
               + a_base).astype(jnp.float32)) * dy + grid_origin[1]

    def azim_loop(k_local, _):
        if shadow:
            sun_x = trig_ref[k_local, 0]
            sun_y = trig_ref[k_local, 1]
            sun_z = trig_ref[k_local, 2]
            kx_u = trig_ref[k_local, 3]
            ky_u = trig_ref[k_local, 4]
            sh_i = trig_ref[k_local, 5]
            sh_j = trig_ref[k_local, 6]
            sxr = sun_x - xr
            syr = sun_y - yr
            szr = sun_z - z_org
            mag = jnp.sqrt(sxr * sxr + syr * syr + szr * szr)
            dot = sxr * kx_u + syr * ky_u
            adv = dot / mag
            # dm/dz_org: on the unclamped arm m = szr/dot (the mag
            # cancels, dot is z-independent); the adv <= 1e-4 clamp arm
            # keeps the mag dependence of m = (szr/mag)/1e-4
            dmdz = jnp.where(
                adv > 1.0e-4, -1.0 / dot,
                -(sxr * sxr + syr * syr) / (mag * mag * mag * 1.0e-4))
        else:
            k_glob = soff_ref[2] + ak * a_chunk + k_local
            ux = trig_ref[k_glob, 0]
            uy = trig_ref[k_glob, 1]
            sh_i = uy / dy
            sh_j = ux / dx
        ids = id_ref[k_local, :, :]
        gv = g_ref[k_local, :, :]
        aux = aux_ref[k_local, :, :]
        zc_ref[...] = jnp.zeros((t0, t1), jnp.float32)

        def geom(s):
            """Level-0 read geometry at arc distance ``s`` (identical
            f32 math to the forward's read0 floor shifts)."""
            dif = s * sh_i
            djf = s * sh_j
            di = jnp.floor(dif)
            dj = jnp.floor(djf)
            return (di.astype(jnp.int32), dj.astype(jnp.int32),
                    dif - di, djf - dj)

        def scatter0(coef, di, dj, fi, fj):
            """Adjoint of a level-0 bilinear read: spread ``coef`` with the
            bilinear corner weights and add at the read's dynamic window
            position (aligned slab embed + right rolls + indexed add)."""
            if "no_scatter" in _BWD_ABLATE:
                zc_ref[...] += coef * 1e-30
                return
            w00 = coef * (1.0 - fi) * (1.0 - fj)
            w01 = coef * (1.0 - fi) * fj
            w10 = coef * fi * (1.0 - fj)
            w11 = coef * fi * fj
            rows, cols = t0 + 1, t1 + 1
            # corner spread via zero pads (Mosaic has no scatter; static
            # pads lower to cheap shifts)
            field = (jnp.pad(w00, ((0, 1), (0, 1)))
                     + jnp.pad(w01, ((0, 1), (1, 0)))
                     + jnp.pad(w10, ((1, 0), (0, 1)))
                     + jnp.pad(w11, ((1, 0), (1, 0))))
            start_i = di + wpad0 + d0_i
            start_j = dj + wpad0 + d0_j
            ia = pl.multiple_of((start_i // 8) * 8, 8)
            ja = pl.multiple_of((start_j // 128) * 128, 128)
            r = _round_up(rows + 7, 8)
            c = _round_up(cols + 127, 128)
            slab = jnp.pad(field, ((0, r - rows), (0, c - cols)))
            slab = pltpu.roll(slab, start_i - ia, 0)
            slab = pltpu.roll(slab, start_j - ja, 1)
            cur = wcot_refs[0][0, pl.ds(ia, r), pl.ds(ja, c)]
            wcot_refs[0][0, pl.ds(ia, r), pl.ds(ja, c)] = cur + slab

        def point_bwd(m):
            """Dense point winner at step m: r = (h(s) - z_org)/s
            (horizon) or h(s) - z_org - s*m (shadow)."""
            s = (m + 1).astype(jnp.float32) * step
            pm = ids == 2 * m
            if shadow:
                coef = jnp.where(pm, gv, 0.0)
                zc = coef * (-1.0 - s * dmdz)
            else:
                coef = jnp.where(pm, gv, 0.0) * (1.0 / s)
                zc = -coef
            di, dj, fi, fj = geom(s)
            scatter0(coef, di, dj, fi, fj)
            zc_ref[...] += zc

        def quad_bwd(m, d2):
            """Dense interior-parabola winner with id 2m+1.

            d2 (m < nx): samples at m, m+1/2, m+1 steps, s0 = m*step,
            q = 1/step.  d1: samples at m-1, m, m+1 steps,
            s0 = (m-1)*step, q = 1/(2*step).  Envelope partials at the
            stationary point recorded by the forward (aux = D = s0 + t*):
            closed-form in q*t* and 1/D, no height re-reads."""
            qm = ids == 2 * m + 1
            if d2:
                q = inv_l0
                s0 = m.astype(jnp.float32) * step
                sm = s0 + 0.5 * step
                s2 = s0 + step
            else:
                q = inv_l1
                s0 = (m - 1).astype(jnp.float32) * step
                sm = s0 + step
                s2 = s0 + 2.0 * step
            ok = qm & (aux > 1e-3)
            if shadow:
                gq = jnp.where(ok, gv, 0.0)
                zc = gq * (-1.0 - aux * dmdz)
            else:
                inv_d = jnp.where(ok, 1.0 / jnp.where(ok, aux, 1.0), 0.0)
                gq = jnp.where(ok, gv, 0.0) * inv_d
                zc = -gq
            tt = aux - s0                           # t*
            qt = q * tt
            qt2 = qt * qt
            di, dj, fi, fj = geom(s0)
            scatter0(gq * (2.0 * qt2 - 3.0 * qt + 1.0), di, dj, fi, fj)
            di, dj, fi, fj = geom(sm)
            scatter0(gq * (4.0 * qt - 4.0 * qt2), di, dj, fi, fj)
            di, dj, fi, fj = geom(s2)
            scatter0(gq * (2.0 * qt2 - qt), di, dj, fi, fj)
            zc_ref[...] += zc

        # ---- d2 near field: per-id processing (midpoint samples sit off
        # the step lattice, so their scatters cannot merge; only nx~16
        # steps) ----
        for lo, hi in [(c, min(c + _BWD_DCH, nx))
                       for c in range(0, nx, _BWD_DCH)]:
            pres = jnp.any((ids >= 2 * lo) & (ids < 2 * hi))

            @pl.when(pres)
            def _(lo=lo, hi=hi):
                def body(m, carry):
                    @pl.when(jnp.any(ids == 2 * m))
                    def _():
                        point_bwd(m)

                    if "no_quad" not in _BWD_ABLATE:
                        @pl.when(jnp.any(ids == 2 * m + 1))
                        def _():
                            quad_bwd(m, True)
                    return carry
                lax.fori_loop(lo, hi, body, 0)

        # ---- d1 mid field: merged per-POSITION scatters.  The sample at
        # position q (distance (q+1)*step) receives the point winner 2q
        # plus one partial from each of the d1 quads m in {q, q+1, q+2}
        # (their samples are m-2, m-1, m) — all terms are elementwise in
        # (ids, gv, aux), so each position costs ONE scatter instead of
        # up to four. ----
        def d1_terms(q):
            s = (q + 1).astype(jnp.float32) * step
            pm_q = (ids == 2 * q) & (q >= nx)
            if shadow:
                coef = jnp.where(pm_q, gv, 0.0)
                zc = coef * (-1.0 - s * dmdz)
            else:
                coef = jnp.where(pm_q, gv, 0.0) * (1.0 / s)
                zc = -coef
            if "no_quad" not in _BWD_ABLATE:
                # off: which sample of quad m = q + (2 - off_idx)... per
                # contributing quad m, partial index = q - (m - 2)
                for off, kind in ((0, "chb"), (1, "cha"), (2, "ch1")):
                    mm = q + off
                    # mm < n_dense: beyond it, 2*mm+1 would collide with
                    # MIP point ids (they start at 2*n_dense)
                    qm = (ids == 2 * mm + 1) & (mm >= nx + 1) \
                        & (mm < n_dense) & (aux > 1e-3)
                    if shadow:
                        gq = jnp.where(qm, gv, 0.0)
                    else:
                        inv_d = jnp.where(
                            qm, 1.0 / jnp.where(qm, aux, 1.0), 0.0)
                        gq = jnp.where(qm, gv, 0.0) * inv_d
                    s0 = (mm - 1).astype(jnp.float32) * step
                    qt = inv_l1 * (aux - s0)
                    qt2 = qt * qt
                    if kind == "chb":
                        coef += gq * (2.0 * qt2 - qt)
                        # one z_org term per quad
                        zc += (gq * (-1.0 - aux * dmdz) if shadow
                               else -gq)
                    elif kind == "cha":
                        coef += gq * (4.0 * qt - 4.0 * qt2)
                    else:
                        coef += gq * (2.0 * qt2 - 3.0 * qt + 1.0)
            return coef, zc

        q_lo = max(nx - 2, 0)
        for lo, hi in [(c, min(c + _BWD_DCH, n_dense))
                       for c in range(q_lo, n_dense, _BWD_DCH)]:
            # ids touching positions [lo, hi): points 2q and quads
            # 2(q+off)+1 up to off=2
            pres = jnp.any((ids >= 2 * lo) & (ids < 2 * (hi + 2) + 2)
                           & (ids >= 2 * nx))

            @pl.when(pres | jnp.bool_("no_pres" in _BWD_ABLATE))
            def _(lo=lo, hi=hi):
                def body(q, carry):
                    rel = ids - 2 * q
                    pres_q = jnp.any((rel >= 0) & (rel <= 5)
                                     & (ids >= 2 * nx))

                    @pl.when(pres_q | jnp.bool_("no_pres" in _BWD_ABLATE))
                    def _():
                        coef, zc = d1_terms(q)
                        s = (q + 1).astype(jnp.float32) * step
                        di, dj, fi, fj = geom(s)
                        scatter0(coef, di, dj, fi, fj)
                        zc_ref[...] += zc
                    return carry
                lax.fori_loop(lo, hi, body, 0)

        # ---- mip phases: nearest-neighbour point winners ----
        # Strip-chunk ADJOINT (mirrors the forward's strip path): per-step
        # contributions scatter at FINE resolution into a strip-cotangent
        # scratch; one transposed one-hot matmul pair per chunk then
        # downsamples into the coarse window cotangent — the per-step
        # transpose matmuls (the bulk of the mip backward) amortise over
        # up to _STRIP_GK/k steps.  Levels too coarse for the strip
        # scratch use the per-step transpose path.
        for p in range(1, 1 if "no_mip" in _BWD_ABLATE
                       else len(phases_meta)):
            lvl, n_m, s_first, step_l = phases_meta[p]
            kpow = 2 ** lvl
            wpad = levels_meta[p][1]
            bias = kpow * 16384
            off_p = mip_id_off[p]
            pres_p = jnp.any((ids >= off_p) & (ids < off_p + n_m))

            def stw(s, p=p, kpow=kpow, wpad=wpad, bias=bias):
                ri = jnp.round(s * sh_i).astype(jnp.int32)
                rj = jnp.round(s * sh_j).astype(jnp.int32)
                c0i = a_base + ri
                c1j = b_base + rj
                st_i = lax.div(c0i + bias, kpow) - (bias // kpow) \
                    - lax.div(a_base, kpow) + wpad + deltas[p][0]
                st_j = lax.div(c1j + bias, kpow) - (bias // kpow) \
                    - lax.div(b_base, kpow) + wpad + deltas[p][1]
                return (st_i, st_j, lax.rem(c0i + bias, kpow),
                        lax.rem(c1j + bias, kpow))

            def s_of(m, s_first=s_first, step_l=step_l):
                return jnp.minimum(
                    s_first + m.astype(jnp.float32) * step_l, dist)

            if strip_ref is not None and kpow <= _STRIP_KMAX:
                g_n = max(1, _STRIP_GK // kpow)
                n_ch = (n_m + g_n - 1) // g_n
                u0 = t0 + (g_n + 1) * kpow
                u1 = t1 + (g_n + 1) * kpow + 1
                u0r = _round_up(u0, 8)
                u1r = _round_up(u1, 128)
                sg0 = _round_up(u0 // kpow + 2 + 7, 8)
                sg1 = _round_up(u1 // kpow + 2 + 127, 128)
                # transposed column-upsample: S^T[y, c] = (y // k == c)
                ys = jax.lax.broadcasted_iota(jnp.int32, (u1r, sg1), 0)
                cs = jax.lax.broadcasted_iota(jnp.int32, (u1r, sg1), 1)
                s_opg_t = (ys // kpow == cs).astype(jnp.float32)

                @pl.when(pres_p)
                def _(p=p, kpow=kpow, off_p=off_p, n_m=n_m, g_n=g_n,
                      n_ch=n_ch, u0r=u0r, u1r=u1r, sg0=sg0, sg1=sg1,
                      s_opg_t=s_opg_t, stw=stw, s_of=s_of):
                    def chunk(c, carry):
                        m_lo = c * g_n
                        m_hi = jnp.minimum(m_lo + g_n - 1, n_m - 1)
                        act = jnp.any((ids >= off_p + m_lo)
                                      & (ids <= off_p + m_hi))

                        @pl.when(act)
                        def _():
                            qa_i, qa_j, _, _ = stw(s_of(m_lo))
                            qb_i, qb_j, _, _ = stw(s_of(m_hi))
                            q0_i = jnp.minimum(qa_i, qb_i)
                            q0_j = jnp.minimum(qa_j, qb_j)
                            ia = pl.multiple_of((q0_i // 8) * 8, 8)
                            ja = pl.multiple_of((q0_j // 128) * 128, 128)
                            strip_ref[...] = jnp.zeros(
                                strip_ref.shape, jnp.float32)

                            def sbody(m, carry2):
                                @pl.when(jnp.any(ids == off_p + m))
                                def _():
                                    s = s_of(m)
                                    pm = ids == off_p + m
                                    if shadow:
                                        coef = jnp.where(pm, gv, 0.0)
                                        zc_ref[...] += coef \
                                            * (-1.0 - s * dmdz)
                                    else:
                                        coef = jnp.where(pm, gv, 0.0) \
                                            * (1.0 / s)
                                        zc_ref[...] += -coef
                                    si, sj, ai, aj = stw(s)
                                    di = ai + (si - q0_i) * kpow
                                    dj = aj + (sj - q0_j) * kpow
                                    # scatter into the strip at fine res
                                    ia2 = pl.multiple_of(
                                        (di // 8) * 8, 8)
                                    ja2 = pl.multiple_of(
                                        (dj // 128) * 128, 128)
                                    r = _round_up(t0 + 7, 8)
                                    cc = _round_up(t1 + 127, 128)
                                    slab = jnp.pad(
                                        coef, ((0, r - t0), (0, cc - t1)))
                                    slab = pltpu.roll(slab, di - ia2, 0)
                                    slab = pltpu.roll(slab, dj - ja2, 1)
                                    cur = strip_ref[pl.ds(ia2, r),
                                                    pl.ds(ja2, cc)]
                                    strip_ref[pl.ds(ia2, r),
                                              pl.ds(ja2, cc)] = cur + slab
                                return carry2
                            lax.fori_loop(m_lo, m_hi + 1, sbody, 0)

                            # chunk downsample: adjoint of
                            # strip = (R @ rollL(slab)) @ S
                            rows_cot = jnp.dot(
                                strip_ref[:u0r, :u1r], s_opg_t,
                                preferred_element_type=jnp.float32)
                            yy = jax.lax.broadcasted_iota(
                                jnp.int32, (sg0, u0r), 1)
                            cc2 = jax.lax.broadcasted_iota(
                                jnp.int32, (sg0, u0r), 0)
                            r_opg_t = (lax.div(yy, kpow) + (q0_i - ia)
                                       == cc2).astype(jnp.float32)
                            slab_cot = jnp.dot(
                                r_opg_t, rows_cot,
                                preferred_element_type=jnp.float32)
                            slab_cot = pltpu.roll(slab_cot, q0_j - ja, 1)
                            cur = wcot_refs[p][0, pl.ds(ia, sg0),
                                               pl.ds(ja, sg1)]
                            wcot_refs[p][0, pl.ds(ia, sg0),
                                         pl.ds(ja, sg1)] = cur + slab_cot
                        return carry
                    lax.fori_loop(0, n_ch, chunk, 0)
                continue

            sz0 = _round_up(t0 // kpow + 2 + 8, 8)
            sz1 = _round_up(t1 // kpow + 128 // kpow + 2 + 8, 128)
            t1_pad = _round_up(t1 + kpow + 1, 128)
            r8 = _round_up(sz0 + 7, 8)
            c128 = _round_up(sz1 + 127, 128)
            # transposed one-hot column-upsample: S^T[y, c] = (y//k == c)
            y_idx = jax.lax.broadcasted_iota(jnp.int32, (t1_pad, sz1), 0)
            c_idx = jax.lax.broadcasted_iota(jnp.int32, (t1_pad, sz1), 1)
            s_op_t = (y_idx // kpow == c_idx).astype(jnp.float32)

            @pl.when(pres_p)
            def _(p=p, kpow=kpow, sz1=sz1, t1_pad=t1_pad, r8=r8,
                  c128=c128, s_op_t=s_op_t, off_p=off_p, n_m=n_m,
                  stw=stw, s_of=s_of):
                def body(mm, carry):
                    @pl.when(jnp.any(ids == off_p + mm))
                    def _():
                        s = s_of(mm)
                        pm = ids == off_p + mm
                        if shadow:
                            coef = jnp.where(pm, gv, 0.0)
                            zc_ref[...] += coef * (-1.0 - s * dmdz)
                        else:
                            coef = jnp.where(pm, gv, 0.0) * (1.0 / s)
                            zc_ref[...] += -coef
                        start_i, start_j, al_i, al_j = stw(s)
                        ia = pl.multiple_of((start_i // 8) * 8, 8)
                        ja = pl.multiple_of((start_j // 128) * 128, 128)
                        # adjoint of: lane-shift-left by al_j of the
                        # column-upsampled rows, sliced to t1
                        up_cot = jnp.pad(coef, ((0, 0), (0, t1_pad - t1)))
                        up_cot = pltpu.roll(up_cot, al_j, 1)
                        rows_cot = jnp.dot(
                            up_cot, s_op_t,
                            preferred_element_type=jnp.float32)
                        # adjoint of the fused row upsample + alignment
                        # one-hot matmul (R^T)
                        yy = jax.lax.broadcasted_iota(
                            jnp.int32, (r8, t0), 1)
                        cc = jax.lax.broadcasted_iota(
                            jnp.int32, (r8, t0), 0)
                        r_op_t = (lax.div(yy + al_i, kpow)
                                  + (start_i - ia)
                                  == cc).astype(jnp.float32)
                        slab_cot = jnp.dot(
                            r_op_t, rows_cot,
                            preferred_element_type=jnp.float32)
                        # adjoint of the lane roll + sz1 slice of the
                        # aligned slab read
                        slab = jnp.pad(slab_cot,
                                       ((0, 0), (0, c128 - sz1)))
                        slab = pltpu.roll(slab, start_j - ja, 1)
                        cur = wcot_refs[p][0, pl.ds(ia, r8),
                                           pl.ds(ja, c128)]
                        wcot_refs[p][0, pl.ds(ia, r8),
                                     pl.ds(ja, c128)] = cur + slab
                    return carry
                lax.fori_loop(0, n_m, body, 0)

        zcot_ref[0, :, :] += zc_ref[...]
        return 0

    lax.fori_loop(0, a_chunk, azim_loop, 0)


def _overlap_add_level_cots(wcots, tmap_np, levels_meta, level_shapes,
                            off0, off1, t0, t1, s_row, s_col, origs=None):
    """Overlap-add per-tile window-cotangent blocks into full padded
    level arrays (shared backward-replay host assembly).  The window
    positions mirror the forward kernel's DMA source starts; ``origs``
    carries per-level traced slice origins under sharded assembly."""
    level_cots = []
    for p, m in enumerate(levels_meta):
        k = 2 ** m[0]
        orig_p = origs[p] if origs is not None else 0
        full = jnp.zeros(level_shapes[p], jnp.float32)
        for slot in range(tmap_np.shape[0]):
            a_base = off0 + s_row + int(tmap_np[slot, 0]) * t0
            b_base = off1 + s_col + int(tmap_np[slot, 1]) * t1
            src_i_al = ((a_base // k + 2 - orig_p) // 8) * 8
            src_j_al = ((b_base // k + 2) // 128) * 128
            full = lax.dynamic_update_slice(
                full,
                lax.dynamic_slice(
                    full, (src_i_al, src_j_al), (m[2], m[3]))
                + wcots[p][slot],
                (src_i_al, src_j_al))
        level_cots.append(full)
    return level_cots


def _overlap_add_inner_tiles(zcot_tiles, tmap_np, t0, t1, in0, in1):
    """Overlap-add per-tile inner-block cotangents into an (in0, in1)
    frame (shared backward-replay host assembly)."""
    zcot_full = jnp.zeros((in0, in1), jnp.float32)
    for slot in range(tmap_np.shape[0]):
        r0 = int(tmap_np[slot, 0]) * t0
        c0 = int(tmap_np[slot, 1]) * t1
        zcot_full = lax.dynamic_update_slice(
            zcot_full,
            lax.dynamic_slice(zcot_full, (r0, c0), (t0, t1))
            + zcot_tiles[slot],
            (r0, c0))
    return zcot_full


def backward_replay_fn(z_outer, graw, ids, aux, shard_off, *,
                       tile_map_static, levels_meta, phases_meta, pads,
                       tile, a_chunk, a_num, a_den, offset, inner_shape,
                       dx, dy, step, dist, near_ex, ray_org_elev,
                       interpret, pyramid=None, level_shapes=None,
                       inner_start=None, traced_assembly=False):
    """Unjitted winner-replay backward: Pallas kernel + host assembly.

    Returns the ``z_outer`` cotangent.  ``graw``/``ids``:
    (a_num, in0, in1) ratio cotangents and winner ids from the
    argmax-emitting forward.  ``a_num`` is the number of azimuth rows
    processed here (the local count under sharding); ``a_den`` the global
    azimuth count that sets the angle formula.

    ``traced_assembly``: honour ``shard_off`` (row/col shard starts and
    per-level slice origins) in the host-side window overlap-add — the
    sharded path, where those offsets are traced ``axis_index`` values.
    The default keeps the single-device assembly fully static.

    ``pyramid``/``level_shapes``: the multires composition — pre-built
    padded level arrays, or just their static shapes (the backward kernel
    re-reads no heights, so only shapes matter).  With either given, the
    function does NOT route through the plain-pyramid VJP; it returns
    ``(level_cots, zcot_inner)`` — the per-level window cotangents
    assembled into full level-array shape and the inner-block ``z_org``
    cotangent — for the caller to push through its own pyramid build.
    ``inner_start`` as in :func:`pallas_forward_fn`."""
    t0, t1 = tile
    in0, in1 = inner_shape
    off0, off1 = offset
    tmap_np = np.asarray(tile_map_static, dtype=np.int32).reshape(-1, 2)
    tile_map = jnp.asarray(tmap_np)
    return_cots = pyramid is not None or level_shapes is not None
    if pyramid is not None:
        level_shapes = tuple(a.shape for a in pyramid)
    elif level_shapes is None:
        padded = _padded_levels(z_outer, pads)
        level_shapes = tuple(a.shape for a in padded)

    n_soff = 4 + len(levels_meta)
    if shard_off.shape[0] < n_soff:
        shard_off = jnp.concatenate(
            [shard_off,
             jnp.zeros((n_soff - shard_off.shape[0],), jnp.int32)])
    if inner_start is None:
        inner_start = (off0 + shard_off[0], off1 + shard_off[1])
    z_inner = lax.dynamic_slice(z_outer, inner_start, (in0, in1))
    z_org = z_inner + jnp.float32(ray_org_elev)

    n_tiles = tile_map.shape[0]
    grid = (n_tiles, a_num // a_chunk)

    kernel = functools.partial(
        _bwd_kernel,
        levels_meta=levels_meta, phases_meta=phases_meta,
        tile=(t0, t1), a_chunk=a_chunk, a_num=a_num,
        off0=off0, off1=off1, dx=dx, dy=dy, step=step, dist=dist,
        near_exact=near_ex)

    # the SMEM table must cover every global azimuth index the kernel can
    # form: k_glob = shard_off[2] + local row < a_den under sharding, and
    # the padded rows [a_den, a_num) in the single-device azim-pad case
    azim32 = ((2.0 * np.pi) / a_den
              * np.arange(max(a_num, a_den))).astype(np.float32)
    trig = np.stack([np.sin(azim32.astype(np.float64)),
                     np.cos(azim32.astype(np.float64))],
                    axis=-1).astype(np.float32)

    tile_spec = pl.BlockSpec(
        (t0, t1), lambda ti, ak, tm, so: (tm[ti, 0], tm[ti, 1]),
        memory_space=pltpu.VMEM)
    ga_spec = pl.BlockSpec(
        (a_chunk, t0, t1), lambda ti, ak, tm, so: (ak, tm[ti, 0],
                                                   tm[ti, 1]),
        memory_space=pltpu.VMEM)
    in_specs = [tile_spec, ga_spec, ga_spec, ga_spec,
                pl.BlockSpec(memory_space=pltpu.SMEM)]
    out_specs = [pl.BlockSpec((1,) + (m[2], m[3]),
                              lambda ti, ak, tm, so: (ti, 0, 0),
                              memory_space=pltpu.VMEM)
                 for m in levels_meta]
    out_specs += [pl.BlockSpec((1, t0, t1),
                               lambda ti, ak, tm, so: (ti, 0, 0),
                               memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((n_tiles, m[2], m[3]), jnp.float32)
                 for m in levels_meta]
    out_shape += [jax.ShapeDtypeStruct((n_tiles, t0, t1), jnp.float32)]
    scratch_shapes = [
        pltpu.VMEM((t0, t1), jnp.float32),
    ]
    strip_shape = _strip_scratch_shape(levels_meta, (t0, t1))
    if strip_shape is not None:
        scratch_shapes = scratch_shapes + [
            pltpu.VMEM(strip_shape, jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes)
    # scoped-VMEM budget modelled on the backward's actual residents:
    # the per-level window-cotangent out blocks, the g/id/aux/z_org in
    # blocks, and roll-slab headroom
    wcot_bytes = sum(m[2] * m[3] for m in levels_meta) * 4
    blk_bytes = 2 * (3 * a_chunk + 3) * t0 * t1 * 4
    slab_bytes = (t0 + 16) * (t1 + 256) * 4
    vlim = min(int(2 * wcot_bytes + blk_bytes
                   + 8 * slab_bytes + (8 << 20)), 100 << 20)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vlim),
        interpret=interpret,
    )(tile_map, shard_off, z_org, graw, ids, aux, jnp.asarray(trig))
    wcots = outs[:len(levels_meta)]
    zcot_tiles = outs[len(levels_meta)]

    # ---- host assembly: overlap-add per-tile window blocks into full
    # padded level arrays, then route through the pyramid-build VJP ----
    # Under sharding (traced_assembly) the window positions carry the
    # shard's traced row/col start and per-level slice origin, exactly as
    # the kernel's DMA source starts did; single-device assembly stays
    # fully static (shard_off is all-zero there).
    s_row = shard_off[0] if traced_assembly else 0
    s_col = shard_off[1] if traced_assembly else 0
    origs = ([shard_off[4 + p] for p in range(len(levels_meta))]
             if traced_assembly else None)
    level_cots = _overlap_add_level_cots(
        wcots, tmap_np, levels_meta, level_shapes, off0, off1, t0, t1,
        s_row, s_col, origs)

    # z_org cotangent over the inner block: z_org = z[inner slice] + const
    zcot_full = _overlap_add_inner_tiles(zcot_tiles, tmap_np, t0, t1,
                                         in0, in1)

    if return_cots:
        return tuple(level_cots), zcot_full

    def pyr_fn(z):
        return tuple(_padded_levels(z, pads))

    _, vjp_pyr = jax.vjp(pyr_fn, z_outer)
    (dz,) = vjp_pyr(tuple(level_cots))
    dz = lax.dynamic_update_slice(
        dz,
        lax.dynamic_slice(dz, inner_start, (in0, in1)) + zcot_full,
        inner_start)
    return dz


#: Jitted entry for :func:`backward_replay_fn`.
_bwd_core = functools.partial(
    jax.jit,
    static_argnames=("tile_map_static", "levels_meta", "phases_meta",
                     "pads", "tile", "a_chunk", "a_num", "a_den",
                     "offset", "inner_shape", "dx", "dy", "step", "dist",
                     "near_ex", "ray_org_elev", "interpret",
                     "level_shapes", "traced_assembly"))(backward_replay_fn)


def shadow_backward_replay_fn(z_outer, z_org_r, gmet, ids, aux, sun_table,
                              *, tile_map_static, levels_meta, phases_meta,
                              pads, tile, t_chunk, num_sun, offset,
                              inner_shape, dx, dy, step, dist, near_ex,
                              grid_origin, interpret, shard_off=None,
                              traced_assembly=False):
    """Winner-replay backward for the shadow clearance metric.

    ``gmet``/``ids``/``aux``: (num_sun, in0, in1) metric cotangents and
    the argmax-emitting shadow forward's winner/denominator maps.
    Returns ``(dz_outer, dz_org_r)`` — the heightfield cotangent (window
    scatters routed through the pyramid-build VJP) and the ray-origin
    cotangent (the ``-1 - S*dm/dz_org`` terms; the caller chains it to
    its lattice heights)."""
    t0, t1 = tile
    in0, in1 = inner_shape
    off0, off1 = offset
    tmap_np = np.asarray(tile_map_static, dtype=np.int32).reshape(-1, 2)
    tile_map = jnp.asarray(tmap_np)
    padded = _padded_levels(z_outer, pads)
    if shard_off is None:
        shard_off = jnp.zeros((4 + len(levels_meta),), jnp.int32)
    elif shard_off.shape[0] < 4 + len(levels_meta):
        shard_off = jnp.concatenate(
            [shard_off, jnp.zeros((4 + len(levels_meta)
                                   - shard_off.shape[0],), jnp.int32)])

    grid = (tile_map.shape[0], num_sun // t_chunk)
    kernel = functools.partial(
        _bwd_kernel,
        levels_meta=levels_meta, phases_meta=phases_meta,
        tile=(t0, t1), a_chunk=t_chunk, a_num=num_sun,
        off0=off0, off1=off1, dx=dx, dy=dy, step=step, dist=dist,
        near_exact=near_ex, mode="shadow", grid_origin=grid_origin)

    tile_spec = pl.BlockSpec(
        (t0, t1), lambda ti, tk, tm, so: (tm[ti, 0], tm[ti, 1]),
        memory_space=pltpu.VMEM)
    ga_spec = pl.BlockSpec(
        (t_chunk, t0, t1), lambda ti, tk, tm, so: (tk, tm[ti, 0],
                                                   tm[ti, 1]),
        memory_space=pltpu.VMEM)
    sun_spec = pl.BlockSpec((t_chunk, 8), lambda ti, tk, tm, so: (tk, 0),
                            memory_space=pltpu.SMEM)
    in_specs = [tile_spec, ga_spec, ga_spec, ga_spec, sun_spec]
    out_specs = [pl.BlockSpec((1,) + (m[2], m[3]),
                              lambda ti, tk, tm, so: (ti, 0, 0),
                              memory_space=pltpu.VMEM)
                 for m in levels_meta]
    out_specs += [pl.BlockSpec((1, t0, t1),
                               lambda ti, tk, tm, so: (ti, 0, 0),
                               memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((grid[0], m[2], m[3]), jnp.float32)
                 for m in levels_meta]
    out_shape += [jax.ShapeDtypeStruct((grid[0], t0, t1), jnp.float32)]
    scratch_shapes = [pltpu.VMEM((t0, t1), jnp.float32)]
    strip_shape = _strip_scratch_shape(levels_meta, (t0, t1))
    if strip_shape is not None:
        scratch_shapes = scratch_shapes + [
            pltpu.VMEM(strip_shape, jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes)
    wcot_bytes = sum(m[2] * m[3] for m in levels_meta) * 4
    blk_bytes = 2 * (3 * t_chunk + 3) * t0 * t1 * 4
    slab_bytes = (t0 + 16) * (t1 + 256) * 4
    vlim = min(int(2 * wcot_bytes + blk_bytes
                   + 8 * slab_bytes + (8 << 20)), 100 << 20)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vlim),
        interpret=interpret,
    )(tile_map, shard_off, z_org_r, gmet, ids, aux,
      jnp.asarray(sun_table))
    wcots = outs[:len(levels_meta)]
    zcot_tiles = outs[len(levels_meta)]

    s_row = shard_off[0] if traced_assembly else 0
    s_col = shard_off[1] if traced_assembly else 0
    level_cots = _overlap_add_level_cots(
        wcots, tmap_np, levels_meta, [a.shape for a in padded],
        off0, off1, t0, t1, s_row, s_col)

    def pyr_fn(z):
        return tuple(_padded_levels(z, pads))

    _, vjp_pyr = jax.vjp(pyr_fn, z_outer)
    (dz,) = vjp_pyr(tuple(level_cots))

    dzorg = _overlap_add_inner_tiles(zcot_tiles, tmap_np, t0, t1,
                                     in0, in1)
    return dz, dzorg


#: Jitted entry for :func:`shadow_backward_replay_fn`.
_shadow_bwd_core = functools.partial(
    jax.jit,
    static_argnames=("tile_map_static", "levels_meta", "phases_meta",
                     "pads", "tile", "t_chunk", "num_sun", "offset",
                     "inner_shape", "dx", "dy", "step", "dist", "near_ex",
                     "grid_origin", "interpret",
                     "traced_assembly"))(shadow_backward_replay_fn)


#: Hashable static config of one differentiable Pallas shadow-metric
#: invocation (see :func:`shadow_metric_pallas_diff`).
_ShadCfg = collections.namedtuple("_ShadCfg", [
    "levels_meta", "phases_meta", "pads", "tile", "t_chunk", "num_sun",
    "t_pad", "offset", "inner_shape", "dx", "dy", "step", "dist",
    "near_ex", "n_safe", "grid_origin", "tile_map", "interpret"])


def shadow_metric_pallas_diff(z_outer, z_org_r, z_inner_r, sun_table, *,
                              schedule, offset, inner_shape, dx, dy,
                              grid_origin, tile=(128, 256), t_chunk=None,
                              interpret=False):
    """Differentiable batched shadow occlusion metric (fused Pallas).

    Same value as :func:`shadow_metric_pallas` with
    ``exact_metric=True``; additionally differentiable w.r.t. ``z_outer``
    and ``z_org_r`` via a winner-replay custom VJP (the argmax-emitting
    shadow forward + :func:`shadow_backward_replay_fn`).  ``z_inner_r``
    receives a zero explicit cotangent: the first marching step's history
    partial is attributed to the level-0 heightfield window at arc
    distance 0, which reads the same cells — exact whenever
    ``z_inner_r`` is (a padded copy of) the corresponding ``z_outer``
    slice, as in every caller (:class:`horayzon_tpu.shadow.Terrain`).
    Gradients w.r.t. sun positions are not propagated (zero cotangent).
    """
    z_outer = jnp.asarray(z_outer, dtype=jnp.float32)
    sun_table = np.asarray(sun_table, dtype=np.float32)
    num_sun = sun_table.shape[0]
    in0, in1 = inner_shape
    t0, t1 = tile
    t0 = min(t0, in0)
    t1 = min(t1, in1)
    if in0 % t0 or in1 % t1:
        raise ValueError(f"inner_shape {inner_shape} must be divisible by "
                         f"tile {(t0, t1)}")
    if t_chunk is None:
        t_chunk = min(num_sun, 8)
    t_pad = ((num_sun + t_chunk - 1) // t_chunk) * t_chunk
    if t_pad != num_sun:
        sun_table = np.concatenate(
            [sun_table, np.repeat(sun_table[-1:], t_pad - num_sun, 0)], 0)
    tmap = tile_schedule((in0, in1), (t0, t1))
    levels_meta, phases_meta = _build_metas(schedule, t0, t1, schedule.step)
    off0, off1 = offset
    h_out, w_out = z_outer.shape
    halo_cells = min(off0, off1, h_out - off0 - in0, w_out - off1 - in1)
    near_ex = (schedule.phases[0].num
               if schedule.phases[0].kind == "d2" else 0)
    cfg = _ShadCfg(
        levels_meta=tuple(levels_meta), phases_meta=tuple(phases_meta),
        pads=schedule.pads, tile=(t0, t1), t_chunk=t_chunk,
        num_sun=int(num_sun), t_pad=int(t_pad),
        offset=(int(off0), int(off1)), inner_shape=(int(in0), int(in1)),
        dx=float(dx), dy=float(dy), step=float(schedule.step),
        dist=float(schedule.dist), near_ex=near_ex,
        n_safe=max(0, halo_cells - 2),
        grid_origin=(float(grid_origin[0]), float(grid_origin[1])),
        tile_map=tuple(map(tuple, tmap.tolist())),
        interpret=bool(interpret))
    return _shadow_diff(cfg, z_outer,
                        jnp.asarray(z_org_r, dtype=jnp.float32),
                        jnp.asarray(z_inner_r, dtype=jnp.float32),
                        jnp.asarray(sun_table))


def _shadow_diff_fwd_value(cfg, z_outer, z_org_r, z_inner_r, sun_table,
                           emit_argmax=False):
    tmap = jnp.asarray(np.asarray(cfg.tile_map, np.int32).reshape(-1, 2))
    out = _shadow_core(
        z_outer, z_org_r, z_inner_r, sun_table, tmap,
        jnp.zeros((4,), dtype=jnp.int32),
        levels_meta=cfg.levels_meta, phases_meta=cfg.phases_meta,
        pads=cfg.pads, tile=cfg.tile, t_chunk=cfg.t_chunk,
        offset=cfg.offset, inner_shape=cfg.inner_shape,
        dx=cfg.dx, dy=cfg.dy, step=cfg.step, dist=cfg.dist,
        near_ex=cfg.near_ex, n_safe=cfg.n_safe,
        grid_origin=cfg.grid_origin, interpret=cfg.interpret,
        exact_metric=True, emit_argmax=emit_argmax)
    if emit_argmax:
        return out
    return out[:cfg.num_sun]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _shadow_diff(cfg, z_outer, z_org_r, z_inner_r, sun_table):
    return _shadow_diff_fwd_value(cfg, z_outer, z_org_r, z_inner_r,
                                  sun_table)


def _shadow_diff_fwd(cfg, z_outer, z_org_r, z_inner_r, sun_table):
    met, ids, aux = _shadow_diff_fwd_value(
        cfg, z_outer, z_org_r, z_inner_r, sun_table, emit_argmax=True)
    return met[:cfg.num_sun], (z_outer, z_org_r, z_inner_r, sun_table,
                               ids, aux)


def _shadow_diff_bwd(cfg, residuals, g):
    z_outer, z_org_r, z_inner_r, sun_table, ids, aux = residuals
    if cfg.t_pad > cfg.num_sun:
        g = jnp.pad(g, ((0, cfg.t_pad - cfg.num_sun), (0, 0), (0, 0)))
    in0, in1 = cfg.inner_shape
    bt0, bt1 = _bwd_tile_for(cfg.inner_shape, cfg.tile)
    lm_b, pm_b = _metas_for_tile(cfg.pads, cfg.phases_meta, bt0, bt1)
    tmap_b = tuple(map(tuple, tile_schedule((in0, in1),
                                            (bt0, bt1)).tolist()))
    t_chunk_b = cfg.t_chunk
    dz, dzorg = _shadow_bwd_core(
        z_outer, z_org_r, g, ids, aux, sun_table,
        tile_map_static=tmap_b, levels_meta=tuple(lm_b),
        phases_meta=tuple(pm_b), pads=cfg.pads, tile=(bt0, bt1),
        t_chunk=t_chunk_b, num_sun=cfg.t_pad, offset=cfg.offset,
        inner_shape=cfg.inner_shape, dx=cfg.dx, dy=cfg.dy, step=cfg.step,
        dist=cfg.dist, near_ex=cfg.near_ex, grid_origin=cfg.grid_origin,
        interpret=cfg.interpret)
    return (dz, dzorg, jnp.zeros_like(z_inner_r),
            jnp.zeros_like(sun_table))


_shadow_diff.defvjp(_shadow_diff_fwd, _shadow_diff_bwd)


def _bwd_tile_for(inner_shape, tile):
    """Backward kernel tile: narrower than the forward tile — per-azimuth
    winner ids concentrate on few ridges, so smaller tiles turn more
    step-presence tests false (each active step pays the full scatter
    machinery) and shrink the scatter slabs.  Round-5 sweep of the
    read-free replay at the bench shape (one v5e chip, value_and_grad
    total): (128,256) 313 ms, (256,128) 313, (128,128) 319, (256,256)
    323, (64,256) 333, (128,512) 339, (64,128) 342, (64,512) 349 —
    narrow LANES pay off (smaller scatter slabs), thin rows do not (the
    round-4 (64,512) choice predated the read-free backward).  Must
    divide the padded inner shape (the per-shard one under sharding)."""
    in0, in1 = inner_shape
    t0, t1 = tile
    bt0 = t0
    for c in (128, 64):
        if in0 % c == 0 and c <= in0:
            bt0 = c
            break
    bt1 = t1
    for c in (256, 512):
        if in1 % c == 0 and c <= t1:
            bt1 = c
            break
    return bt0, bt1


def _bwd_tile(cfg):
    return _bwd_tile_for(cfg.inner_shape, cfg.tile)


def _hz_bwd_replay(cfg, z_outer, tilt_ramp, raw, ids, aux, g):
    """Chain the output cotangent through clip/arctan, split the tilt-ramp
    term, and run the winner-replay backward kernel."""
    graw = jnp.moveaxis(g, -1, 0)
    th = jnp.arctan(raw)
    lo = math.radians(cfg.elev_lims[0])
    hi = math.radians(cfg.elev_lims[1])
    inside = (th >= lo) & (th <= hi)
    graw = jnp.where(inside, graw, 0.0) / (1.0 + raw * raw)
    if cfg.azim_pad > cfg.azim_num:
        graw = jnp.pad(graw, ((0, cfg.azim_pad - cfg.azim_num),
                              (0, 0), (0, 0)))
    dr = None
    if tilt_ramp is not None:
        azim32 = ((2.0 * np.pi) / cfg.azim_num
                  * np.arange(cfg.azim_num)).astype(np.float32)
        sin_t = jnp.asarray(np.sin(azim32.astype(np.float64)),
                            dtype=jnp.float32)
        cos_t = jnp.asarray(np.cos(azim32.astype(np.float64)),
                            dtype=jnp.float32)
        dr = (jnp.einsum("aij,a->ij", graw, sin_t),
              jnp.einsum("aij,a->ij", graw, cos_t))
    soff = jnp.zeros((4,), dtype=jnp.int32)
    # Re-tile for the backward: rebuild the level metadata and a full
    # tile map at the (smaller) backward tile.
    bt0, bt1 = _bwd_tile(cfg)
    schedule = _sweep.build_schedule(cfg.step, cfg.dist, cfg.rel_err,
                                     max_level=cfg.max_level)
    lm_b, pm_b = _build_metas(schedule, bt0, bt1, cfg.step)
    in0, in1 = cfg.inner_shape
    tmap_b = tuple(map(tuple, tile_schedule(
        (in0, in1), (bt0, bt1)).tolist()))
    budget = max(1, (1 << 20) // (bt0 * bt1 * 4))
    a_chunk_b = min(budget, cfg.azim_pad)
    while cfg.azim_pad % a_chunk_b:
        a_chunk_b -= 1
    dz = _bwd_core(
        z_outer, graw, ids, aux, soff, tile_map_static=tmap_b,
        levels_meta=tuple(lm_b), phases_meta=tuple(pm_b),
        pads=cfg.pads, tile=(bt0, bt1), a_chunk=a_chunk_b,
        a_num=cfg.azim_pad, a_den=cfg.azim_num, offset=cfg.offset,
        inner_shape=cfg.inner_shape, dx=cfg.dx, dy=cfg.dy, step=cfg.step,
        dist=cfg.dist, near_ex=cfg.near_ex,
        ray_org_elev=cfg.ray_org_elev, interpret=cfg.interpret)
    return dz, dr


def shadow_sun_table(sun_positions, center, dx, dy):
    """Host-side per-sun table for :func:`shadow_metric_pallas`.

    Rows: sun_x, sun_y, sun_z, kx_u, ky_u, ui, uj, 0 — the unit horizontal
    direction toward the sun (from the domain centre, mirroring
    shadow.py::_sun_step) and the marching shifts in grid cells per metre.
    Returns (table (T, 8) float32, near_vertical (T,) bool).
    """
    sp = np.atleast_2d(np.asarray(sun_positions, dtype=np.float64))
    kx = sp[:, 0] - center[0]
    ky = sp[:, 1] - center[1]
    k_norm = np.hypot(kx, ky)
    near_vertical = k_norm < 1.0e-6
    kx_u = np.where(near_vertical, 1.0, kx / np.maximum(k_norm, 1e-6))
    ky_u = np.where(near_vertical, 0.0, ky / np.maximum(k_norm, 1e-6))
    table = np.zeros((sp.shape[0], 8), dtype=np.float32)
    table[:, 0:3] = sp
    table[:, 3] = kx_u
    table[:, 4] = ky_u
    table[:, 5] = ky_u / dy   # ui: row cells per metre
    table[:, 6] = kx_u / dx   # uj
    return table, near_vertical


def shadow_metric_pallas(z_outer, z_org_r, z_inner_r, sun_table, *,
                         schedule, offset, inner_shape, dx, dy,
                         grid_origin, tile=(128, 256), t_chunk=None,
                         mask=None, interpret=False,
                         pyramid=None, pooled=None, exact_metric=True):
    """Batched shadow occlusion metric via the fused Pallas kernel.

    Returns (T, in0, in1) float32: max over the sun ray of
    ``h(s) - (z_org + s * m_slope)`` (> 0 means terrain-occluded),
    matching :func:`horayzon_tpu.ops.sweep.shadow_metric` semantics with
    per-cell ray slopes computed in-kernel from the sun coordinates.

    ``mask``: optional (in0, in1) uint8/bool; fully masked tiles are
    skipped (their output cells hold unspecified values — callers encode
    masked cells separately, as :class:`horayzon_tpu.shadow.Terrain` does).
    """
    z_outer = jnp.asarray(z_outer, dtype=jnp.float32)
    sun_table = np.asarray(sun_table, dtype=np.float32)
    num_sun = sun_table.shape[0]
    in0, in1 = inner_shape
    t0, t1 = tile
    t0 = min(t0, in0)
    t1 = min(t1, in1)
    if in0 % t0 or in1 % t1:
        raise ValueError(f"inner_shape {inner_shape} must be divisible by "
                         f"tile {(t0, t1)}")
    if t_chunk is None:
        t_chunk = min(num_sun, 8)
    # pad the sun axis to a chunk multiple (extra rows are computed and
    # discarded)
    t_pad = ((num_sun + t_chunk - 1) // t_chunk) * t_chunk
    if t_pad != num_sun:
        sun_table = np.concatenate(
            [sun_table, np.repeat(sun_table[-1:], t_pad - num_sun, 0)], 0)

    tmap = tile_schedule((in0, in1), (t0, t1), mask)
    if tmap.shape[0] == 0:
        return jnp.full((num_sun, in0, in1), jnp.float32(_NEG_INIT))

    levels_meta, phases_meta = _build_metas(schedule, t0, t1, schedule.step)
    off0, off1 = offset
    h_out, w_out = z_outer.shape
    halo_cells = min(off0, off1, h_out - off0 - in0, w_out - off1 - in1)
    near_ex = (schedule.phases[0].num
               if schedule.phases[0].kind == "d2" else 0)

    out = _shadow_core(
        z_outer, jnp.asarray(z_org_r, dtype=jnp.float32),
        jnp.asarray(z_inner_r, dtype=jnp.float32),
        jnp.asarray(sun_table), jnp.asarray(tmap),
        jnp.zeros((4,), dtype=jnp.int32),
        levels_meta=tuple(levels_meta), phases_meta=tuple(phases_meta),
        pads=schedule.pads, tile=(t0, t1), t_chunk=t_chunk,
        offset=(off0, off1), inner_shape=(in0, in1),
        dx=float(dx), dy=float(dy), step=float(schedule.step),
        dist=float(schedule.dist), near_ex=near_ex,
        n_safe=max(0, halo_cells - 2),
        grid_origin=(float(grid_origin[0]), float(grid_origin[1])),
        interpret=interpret, exact_metric=bool(exact_metric),
        pyramid=None if pyramid is None else tuple(pyramid),
        pooled=None if pooled is None else tuple(pooled))
    return out[:num_sun]


def shadow_forward_fn(z_outer, z_org_r, z_inner_r, sun_table, tile_map,
                      shard_off, *, levels_meta, phases_meta, pads, tile,
                      t_chunk, offset, inner_shape, dx, dy, step, dist,
                      near_ex, n_safe, grid_origin, interpret,
                      pyramid=None, pooled=None, exact_metric=True,
                      emit_argmax=False):
    """Unjitted fused shadow forward: pyramid + padding + Pallas kernel.

    Safe to embed in ``shard_map``; ``tile_map``/``shard_off`` as in
    :func:`pallas_forward_fn` (shard_off[2] is unused — the sun axis is
    never sharded inside one call).  ``pyramid``/``pooled``: optional
    pre-built padded levels and their 8x8-pooled companions (from
    :func:`build_padded_pyramid`) so initialise-once callers skip the
    per-query rebuild.  ``emit_argmax``: gradient-path forward — also
    return the per-(sun, cell) winner-id and stationary-denominator maps
    for the shadow winner-replay backward (requires
    ``exact_metric=True``: sign-exact skips may drop the true winner)."""
    t0, t1 = tile
    in0, in1 = inner_shape
    off0, off1 = offset
    num_sun = sun_table.shape[0]
    if emit_argmax and not exact_metric:
        raise ValueError("emit_argmax requires exact_metric=True")

    if pyramid is None:
        padded, pooled = build_padded_pyramid(z_outer, pads, levels_meta)
    else:
        padded = list(pyramid)
        if pooled is None:
            pooled = _pool8(padded, levels_meta)
        else:
            pooled = list(pooled)

    n_soff = 4 + len(levels_meta)
    if shard_off.shape[0] < n_soff:
        shard_off = jnp.concatenate(
            [shard_off,
             jnp.zeros((n_soff - shard_off.shape[0],), jnp.int32)])

    grid = (tile_map.shape[0], num_sun // t_chunk)

    kernel = functools.partial(
        _kernel,
        levels_meta=levels_meta, phases_meta=phases_meta,
        tile=(t0, t1), a_chunk=t_chunk, a_num=num_sun,
        off0=off0, off1=off1, outer_shape=tuple(z_outer.shape),
        dx=dx, dy=dy, step=step, dist=dist,
        near_exact=near_ex, n_safe=n_safe, mode="shadow",
        grid_origin=grid_origin, exact_metric=exact_metric,
        emit_argmax=emit_argmax)

    tile_spec = pl.BlockSpec(
        (t0, t1), lambda ti, tk, tm, so: (tm[ti, 0], tm[ti, 1]),
        memory_space=pltpu.VMEM)
    in_specs = [
        tile_spec,                                                 # z_org_r
        tile_spec,                                                 # z_inner_r
        pl.BlockSpec((t_chunk, 8), lambda ti, tk, tm, so: (tk, 0),
                     memory_space=pltpu.SMEM),                     # sun table
    ] + [pl.BlockSpec(memory_space=pl.ANY)
         for _ in range(2 * len(levels_meta))]

    scratch_shapes = (
        [pltpu.VMEM((m[2], m[3]), padded[p].dtype)
         for p, m in enumerate(levels_meta)]
        + [pltpu.VMEM((m[4], m[5]), jnp.float32) for m in levels_meta]
        + [pltpu.SMEM((len(levels_meta) + 1,), jnp.float32),
           pltpu.SemaphoreType.DMA((2 * len(levels_meta),))])
    strip_shape = _strip_scratch_shape(levels_meta, (t0, t1))
    if strip_shape is not None:
        scratch_shapes = scratch_shapes + [
            pltpu.VMEM(strip_shape, jnp.float32)]

    out_spec = pl.BlockSpec(
        (t_chunk, t0, t1),
        lambda ti, tk, tm, so: (tk, tm[ti, 0], tm[ti, 1]),
        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((num_sun, in0, in1), jnp.float32)
    out_specs = out_spec
    if emit_argmax:
        out_specs = [out_spec, out_spec, out_spec]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((num_sun, in0, in1), jnp.int32),
                     jax.ShapeDtypeStruct((num_sun, in0, in1),
                                          jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(
                levels_meta, t0, t1, t_chunk,
                n_out=3 if emit_argmax else 1)),
        interpret=interpret,
    )(tile_map, shard_off, z_org_r, z_inner_r, sun_table, *padded, *pooled)


#: Jitted entry for :func:`shadow_forward_fn`.
_shadow_core = functools.partial(
    jax.jit,
    static_argnames=("levels_meta", "phases_meta", "pads", "tile",
                     "t_chunk", "offset", "inner_shape", "dx", "dy", "step",
                     "dist", "near_ex", "n_safe", "grid_origin",
                     "interpret", "exact_metric",
                     "emit_argmax"))(shadow_forward_fn)
