#!/usr/bin/env python
# Copyright (c) 2026
# MIT License
"""Benchmark: gridded-DEM horizon sweep (32 azimuths) on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Metric accounting
-----------------
The reference's own instrumentation counts *rays shot* and averages
~2 rays/(cell, azimuth) with its guess_constant warm start
(horizon_comp.cpp:807-810).  To compare end-to-end throughput on identical
work, we report "reference-equivalent rays/s":

    rays = num_cells * azim_num * 2.0 ;  rays/s = rays / wall_time

i.e. the rate at which the chip produces the same horizon output that Embree
produces with ~2 rays per (cell, azimuth).  ``samples_per_s`` (heightfield
reads/s of the sweep itself) is also reported for kernel-level analysis.

Baselines (both are always reported; see BASELINE.md for methodology)
----------------------------------------------------------------------
``vs_baseline`` / ``vs_assumed_embree``: the reference repo publishes no
numbers, so this is an *assumed* strong-workstation Embree+TBB CPU at
20 M rays/s (O(1-5) M rays/s/core x ~8-16 cores).  The BASELINE.json
target of ">= 10x Embree-CPU" corresponds to vs_baseline >= 10.

``vs_measured_bvh_cpu``: measured on THIS machine — a native BVH
occlusion tracer (``native/bvhbase.cpp``) runs the reference's
warm-started horizon search (same ray accounting as
horizon_comp.cpp:384-496) on a subdomain of the bench terrain; the ratio
is (estimated full-domain BVH wall time) / (TPU wall time).  The tracer
is scalar (no SIMD packets), so multiply by ~1.5-3x for true Embree on
the same cores.
"""

import argparse
import json
import time

import numpy as np

ASSUMED_EMBREE_CPU_RAYS_PER_S = 20.0e6
REF_RAYS_PER_CELL_AZIM = 2.0


def make_terrain(h, w, seed=0, dx=25.0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    z = np.zeros((h, w), dtype=np.float64)
    for _ in range(24):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        sig = rng.uniform(6.0, h / 6.0)
        z += rng.uniform(100, 800) * np.exp(
            -(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig ** 2)))
    return z.astype(np.float32)


def curved_masked_row(result, args, time_run, jnp):
    """Curved ocean-masked benchmark (see the call site in main)."""
    from horayzon_tpu import direction, regrid, transform
    from horayzon_tpu import horizon as _hzmod
    from horayzon_tpu.ops import pallas_sweep

    nC, dlatC = 1024, 0.000833
    lat0, lon0 = 45.0, 7.0
    lat = lat0 + (np.arange(nC)[::-1] - nC / 2) * dlatC
    lon = lon0 + (np.arange(nC) - nC / 2) * dlatC
    lon2, lat2 = np.meshgrid(lon, lat)
    rng = np.random.default_rng(6)
    elev = np.zeros_like(lon2)
    for _ in range(24):
        clon = rng.uniform(lon.min(), lon.max())
        clat = rng.uniform(lat.min(), lat.max())
        sig = rng.uniform(0.01, 0.1)
        elev += rng.uniform(200, 1400) * np.exp(
            -(((lon2 - clon) ** 2 + (lat2 - clat) ** 2) / (2 * sig ** 2)))
    elev = elev.astype(np.float32)
    trans = transform.TransformerEcef2enu(lon0, lat0, "sphere")
    xe, ye, ze = transform.lonlat2ecef(lon2, lat2, elev, "sphere")
    x, y, z = transform.ecef2enu(xe, ye, ze, trans)
    vn_ecef = direction.surf_norm(lon2, lat2)
    vec_norm = transform.ecef2enu_vector(vn_ecef, trans)
    pg = regrid.planarize(x, y, z)
    hr, wr = pg.grid.shape

    inC, offC = 512, 256
    x_in = x[offC:offC + inC, offC:offC + inC]
    y_in = y[offC:offC + inC, offC:offC + inC]
    fi_in, fj_in = pg.to_regular_indices(x_in, y_in)
    # South Georgia-shaped island (~8% considered)
    yyc, xxc = np.mgrid[0:inC, 0:inC]
    msk = ((((yyc - inC * 0.5) / (inC * 0.22)) ** 2
            + ((xxc - inC * 0.5) / (inC * 0.11)) ** 2) <= 1.0) \
        .astype(np.uint8)

    def lattice_box(fi_b, fj_b):
        i_lo = max(int(np.floor(fi_b.min())) - 1, 0)
        i_hi = min(int(np.ceil(fi_b.max())) + 2, hr)
        j_lo = max(int(np.floor(fj_b.min())) - 1, 0)
        j_hi = min(int(np.ceil(fj_b.max())) + 2, wr)
        return i_lo, i_hi, j_lo, j_hi

    # ramps at lattice cells (the _curved_gridded tilt-ramp fields)
    def ramps(i_lo, i_hi, j_lo, j_hi):
        fi_src = np.clip(pg.fi[i_lo:i_hi, j_lo:j_hi] - offC, 0.0,
                         inC - 1.0)
        fj_src = np.clip(pg.fj[i_lo:i_hi, j_lo:j_hi] - offC, 0.0,
                         inC - 1.0)
        nr = regrid._bilinear(
            vec_norm[offC:offC + inC, offC:offC + inC]
            .astype(np.float64), fi_src, fj_src)
        nr /= np.linalg.norm(nr, axis=-1, keepdims=True)
        return ((nr[..., 0] / nr[..., 2]).astype(np.float32),
                (nr[..., 1] / nr[..., 2]).astype(np.float32))

    z_lat = jnp.asarray(pg.z)
    dist_m = args.dist * 1000.0 / 2.0      # 10 km on the curved scene
    kwc = dict(dx=pg.grid.dx, dy=pg.grid.dy, dist_search=dist_m,
               hori_acc=args.acc, azim_num=args.azim)

    # dense curved run over the full inner lattice box.  If right/down
    # padding to tile multiples overruns the lattice, shift the window
    # start left/up instead (the box start is a lower bound, not exact).
    i_lo, i_hi, j_lo, j_hi = lattice_box(fi_in, fj_in)
    rin0, rin1 = i_hi - i_lo, j_hi - j_lo
    pl = _hzmod._pallas_padded_shape((hr, wr), (i_lo, j_lo), (rin0, rin1))
    if pl is None:
        def up(x, m):
            return ((x + m - 1) // m) * m
        t0d = 128 if rin0 >= 128 else up(rin0, 8)
        t1d = 256 if rin1 >= 256 else up(rin1, 128)
        p0d, p1d = up(rin0, t0d), up(rin1, t1d)
        if p0d > hr or p1d > wr:
            raise ValueError("lattice too small for tile padding")
        i_lo = min(i_lo, hr - p0d)
        j_lo = min(j_lo, wr - p1d)
        # the shifted padded block IS the box now (start moved up/left,
        # end still covers i_hi/j_hi)
        rin0, rin1 = p0d, p1d
        tile_d = (t0d, t1d)
    else:
        (p0d, p1d), tile_d = pl
    ra, rb = ramps(i_lo, i_lo + p0d, j_lo, j_lo + p1d)

    def run_dense():
        return pallas_sweep.horizon_sweep_pallas(
            z_lat, offset=(i_lo, j_lo), inner_shape=(p0d, p1d),
            tile=tile_d, tilt_ramp=(ra, rb), **kwc)

    dt_dense = time_run(run_dense)

    # masked curved run: lattice stencil-cover mask + cost-model tiling
    sel = msk == 1
    lat_mask = np.zeros((rin0, rin1), np.uint8)
    fi_l = np.clip(fi_in[sel] - i_lo, 0.0, rin0 - 1.0)
    fj_l = np.clip(fj_in[sel] - j_lo, 0.0, rin1 - 1.0)
    i0m = np.floor(fi_l).astype(np.int64)
    j0m = np.floor(fj_l).astype(np.int64)
    for di in (0, 1):
        for dj in (0, 1):
            lat_mask[np.clip(i0m + di, 0, rin0 - 1),
                     np.clip(j0m + dj, 0, rin1 - 1)] = 1
    choice = _hzmod._masked_tile_choice((hr, wr), (i_lo, j_lo),
                                        (rin0, rin1), lat_mask)
    (br0, bc0), (p0m, p1m), tile_m, use_mask = choice
    m_pad = np.zeros((p0m, p1m), np.uint8)
    subm = lat_mask[br0:, bc0:]
    m_pad[:subm.shape[0], :subm.shape[1]] = subm[:p0m, :p1m]
    ram, rbm = ramps(i_lo + br0, i_lo + br0 + p0m,
                     j_lo + bc0, j_lo + bc0 + p1m)

    def run_masked():
        return pallas_sweep.horizon_sweep_pallas(
            z_lat, offset=(i_lo + br0, j_lo + bc0),
            inner_shape=(p0m, p1m), tile=tile_m, tilt_ramp=(ram, rbm),
            mask=m_pad if use_mask else None, **kwc)

    dt_masked = time_run(run_masked)

    # unmasked-lattice-cell equality vs the dense run (device-side diff)
    hm = run_masked()
    hd = run_dense()
    v0 = min(p0m, p0d - br0)
    v1 = min(p1m, p1d - bc0)
    mj = jnp.asarray(m_pad[:v0, :v1] == 1)[..., None]
    dmax = float(jnp.max(jnp.where(
        mj, jnp.abs(hm[:v0, :v1] - hd[br0:br0 + v0, bc0:bc0 + v1]), 0.0)))

    result["masked_curved_considered_frac"] = float(msk.mean())
    result["masked_curved_lattice_shape"] = [int(rin0), int(rin1)]
    result["masked_curved_tile"] = list(tile_m)
    result["masked_curved_dense_wall_time_s"] = dt_dense
    result["masked_curved_wall_time_s"] = dt_masked
    result["masked_curved_speedup"] = dt_dense / dt_masked
    result["masked_curved_unmasked_cell_max_diff_rad"] = dmax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, default=1024,
                    help="inner domain size (cells per side)")
    ap.add_argument("--halo", type=int, default=512,
                    help="outer halo cells per side")
    ap.add_argument("--azim", type=int, default=32)
    ap.add_argument("--dist", type=float, default=20.0,
                    help="search distance [km]")
    ap.add_argument("--dx", type=float, default=25.0)
    ap.add_argument("--acc", type=float, default=0.25)
    # 8 dispatches per timed batch: the batch is closed by ONE dependent
    # readback, so the host<->device roundtrip (~25 ms through a tunnel)
    # amortises to ~3 ms per call instead of ~8 ms at the old default of
    # 3 — which understated the speedup of every sub-100 ms row (masked
    # runs, shadow) relative to the headline sweep.
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu-baseline", action="store_true", default=True)
    ap.add_argument("--no-cpu-baseline", dest="cpu_baseline",
                    action="store_false")
    ap.add_argument("--mask-frac", type=float, default=0.8,
                    help="masked fraction for the masked-domain row "
                         "(0 disables)")
    ap.add_argument("--azim-full", type=int, default=360,
                    help="azimuth count for the full-azimuth row "
                         "(0 disables; reference default is 360)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from horayzon_tpu.ops import sweep, pallas_sweep

    in0 = in1 = args.inner
    h = w = args.inner + 2 * args.halo
    z = make_terrain(h, w, dx=args.dx)
    azim = (2 * np.pi / args.azim) * np.arange(args.azim)

    z_dev = jnp.asarray(z)  # upload once

    def run_xla():
        hori, _ = sweep.horizon_sweep(
            z_dev, dx=args.dx, dy=-args.dx, offset=(args.halo, args.halo),
            inner_shape=(in0, in1), azim=azim,
            dist_search=args.dist * 1000.0, hori_acc=args.acc)
        return hori

    # Tile from the measured lane-tile cost table (horizon._pallas_padded
    # _shape) rather than a hardcoded shape, so the bench exercises the
    # same default a horizon_gridded() user gets.
    from horayzon_tpu import horizon as _hz
    _, bench_tile = _hz._pallas_padded_shape(
        (h, w), (args.halo, args.halo), (in0, in1))

    def run_pallas():
        return pallas_sweep.horizon_sweep_pallas(
            z_dev, dx=args.dx, dy=-args.dx, offset=(args.halo, args.halo),
            inner_shape=(in0, in1), azim_num=args.azim,
            dist_search=args.dist * 1000.0, hori_acc=args.acc,
            tile=bench_tile)

    def time_engine(run):
        # Warm-up / compile, then time a BATCH of dispatches closed by one
        # dependent scalar readback.  The readback (not block_until_ready,
        # which can return early on remote-tunnel backends) forces real
        # completion of every dispatch in the batch; batching amortises the
        # host<->device roundtrip latency (~25 ms through a tunnel, ~0 on
        # a local chip) that a per-iteration readback would add to every
        # sample.
        hori_mean = float(jnp.mean(run()))
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            acc = sum(jnp.mean(run()) for _ in range(args.iters))
            float(acc)
            times.append((time.perf_counter() - t0) / args.iters)
        return min(times), hori_mean

    def time_run(run):
        return time_engine(run)[0]

    dt_xla, hori_mean_xla = time_engine(run_xla)
    try:
        dt_pl, hori_mean = time_engine(run_pallas)
    except Exception:
        dt_pl, hori_mean = None, None
    if dt_pl is not None and dt_pl < dt_xla:
        dt, engine = dt_pl, "pallas"
    else:
        dt, engine, hori_mean = dt_xla, "xla_sweep", hori_mean_xla

    schedule = sweep.build_schedule(args.dx, args.dist * 1000.0,
                                    sweep.default_rel_err(args.acc))
    cells = in0 * in1
    rays = cells * args.azim * REF_RAYS_PER_CELL_AZIM
    rays_per_s = rays / dt
    samples_per_s = cells * args.azim * schedule.num_samples / dt

    result = {
        "metric": "rays_per_s_per_chip",
        "value": rays_per_s,
        "unit": "reference-equivalent rays/s",
        "vs_baseline": rays_per_s / ASSUMED_EMBREE_CPU_RAYS_PER_S,
        "vs_assumed_embree": rays_per_s / ASSUMED_EMBREE_CPU_RAYS_PER_S,
        "baseline_note": ("vs_baseline assumes a 20M rays/s Embree+TBB "
                          "workstation (reference publishes no numbers); "
                          "vs_measured_bvh_cpu is measured on this "
                          "machine's cores - see BASELINE.md"),
        "wall_time_s": dt,
        "cells": cells,
        "azim_num": args.azim,
        "dist_search_km": args.dist,
        "samples_per_cell_azim": schedule.num_samples,
        "samples_per_s": samples_per_s,
        "device": str(jax.devices()[0]),
        "hori_mean_deg": float(np.rad2deg(hori_mean)),
        "engine": engine,
        "xla_sweep_wall_time_s": dt_xla,
    }

    # Full-azimuth row (the reference default is azim_num=360,
    # horizon.pyx:36; the headline row keeps 32 for continuity with
    # earlier rounds).
    if args.azim_full and engine == "pallas":
        a_full = args.azim_full

        def run_full():
            return pallas_sweep.horizon_sweep_pallas(
                z_dev, dx=args.dx, dy=-args.dx,
                offset=(args.halo, args.halo), inner_shape=(in0, in1),
                azim_num=a_full, dist_search=args.dist * 1000.0,
                hori_acc=args.acc, tile=bench_tile)

        dt_full = time_run(run_full)
        result["azim_full"] = a_full
        result["azim_full_wall_time_s"] = dt_full
        result["azim_full_rays_per_s"] = (
            cells * a_full * REF_RAYS_PER_CELL_AZIM / dt_full)

    # Masked-domain rows: wall time must track the considered fraction
    # (reference skips masked cells, horizon_comp.cpp:685-695,749).  Three
    # mask geometries: a centred disc (the adversarial case for tile
    # granularity), a compact island (the South-Georgia ocean-mask shape,
    # gridded_curved_DEM_masked.py), and scattered patches (the NASADEM
    # glacier shape).  Tiles with no unmasked cell are never launched; the
    # tile shape is chosen per mask by the measured cost model
    # (horizon._masked_tile_choice) and partially-masked tiles skip
    # chunks/phases based on their unmasked cells only (mask-aware
    # accumulator init).
    def masked_row(key, mask):
        from horayzon_tpu import horizon as _hzmod
        frac = float(mask.mean())
        (br0, bc0), (p0, p1), m_tile, use_mask = _hzmod._masked_tile_choice(
            (h, w), (args.halo, args.halo), (in0, in1), mask)
        mask_pad = np.zeros((p0, p1), dtype=np.uint8)
        sub = mask[br0:, bc0:]
        mask_pad[:sub.shape[0], :sub.shape[1]] = sub[:p0, :p1]
        n_active = pallas_sweep.tile_schedule((p0, p1), m_tile,
                                              mask_pad).shape[0]
        n_total = (p0 // m_tile[0]) * (p1 // m_tile[1])
        if not use_mask:
            mask_pad = None

        def run_masked():
            return pallas_sweep.horizon_sweep_pallas(
                z_dev, dx=args.dx, dy=-args.dx,
                offset=(args.halo + br0, args.halo + bc0),
                inner_shape=(p0, p1),
                azim_num=args.azim, dist_search=args.dist * 1000.0,
                hori_acc=args.acc, tile=m_tile, mask=mask_pad)

        dt_masked = time_run(run_masked)
        result[key + "_considered_frac"] = frac
        result[key + "_tile"] = list(m_tile)
        result[key + "_active_tile_frac"] = n_active / n_total
        result[key + "_wall_time_s"] = dt_masked
        result[key + "_speedup"] = dt / dt_masked

    if args.mask_frac > 0 and engine == "pallas":
        yy, xx = np.mgrid[0:in0, 0:in1]
        # disc covering (1 - mask_frac) of the domain
        cy0, cx0 = in0 * 0.45, in1 * 0.55
        r_disc = np.sqrt((1.0 - args.mask_frac) * in0 * in1 / np.pi)
        masked_row("masked", ((yy - cy0) ** 2 + (xx - cx0) ** 2
                              <= r_disc ** 2).astype(np.uint8))
        # compact island (~7.7% considered, the South Georgia fraction)
        ry, rx = in0 * 0.22, in1 * 0.11
        masked_row("masked_island",
                   (((yy - in0 * 0.5) / ry) ** 2
                    + ((xx - in1 * 0.5) / rx) ** 2 <= 1.0).astype(np.uint8))
        # scattered glacier-style patches (~8% considered)
        rng = np.random.default_rng(7)
        m_sc = np.zeros((in0, in1), dtype=np.uint8)
        for _ in range(40):
            cy1, cx1 = rng.uniform(0, in0), rng.uniform(0, in1)
            rr = rng.uniform(18.0, 46.0)
            m_sc |= ((yy - cy1) ** 2 + (xx - cx1) ** 2
                     <= rr ** 2).astype(np.uint8)
        masked_row("masked_scattered", m_sc)
        result["masked_note"] = (
            "fully-masked tiles are never launched; tile shape chosen per "
            "mask by the measured cost model; partially masked tiles skip "
            "marching chunks/phases from their unmasked cells only "
            "(mask-aware init).  Sub-(8,128) cell granularity is not "
            "reachable on TPU vector units - see BASELINE.md masked-domain "
            "analysis")

        # Curved ocean-masked row: the reference's flagship masked example
        # is CURVED (South Georgia, gridded_curved_DEM_masked.py).  A
        # synthetic spherical-cap scene is planarised once (host-side,
        # untimed — identical for dense and masked); the dense curved run
        # (tilt-ramp Pallas on the lattice) is timed against the masked
        # run, whose island mask maps onto the lattice and engages the
        # cost-model tiling (horizon._curved_gridded path).  Unmasked
        # lattice cells must equal the dense run exactly.
        try:
            curved_masked_row(result, args, time_run, jnp)
        except Exception as exc:
            result["masked_curved_error"] = \
                f"{type(exc).__name__}: {exc}"[:200]

    # Shadow benchmark: one sun position = one ray/cell in the reference
    # (shadow_comp.cpp:386-491).  A 16-sun track batches through the fused
    # Pallas kernel (per-tile windows amortised over the batch); the
    # log-doubling scan engine is the XLA fallback.
    z_org = z_dev[args.halo:args.halo + in0,
                  args.halo:args.halo + in1] + 0.05
    diag = float(np.hypot(h * args.dx, w * args.dx))
    n_sun = 16
    cx = 0.5 * (w - 1) * args.dx
    cy = -0.5 * (h - 1) * args.dx
    tt = np.linspace(0.15, 2.9, n_sun)
    suns = np.stack([cx + 3.0e5 * np.cos(tt), cy + 3.0e5 * np.sin(tt),
                     2.0e4 + 1.0e4 * np.sin(2 * tt)], axis=-1)

    from horayzon_tpu.ops import sweep as _sw
    sh_schedule = _sw.build_schedule(args.dx, diag,
                                     _sw.default_rel_err(args.acc))
    z_inner = z_dev[args.halo:args.halo + in0, args.halo:args.halo + in1]
    table, _ = pallas_sweep.shadow_sun_table(suns, (cx, cy), args.dx,
                                             -args.dx)

    def run_shadow():
        return pallas_sweep.shadow_metric_pallas(
            z_dev, z_org, z_inner, table, schedule=sh_schedule,
            offset=(args.halo, args.halo), inner_shape=(in0, in1),
            dx=args.dx, dy=-args.dx, grid_origin=(0.0, 0.0),
            tile=bench_tile)

    try:
        dt_sh = time_run(run_shadow) / n_sun
        result["shadow_engine"] = "pallas"
    except Exception:
        from horayzon_tpu.ops import shadow_scan
        u_cells = np.array([0.17 / (-args.dx), 0.985 / args.dx],
                           dtype=np.float32)

        def run_scan():
            return shadow_scan.shadow_scan_metric(
                z_dev, z_org, jnp.float32(0.2), u_cells, args.dx, diag,
                (args.halo, args.halo), (in0, in1))

        dt_sh = time_run(run_scan)
        result["shadow_engine"] = "scan"
        result["shadow_engine_note"] = (
            "log-doubling scan fallback: uses a domain-mean ray slope "
            "(per-cell slopes in the pallas/sweep engines), so this "
            "timing is for slightly different semantics")
    result["shadow_s_per_sun_position"] = dt_sh
    result["shadow_rays_per_s"] = cells / dt_sh

    # Gradient row: value_and_grad through the fused kernel (argmax-
    # emitting forward + winner-replay backward, ops/pallas_sweep.py)
    # w.r.t. the full outer heightfield at the headline shape.
    if engine == "pallas":
        def grad_loss(zz):
            hh = pallas_sweep.horizon_sweep_pallas(
                zz, dx=args.dx, dy=-args.dx, offset=(args.halo, args.halo),
                inner_shape=(in0, in1), azim_num=args.azim,
                dist_search=args.dist * 1000.0, hori_acc=args.acc,
                tile=bench_tile)
            return jnp.mean(hh ** 2)

        vg = jax.jit(jax.value_and_grad(grad_loss))
        try:
            dt_grad = time_run(lambda: vg(z_dev)[1])
            result["grad_wall_time_s"] = dt_grad
            result["grad_vs_forward"] = dt_grad / dt
        except Exception as exc:
            result["grad_error"] = f"{type(exc).__name__}: {exc}"[:200]

        # Sharded gradient row: the same winner-replay backward through
        # horizon_sweep_pallas_sharded on a 1x1 mesh (the bench host has
        # one chip; the code path — shard_map argmax forward, per-shard
        # replay, psum — is identical to the multi-chip one, which the
        # driver's dryrun executes on an 8-device virtual mesh).
        try:
            from horayzon_tpu.parallel import mesh as _pmesh
            from horayzon_tpu.parallel import shard as _pshard
            mesh1 = _pmesh.make_mesh(n_tile=1, n_azim=1,
                                     devices=jax.devices()[:1])

            def loss_sharded(zz):
                hh = _pshard.horizon_sweep_pallas_sharded(
                    mesh1, zz, dx=args.dx, dy=-args.dx,
                    offset=(args.halo, args.halo),
                    inner_shape=(in0, in1), azim_num=args.azim,
                    dist_search=args.dist * 1000.0, hori_acc=args.acc,
                    tile=bench_tile)
                return jnp.mean(hh ** 2)

            # outer jit: the sharded path builds shard_map closures
            # per call, which only hit the compile cache when traced
            # inside one enclosing jit (as a training step would be)
            vgs = jax.jit(jax.value_and_grad(loss_sharded))
            dt_sgrad = time_run(lambda: vgs(z_dev)[1])
            result["sharded_grad_wall_time_s"] = dt_sgrad
            result["sharded_grad_vs_forward"] = dt_sgrad / dt
        except Exception as exc:
            result["sharded_grad_error"] = \
                f"{type(exc).__name__}: {exc}"[:200]

        # Shadow gradient row: value_and_grad of the soft shortwave
        # metric over the 16-sun track through the shadow winner-replay
        # backward (shadow_comp.cpp:563-576 made differentiable at
        # production speed).
        try:
            def loss_shadow(zz):
                z_i = jax.lax.dynamic_slice(
                    zz, (args.halo, args.halo), (in0, in1))
                z_o = z_i + 0.05
                met = pallas_sweep.shadow_metric_pallas_diff(
                    zz, z_o, z_i, table, schedule=sh_schedule,
                    offset=(args.halo, args.halo),
                    inner_shape=(in0, in1), dx=args.dx, dy=-args.dx,
                    grid_origin=(0.0, 0.0), tile=bench_tile)
                return jnp.mean(jax.nn.sigmoid(met / 2.0))

            vgsh = jax.jit(jax.value_and_grad(loss_shadow))
            dt_shg = time_run(lambda: vgsh(z_dev)[1]) / n_sun
            result["shadow_grad_s_per_sun"] = dt_shg
            result["shadow_grad_vs_forward"] = dt_shg / dt_sh
        except Exception as exc:
            result["shadow_grad_error"] = \
                f"{type(exc).__name__}: {exc}"[:200]

    if args.cpu_baseline:
        # Measured CPU baseline 1: the native multithreaded ray-marcher
        # (horayzon_tpu/native/fastdem.cpp) running the *same algorithm*
        # (dense bilinear march) on a subgrid; the samples/s ratio is the
        # honest identical-work hardware speedup.
        try:
            from horayzon_tpu.native import fastdem
            sub = min(64, in0)
            t0 = time.perf_counter()
            _, cpu_samples = fastdem.horizon_march(
                z, args.dx, -args.dx, (args.halo, args.halo), (sub, sub),
                (2 * np.pi / args.azim) * np.arange(args.azim),
                args.dist * 1000.0)
            cpu_dt = time.perf_counter() - t0
            cpu_samples_per_s = cpu_samples / cpu_dt
            result["cpu_samples_per_s"] = cpu_samples_per_s
            result["speedup_vs_cpu_same_algorithm"] = (
                samples_per_s / cpu_samples_per_s)
        except Exception:
            pass
        # Measured CPU baseline 2: the reference's *algorithm* — BVH
        # occlusion rays with the warm-started elevation search
        # (native/bvhbase.cpp) — on a subdomain, extrapolated by ray
        # count to the full bench domain (BASELINE.md methodology).
        try:
            from horayzon_tpu.native import bvhbase
            sub = min(64, in0)
            _, n_rays, build_s, trace_s = bvhbase.horizon_rays(
                z, args.dx, -args.dx, (args.halo, args.halo), (sub, sub),
                args.azim, args.dist * 1000.0, hori_acc=args.acc)
            bvh_rays_per_s = n_rays / trace_s
            rpca = n_rays / (sub * sub * args.azim)
            t_cpu_full = (rpca * cells * args.azim) / bvh_rays_per_s
            result["bvh_cpu_rays_per_s"] = bvh_rays_per_s
            result["bvh_rays_per_cell_azim"] = rpca
            result["bvh_build_s"] = build_s
            result["vs_measured_bvh_cpu"] = t_cpu_full / dt
        except Exception:
            pass

    print(json.dumps(result))


if __name__ == "__main__":
    main()
