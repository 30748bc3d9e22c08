#!/usr/bin/env python
# Copyright (c) 2026
# MIT License
"""Attribute fused-kernel time to its components on real hardware.

Runs the bench-shape horizon sweep with each `ops.pallas_sweep._ABLATE`
flag (profiling-only static knobs compiled into the kernel) and prints a
wall-time table.  Most ablations produce WRONG results by design — this is
a profiler, not a benchmark.  jit caches are cleared between settings so
each flag recompiles.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_kernel.py
"""

import time

import numpy as np


def make_terrain(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    z = np.zeros((h, w), dtype=np.float64)
    for _ in range(24):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        sig = rng.uniform(6.0, h / 6.0)
        z += rng.uniform(100, 800) * np.exp(
            -(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig ** 2)))
    return z.astype(np.float32)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, default=1024)
    ap.add_argument("--halo", type=int, default=512)
    ap.add_argument("--azim", type=int, default=32)
    ap.add_argument("--dist", type=float, default=20.0)
    ap.add_argument("--dx", type=float, default=25.0)
    ap.add_argument("--tile", type=str, default="128,512")
    ap.add_argument("--a-chunk", type=int, default=0,
                    help="override azimuths per grid step (0 = default)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--configs", type=str, default="",
                    help="comma-separated subset of config names to run")
    ap.add_argument("--tile-sweep", action="store_true",
                    help="measure the kernel tile-shape cost table for "
                         "THIS device and cache it for "
                         "horizon._masked_tile_choice / "
                         "_pallas_padded_shape (one-command autotune)")
    ap.add_argument("--bf16-mip", action="store_true",
                    help="experiment: wall time + accuracy of bf16 "
                         "(round-up) mip levels vs f32 at the bench shape")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from horayzon_tpu.ops import pallas_sweep, sweep

    in0 = in1 = args.inner
    h = w = args.inner + 2 * args.halo
    z = make_terrain(h, w)
    z_dev = jnp.asarray(z)
    tile = tuple(int(t) for t in args.tile.split(","))

    if args.tile_sweep:
        return tile_sweep(args)
    if args.bf16_mip:
        return bf16_mip_experiment(args, z_dev, tile)

    sched = sweep.build_schedule(args.dx, args.dist * 1000.0,
                                 sweep.default_rel_err(0.25))
    print(f"schedule: {sched.num_samples} samples/(cell,azim); phases:")
    for ph, s in zip(sched.phases, sched.s_values):
        print(f"  level={ph.level:2d} kind={ph.kind} num={ph.num:4d} "
              f"s=[{s[0]:.0f}..{s[-1]:.0f}] m")

    def run():
        out = pallas_sweep.horizon_sweep_pallas(
            z_dev, dx=args.dx, dy=-args.dx, offset=(args.halo, args.halo),
            inner_shape=(in0, in1), azim_num=args.azim,
            dist_search=args.dist * 1000.0, hori_acc=0.25, tile=tile,
            a_chunk=args.a_chunk or None)
        return float(jnp.mean(out))

    def timed():
        run()  # compile + warm
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    configs = [
        ("full", frozenset()),
        ("no_skip", frozenset({"no_skip"})),
        ("no_quad", frozenset({"no_quad"})),
        ("approx_sqrt", frozenset({"approx_sqrt"})),
        ("no_quad_valid", frozenset({"no_quad_valid"})),
        ("no_strip_mm2", frozenset({"no_strip_mm2"})),
        ("no_strip_mm1", frozenset({"no_strip_mm1"})),
        ("one_read", frozenset({"one_read"})),
        ("no_mip", frozenset({"no_mip"})),
        ("no_roll", frozenset({"no_roll"})),
        ("no_roll+no_quad", frozenset({"no_roll", "no_quad"})),
        ("no_roll0", frozenset({"no_roll0"})),
        ("no_roll1", frozenset({"no_roll1"})),
        ("no_roll+no_quad+no_mip",
         frozenset({"no_roll", "no_quad", "no_mip"})),
    ]
    if args.configs:
        keep = set(args.configs.split(","))
        configs = [c for c in configs if c[0] in keep]
    base = None
    print(f"\n{'config':<24}{'wall[s]':>9}{'vs full':>9}")
    for name, flags in configs:
        pallas_sweep._ABLATE = flags
        jax.clear_caches()
        dt = timed()
        if base is None:
            base = dt
        print(f"{name:<24}{dt:>9.4f}{dt / base:>9.3f}")
    pallas_sweep._ABLATE = frozenset()
    jax.clear_caches()

    cells = in0 * in1
    print(f"\nfull: {cells * args.azim * sched.num_samples / base / 1e9:.1f}"
          f" G samples/s")


def tile_sweep(args):
    """Measure wall time per kernel tile shape at the bench shape,
    subtract the host<->device roundtrip latency, and cache the relative
    table keyed by device kind (horizon.py loads it over its built-ins).

    Usage: python tools/ablate_kernel.py --tile-sweep"""
    import json
    import time

    import jax
    import jax.numpy as jnp
    from horayzon_tpu import horizon as _hz
    from horayzon_tpu.ops import pallas_sweep

    in0 = in1 = args.inner
    h = w = args.inner + 2 * args.halo
    z_dev = jnp.asarray(make_terrain(h, w))

    # roundtrip latency of a dependent scalar readback
    tiny = jnp.ones((8, 8))
    float(jnp.mean(tiny))
    lat = min(_t(lambda: float(jnp.mean(tiny))) for _ in range(5))
    print(f"roundtrip latency: {lat * 1e3:.1f} ms")

    shapes = [(128, 1024), (128, 512), (128, 256), (64, 1024), (64, 512),
              (64, 256), (32, 1024), (32, 512), (32, 256), (16, 1024),
              (16, 512), (16, 256), (8, 256)]
    walls = {}
    for tile in shapes:
        if in0 % tile[0] or in1 % tile[1]:
            continue

        def run(tile=tile):
            return float(jnp.mean(pallas_sweep.horizon_sweep_pallas(
                z_dev, dx=args.dx, dy=-args.dx,
                offset=(args.halo, args.halo), inner_shape=(in0, in1),
                azim_num=args.azim, dist_search=args.dist * 1000.0,
                hori_acc=0.25, tile=tile)))

        run()
        dt = max(min(_t(run) for _ in range(args.iters)) - lat, 1e-6)
        walls[tile] = dt
        print(f"tile={tile}: {dt:.4f} s (latency-corrected)")

    base = walls[min(walls, key=walls.get)]
    kind = _hz._device_kind()
    table = {f"{t0}x{t1}": round(v / base, 4)
             for (t0, t1), v in walls.items()}
    lane = {str(t1): round(min(v / base for (a0, a1), v in walls.items()
                               if a1 == t1 and a0 == 128), 4)
            for t1 in (256, 512, 1024)
            if any(a1 == t1 and a0 == 128 for (a0, a1) in walls)}
    lane_base = lane.get("256", 1.0)
    lane = {k: round(v / lane_base, 4) for k, v in lane.items()}
    path = _hz._tune_cache_path()
    try:
        cache = json.load(open(path))
    except Exception:
        cache = {}
    cache[kind] = {"tile_cost": table, "lane_cost": lane}
    import os
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
    print(f"wrote {path} [{kind}]")


def bf16_mip_experiment(args, z_dev, tile):
    """Measure pallas_sweep._MIP_BF16 (bf16 round-up mip levels): wall
    time and horizon deviation vs the f32 kernel at the bench shape.
    The deviation is one-sided (bf16 levels only round UP -> horizons can
    only rise) and bounded by ~relief/256 at the mip sample distance;
    keep/reject verdict goes to BASELINE.md."""
    import jax
    import jax.numpy as jnp
    from horayzon_tpu.ops import pallas_sweep

    in0 = in1 = args.inner
    kw = dict(dx=args.dx, dy=-args.dx, offset=(args.halo, args.halo),
              inner_shape=(in0, in1), azim_num=args.azim,
              dist_search=args.dist * 1000.0, hori_acc=0.25, tile=tile,
              a_chunk=args.a_chunk or None)

    def run():
        return pallas_sweep.horizon_sweep_pallas(z_dev, **kw)

    def timed():
        float(jnp.mean(run()))
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            acc = sum(jnp.mean(run()) for _ in range(args.iters))
            float(acc)
            ts.append((time.perf_counter() - t0) / args.iters)
        return min(ts)

    results = {}
    for flag in (False, True):
        pallas_sweep._MIP_BF16 = flag
        jax.clear_caches()
        dt = timed()
        h = run()
        results[flag] = (dt, h)
        print(f"_MIP_BF16={flag}: {dt:.4f} s")
    pallas_sweep._MIP_BF16 = False
    jax.clear_caches()
    d = jnp.rad2deg(results[True][1] - results[False][1])
    print(f"deviation bf16-f32 [deg]: max {float(jnp.max(d)):.4f} "
          f"min {float(jnp.min(d)):.4f} "
          f"mean|.| {float(jnp.mean(jnp.abs(d))):.5f}")
    print(f"speed: {results[False][0] / results[True][0]:.3f}x")


def _t(run):
    t0 = time.perf_counter()
    run()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
