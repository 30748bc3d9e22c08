#!/usr/bin/env python
# Copyright (c) 2026
# MIT License
"""Speed-of-light microbenchmark for the fused kernel's core primitive.

The horizon kernel is bound by *dynamic unaligned windowed reads* from a
VMEM-resident terrain window (aligned slab load + sublane/lane rolls, see
``ops.pallas_sweep._shifted_window``).  This tool measures that primitive
in isolation — a kernel that does NOTHING but `n` such reads plus the
semantically minimal per-sample work (bilinear blend + running max), at
the same tile shape and grid as the real sweep — giving the hardware
floor against which the full kernel's marginal read cost can be compared
(BASELINE.md roofline).  Variants:

* ``bilinear`` — (t0+1, t1+1) read + 2-D lerp + ratio max (the dense
  d1/d2 sample).
* ``nearest``  — (t0, t1) read + ratio max (the mip strip sample).
* ``aligned``  — same but with statically aligned reads (no rolls): the
  lower bound Mosaic could reach if reads needed no realignment.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/read_floor.py
"""

import argparse
import functools
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=str, default="128,1024")
    ap.add_argument("--tiles", type=int, default=64)
    ap.add_argument("--azim", type=int, default=32)
    ap.add_argument("--steps", type=int, default=246)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from horayzon_tpu.ops.pallas_sweep import _shifted_window, _round_up

    t0, t1 = (int(x) for x in args.tile.split(","))
    n_steps = args.steps

    # window big enough for every step's shifted read
    w0 = _round_up(t0 + 1 + 16 + n_steps, 8)
    w1 = _round_up(t1 + 1 + 256 + n_steps, 128)

    def kernel(trig_ref, win_ref, out_ref, *, mode):
        ak = pl.program_id(1)
        sh_i = trig_ref[ak, 0]
        sh_j = trig_ref[ak, 1]
        rows = t0 + (1 if mode == "bilinear" else 0)
        cols = t1 + (1 if mode == "bilinear" else 0)

        def body(m, acc):
            s = (m + 1).astype(jnp.float32)   # 1 cell per step
            if mode in ("stream", "stream8"):
                # VMEM read-bandwidth ceiling: 4 independent aligned slab
                # reads (the same (8,128)-granular footprint a dynamic
                # windowed read must touch) + one max fold each
                mi = m.astype(jnp.int32)
                x = acc
                ns = 8 if mode == "stream8" else 4
                # slab dims follow the tile (the production covering slab of
                # a (t0+1, t1+1) read); offsets derived from w0/w1 so any
                # --tile stays in bounds (previously hardcoded 136x1152,
                # which read out of bounds below (128, 1024) tiles)
                s0 = _round_up(t0 + 8, 8)
                s1 = _round_up(t1 + 128, 128)
                n_j = max(1, (w1 - s1) // 128)
                for r in range(ns):
                    ia = pl.multiple_of(
                        (jax.lax.rem(mi * 8 + r * 16, w0 - s0) // 8) * 8,
                        8)
                    slab = win_ref[pl.ds(ia, s0),
                                   pl.ds((r % n_j) * 128, s1)]
                    x = jnp.maximum(x, slab[:t0, :t1])
                return x
            if mode == "vpu":
                # pure VPU throughput: two independent dependent-chains of
                # fma + a max merge per round; 3 non-CSE-able elementwise
                # instructions per round per element -> ops ceiling
                x = acc
                y = acc + s
                for r in range(8):
                    x = x * sh_i + sh_j
                    y = y * sh_j + sh_i
                    x = jnp.maximum(x, y)
                return x
            dif = s * sh_i
            djf = s * sh_j
            di = jnp.floor(dif)
            dj = jnp.floor(djf)
            if mode == "aligned":
                # dynamic but (8,128)-aligned start: the read minus the
                # realignment rolls (not hoistable: start depends on m)
                ia = pl.multiple_of(
                    ((di.astype(jnp.int32) + 8) // 8) * 8, 8)
                ja = pl.multiple_of(
                    ((dj.astype(jnp.int32) + 128) // 128) * 128, 128)
                win = win_ref[pl.ds(ia, rows), pl.ds(ja, cols)]
            else:
                win = _shifted_window(
                    win_ref, di.astype(jnp.int32) + 8,
                    dj.astype(jnp.int32) + 128, rows, cols)
            if mode == "bilinear":
                fi = dif - di
                fj = djf - dj
                top = (1.0 - fj) * win[:-1, :-1] + fj * win[:-1, 1:]
                bot = (1.0 - fj) * win[1:, :-1] + fj * win[1:, 1:]
                he = (1.0 - fi) * top + fi * bot
            else:
                he = win[:t0, :t1]
            return jnp.maximum(acc, he * (1.0 / s))

        out_ref[...] = jax.lax.fori_loop(
            0, n_steps, body, jnp.full((t0, t1), -1e30, jnp.float32))

    @functools.partial(jax.jit, static_argnames=("mode",))
    def run(trig, win, mode):
        grid = (args.tiles, args.azim)
        return pl.pallas_call(
            functools.partial(kernel, mode=mode),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((w0, w1), lambda i, k: (0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (None, None, t0, t1), lambda i, k: (i, k, 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (args.tiles, args.azim, t0, t1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(trig, win)

    rng = np.random.default_rng(0)
    # ray direction table: |sh| <= 1 cell/step like the real sweep
    # first-quadrant directions only: keeps all shifts non-negative so the
    # microbenchmark window needs no low-side padding
    az = 0.5 * np.pi * (np.arange(args.azim) + 0.5) / args.azim
    trig = jnp.asarray(
        np.stack([np.sin(az), np.cos(az)], -1).astype(np.float32))
    win = jnp.asarray(rng.normal(size=(w0, w1)).astype(np.float32))

    n_reads = args.tiles * args.azim * n_steps
    print(f"tile ({t0},{t1}) window ({w0},{w1}) "
          f"{args.tiles} tiles x {args.azim} dirs x {n_steps} steps")
    import os
    modes = os.environ.get("MODES", "bilinear,nearest,aligned,stream,vpu")
    for mode in modes.split(","):
        r = run(trig, win, mode)
        chk = float(jnp.mean(r))   # force full execution + readback
        ts = []
        for _ in range(args.iters):
            tt = time.perf_counter()
            chk = float(jnp.mean(run(trig, win, mode)))
            ts.append(time.perf_counter() - tt)
        dt = min(ts)
        assert np.isfinite(chk), chk
        extra = ""
        if mode in ("stream", "stream8"):
            gb = n_reads * (8.0 if mode == "stream8" else 4.0) * 136 * 1152 * 4 / 1e9
            extra = f"   VMEM read ~{gb / dt / 1e3:.2f} TB/s"
        if mode == "vpu":
            # 8 rounds x 3 elementwise ops per step
            ops = n_reads * 24.0 * t0 * t1
            extra = f"   VPU peak ~{ops / dt / 1e12:.2f} T elementwise ops/s"
        print(f"{mode:<9} {dt:7.4f} s   {dt / n_reads * 1e9:7.1f} ns/read"
              f"   {args.tiles * args.azim * n_steps * t0 * t1 / dt / 1e9:7.1f}"
              f" G samples/s{extra}")


if __name__ == "__main__":
    main()
