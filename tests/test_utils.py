import os
import tempfile

import numpy as np

from horayzon_tpu.utils import profiling, streaming

from reference_impl import gaussian_bumps_terrain


def test_tiled_runner_matches_single_sweep_and_resumes():
    from horayzon_tpu.ops import sweep

    z = gaussian_bumps_terrain(96, 96, seed=13, amp=400.0)
    azim = (2 * np.pi / 4) * np.arange(4)
    kw = dict(dx=25.0, dy=-25.0, offset=(24, 24), inner_shape=(48, 48),
              azim=azim, dist_search=500.0)
    ref, _ = sweep.horizon_sweep(z, **kw)
    ref = np.asarray(ref)

    with tempfile.TemporaryDirectory() as td:
        runner = streaming.TiledHorizonRunner(z, out_dir=td, tile=(32, 32),
                                              **kw)
        paths = runner.run(verbose=False)
        assert all(os.path.exists(p) for p in paths)
        out = runner.assemble()
        np.testing.assert_allclose(out, ref, atol=1e-6)

        # Resume: delete one tile, run again -> only that tile recomputed
        os.unlink(paths[1])
        mtimes = {p: os.path.getmtime(p) for p in paths if os.path.exists(p)}
        runner.run(verbose=False)
        assert os.path.exists(paths[1])
        for p, m in mtimes.items():
            assert os.path.getmtime(p) == m  # untouched tiles not redone
        out2 = runner.assemble()
        np.testing.assert_allclose(out2, ref, atol=1e-6)


def test_sweep_stats():
    stats = profiling.SweepStats(wall_time_s=2.0, cells=1000, azim_num=10,
                                 samples_per_cell_azim=100)
    assert stats.samples_per_s == 1000 * 10 * 100 / 2.0
    assert stats.rays_per_s_equivalent == 1000 * 10 * 2.0 / 2.0
    assert "rays_per_s_equivalent" in stats.to_json()


def test_time_sweep_runs():
    import jax.numpy as jnp
    stats = profiling.time_sweep(lambda: jnp.ones((8, 8)), cells=64,
                                 azim_num=1, samples_per_cell_azim=1,
                                 iters=1)
    assert stats.wall_time_s > 0


def test_write_dataset_npz_and_nc_fallback(tmp_path=None):
    import tempfile

    from horayzon_tpu.utils import output

    hori = np.random.default_rng(0).random((4, 5, 3)).astype(np.float32)
    azim = np.linspace(0, 2 * np.pi, 3, endpoint=False).astype(np.float32)
    x = np.arange(5.0)
    y = np.arange(4.0)[::-1]
    with tempfile.TemporaryDirectory() as td:
        p1 = output.write_horizon(os.path.join(td, "h.npz"), hori, azim,
                                  x=x, y=y)
        d = np.load(p1)
        assert d["horizon"].shape == (3, 4, 5)
        np.testing.assert_allclose(d["azim"], azim)
        # .nc falls back to .npz without xarray (or writes real NetCDF)
        p2 = output.write_horizon(os.path.join(td, "h.nc"), hori, azim,
                                  x=x, y=y)
        assert os.path.exists(p2)


def test_sun_track_runner_resumes_after_kill():
    """A killed sun-track run keeps completed chunks and a restart only
    computes the remaining ones (reference analogue: per-timestep NetCDF
    appends, gridded_curved_DEM_SRTM.py:207-266)."""
    from horayzon_tpu import auxiliary, shadow

    z = gaussian_bumps_terrain(48, 48, seed=21, amp=400.0)
    dx = 25.0
    h, w = z.shape
    off, in0, in1 = 8, 32, 32
    x1 = np.arange(w, dtype=np.float32) * dx
    y1 = -np.arange(h, dtype=np.float32) * dx
    xx, yy = np.meshgrid(x1, y1)
    vert_grid = auxiliary.rearrange_pad_buffer(xx, yy, z)
    vec_norm = np.zeros((in0, in1, 3), dtype=np.float32)
    vec_norm[..., 2] = 1.0
    t = shadow.Terrain()
    t.initialise(vert_grid, h, w, off, off, vec_norm.copy(), vec_norm,
                 np.ones((in0, in1), dtype=np.float32),
                 z[off:off + in0, off:off + in1],
                 np.ones((in0, in1), dtype=np.uint8))

    ang = np.linspace(0.2, 2.8, 7)
    suns = np.stack([1e7 * np.cos(ang), 1e7 * np.sin(ang),
                     2e6 + 1e6 * np.sin(ang)], axis=-1).astype(np.float32)
    ref = t.sw_dir_cor_batch(suns)

    with tempfile.TemporaryDirectory() as td:
        runner = streaming.SunTrackRunner(t, suns, out_dir=td, chunk=3)

        # Simulate a kill after the first chunk: raise inside the 2nd call
        calls = {"n": 0}
        orig = t.sw_dir_cor_batch

        def dying(sp):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise KeyboardInterrupt
            return orig(sp)

        t.sw_dir_cor_batch = dying
        try:
            runner.run(verbose=False)
        except KeyboardInterrupt:
            pass
        t.sw_dir_cor_batch = orig
        done = [p for t0, _ in runner.chunks()
                if os.path.exists(p := runner._chunk_path(t0))]
        assert len(done) == 1           # first chunk survived the kill

        # Restart: completed chunk untouched, remaining chunks computed
        mtime0 = os.path.getmtime(done[0])
        paths = runner.run(verbose=False)
        assert os.path.getmtime(done[0]) == mtime0
        assert all(os.path.exists(p) for p in paths)
        np.testing.assert_allclose(runner.assemble(), ref, atol=1e-6)
