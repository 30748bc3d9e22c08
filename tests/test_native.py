import os
import tempfile

import numpy as np
import pytest

try:
    from horayzon_tpu.native import fastdem
    fastdem.get_lib()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native toolchain unavailable")

from reference_impl import brute_horizon, brute_shadow, \
    gaussian_bumps_terrain  # noqa: E402


def test_load_esri_ascii():
    data = np.random.default_rng(0).normal(size=(20, 30)).astype(np.float32)
    with tempfile.NamedTemporaryFile("w", suffix=".asc", delete=False) as f:
        f.write("ncols 30\nnrows 20\nxllcorner 0\nyllcorner 0\n"
                "cellsize 25\nNODATA_value -9999\n")
        for row in data:
            f.write(" ".join(f"{v:.6f}" for v in row) + "\n")
        path = f.name
    try:
        out = fastdem.load_esri_ascii(path, 6)
        assert out.size == data.size
        np.testing.assert_allclose(out.reshape(20, 30), data, atol=1e-5)
    finally:
        os.unlink(path)


def test_native_horizon_matches_numpy_oracle():
    dx = 25.0
    z = gaussian_bumps_terrain(48, 48, seed=3, amp=300.0)
    azim = (2 * np.pi / 8) * np.arange(8)
    hori_c, samples = fastdem.horizon_march(
        z, dx, -dx, (18, 18), (8, 8), azim, 800.0, step=dx / 4)
    hori_np = brute_horizon(z, dx, -dx, (18, 18), (8, 8), azim, 800.0,
                            step_frac=0.25)
    assert samples > 0
    np.testing.assert_allclose(hori_c, hori_np, atol=1e-4)


def test_native_shadow_matches_numpy_oracle():
    dx = 25.0
    z = gaussian_bumps_terrain(48, 48, seed=11, amp=600.0)
    sun = np.array([1.0e7, 0.0, 1.5e6])
    occ_c = fastdem.shadow_march(z, dx, -dx, (8, 8), (32, 32), sun,
                                 step=dx / 4)
    occ_np = brute_shadow(z, dx, -dx, (8, 8), (32, 32), sun,
                          step_frac=0.25)
    assert (occ_c.astype(bool) == occ_np).mean() > 0.99


def test_native_max_downsample2():
    z = np.arange(30, dtype=np.float32).reshape(5, 6)
    out = fastdem.max_downsample2(z)
    from horayzon_tpu.ops import mip
    expect = np.asarray(mip.max_downsample2(z))
    np.testing.assert_allclose(out, expect)


def test_bvh_baseline_matches_sweep():
    """The measured BVH-CPU baseline (native/bvhbase.cpp) agrees with the
    sweep engine within the TIN-vs-bilinear model difference, and its
    warm-started ray accounting approaches the reference's ~2
    rays/(cell, azimuth) at fine azimuth spacing
    (horizon_comp.cpp:807-810)."""
    from horayzon_tpu.native import bvhbase
    from horayzon_tpu.ops import sweep

    try:
        bvhbase.get_lib()
    except Exception:
        pytest.skip("bvhbase build failed")

    z = gaussian_bumps_terrain(192, 192, seed=11, amp=500.0)
    dx = 25.0
    halo, inner = 80, 32
    azim_num = 16
    hori, n_rays, _, _ = bvhbase.horizon_rays(
        z, dx, -dx, (halo, halo), (inner, inner), azim_num, 1800.0,
        hori_acc=0.25)
    azim = (2 * np.pi / azim_num) * np.arange(azim_num)
    h_x, _ = sweep.horizon_sweep(
        z, dx=dx, dy=-dx, offset=(halo, halo), inner_shape=(inner, inner),
        azim=azim, dist_search=1800.0, hori_acc=0.25)
    d = np.rad2deg(np.abs(np.asarray(h_x) - hori))
    assert d.max() < 1.0, f"BVH vs sweep max {d.max():.3f} deg"
    assert np.percentile(d, 99) < 0.5

    # fine azimuth spacing -> the warm start converges to ~2 rays
    _, n_rays_360, _, _ = bvhbase.horizon_rays(
        z, dx, -dx, (halo, halo), (8, 8), 360, 1800.0, hori_acc=0.25)
    rpca = n_rays_360 / (8 * 8 * 360)
    assert rpca < 4.0, f"rays/(cell*azim) at 360 azimuths: {rpca:.2f}"
