import numpy as np
import pytest

from horayzon_tpu.ops import multires, sweep

from reference_impl import gaussian_bumps_terrain


def _downsample_max(z, r):
    h, w = z.shape
    return z[:h - h % r, :w - w % r].reshape(h // r, r, w // r, r) \
        .max(axis=(1, 3))


def test_multires_matches_full_resolution():
    """Fine+coarse sweep agrees with the full-resolution sweep within the
    far-field error budget."""
    dx = 25.0
    full = gaussian_bumps_terrain(512, 512, seed=21, amp=500.0, n_bumps=25)
    # Fine grid: centre crop; coarse grid: 2x max-downsample of everything
    r_log2 = 1
    r = 2 ** r_log2
    fine_o = 64          # fine grid starts at full[64, 64]
    z_fine = full[fine_o:fine_o + 384, fine_o:fine_o + 384]
    z_coarse = _downsample_max(full, r)
    azim = (2 * np.pi / 8) * np.arange(8)
    inner = (32, 32)
    off_full = (fine_o + 176, fine_o + 176)  # centre of the fine grid
    off_fine = (176, 176)
    dist = 6000.0
    acc = 0.5

    h_full, _ = sweep.horizon_sweep(
        full, dx=dx, dy=-dx, offset=off_full, inner_shape=inner,
        azim=azim, dist_search=dist, hori_acc=acc)
    h_mr = multires.horizon_sweep_multires(
        z_fine, z_coarse, ratio_log2=r_log2, coarse_offset=(fine_o, fine_o),
        dx=dx, dy=-dx, offset=off_fine, inner_shape=inner, azim=azim,
        dist_search=dist, hori_acc=acc)
    d = np.rad2deg(np.abs(np.asarray(h_mr) - np.asarray(h_full)))
    # Coarse far field is conservative (max-downsampled) -> small positive
    # bias allowed; tolerance ~2x hori_acc
    assert d.max() < 2 * acc, f"multires max diff {d.max():.3f} deg"


def test_multires_halo_validation():
    z_fine = np.zeros((64, 64), dtype=np.float32)
    z_coarse = np.zeros((128, 128), dtype=np.float32)
    azim = np.zeros(2)
    with pytest.raises(ValueError, match="halo"):
        multires.horizon_sweep_multires(
            z_fine, z_coarse, ratio_log2=2, coarse_offset=(0, 0),
            dx=25.0, dy=-25.0, offset=(28, 28), inner_shape=(8, 8),
            azim=azim, dist_search=50000.0, hori_acc=0.25)


def test_multires_alignment_validation():
    z_fine = np.zeros((64, 64), dtype=np.float32)
    z_coarse = np.zeros((64, 64), dtype=np.float32)
    sched = sweep.build_schedule(25.0, 5000.0, 0.005)
    with pytest.raises(ValueError, match="aligned"):
        multires.combined_pyramid(z_fine, z_coarse, 2, (3, 0), sched)
