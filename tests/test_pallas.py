import numpy as np
import pytest

from horayzon_tpu.ops import pallas_sweep, sweep

from reference_impl import gaussian_bumps_terrain


def test_pallas_matches_xla_interpret():
    """Pallas kernel (interpret mode on CPU) vs the XLA sweep.

    The kernel uses midpoint+endpoint reads for every dense step while the
    XLA path switches to trailing-window parabolas after the near field, so
    agreement is within the accuracy contract rather than bitwise."""
    z = gaussian_bumps_terrain(96, 96, seed=3, amp=300.0)
    azim_num = 4
    azim = (2 * np.pi / azim_num) * np.arange(azim_num)
    for dist in [800.0, 2500.0]:
        kw = dict(dx=25.0, dy=-25.0, offset=(32, 32), inner_shape=(32, 32),
                  dist_search=dist, hori_acc=0.25)
        h_ref, _ = sweep.horizon_sweep(z, azim=azim, **kw)
        h_pal = pallas_sweep.horizon_sweep_pallas(
            z, azim_num=azim_num, a_chunk=4, tile=(32, 32),
            interpret=True, **kw)
        d = np.rad2deg(np.abs(np.asarray(h_pal) - np.asarray(h_ref)))
        assert d.max() < 0.5, f"dist={dist}: max diff {d.max():.3f} deg"


def test_pallas_validation():
    z = np.zeros((64, 64), dtype=np.float32)
    with pytest.raises(ValueError, match="divisible"):
        pallas_sweep.horizon_sweep_pallas(
            z, dx=25.0, dy=-25.0, offset=(16, 16), inner_shape=(30, 30),
            azim_num=4, dist_search=500.0, tile=(16, 16))
