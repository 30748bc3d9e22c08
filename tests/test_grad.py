import jax
import jax.numpy as jnp
import numpy as np

from horayzon_tpu.ops import sweep
from horayzon_tpu.topo_param import svf_core_fn

from reference_impl import gaussian_bumps_terrain


def _loss(z, azim, tilt):
    hori, _ = sweep.horizon_sweep(z, dx=25.0, dy=-25.0, offset=(16, 16),
                                  inner_shape=(16, 16), azim=azim,
                                  dist_search=400.0)
    svf = svf_core_fn(jnp.asarray(azim, jnp.float32), hori, tilt)
    return jnp.mean(svf)


def test_horizon_gradients_finite_and_nonzero():
    """The sweep is differentiable w.r.t. the DEM heightfield (BASELINE
    north star: gradients through the intersection tests)."""
    z = jnp.asarray(gaussian_bumps_terrain(48, 48, seed=8, amp=300.0))
    azim = (2 * np.pi / 8) * np.arange(8)
    tilt = jnp.zeros((16, 16, 3), jnp.float32).at[..., 2].set(1.0)
    g = jax.grad(_loss)(z, azim, tilt)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0
    # Physics: horizon angles are invariant under a uniform elevation
    # shift (terrain and observers rise together), so the gradient's
    # positive mass (raising observers clears their sky) exactly balances
    # the negative mass (raising terrain blocks it): sum(g) ~= 0.
    assert g.min() < 0.0 < g.max()
    assert abs(g.sum()) < 1e-3 * np.abs(g).sum()


def test_gradient_matches_finite_difference():
    """Directional derivative vs central finite difference."""
    z0 = jnp.asarray(gaussian_bumps_terrain(48, 48, seed=9, amp=200.0))
    azim = (2 * np.pi / 4) * np.arange(4)
    tilt = jnp.zeros((16, 16, 3), jnp.float32).at[..., 2].set(1.0)

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(z0.shape).astype(np.float32))
    g = jax.grad(_loss)(z0, azim, tilt)
    directional = float(jnp.vdot(g, v))
    eps = 0.05
    lp = float(_loss(z0 + eps * v, azim, tilt))
    lm = float(_loss(z0 - eps * v, azim, tilt))
    fd = (lp - lm) / (2 * eps)
    # The forward has kinks (max, clip); agreement is approximate
    assert np.isfinite(directional) and np.isfinite(fd)
    assert abs(directional - fd) < 0.3 * (abs(fd) + abs(directional)) + 1e-4
