import jax
import numpy as np
import pytest

from horayzon_tpu.ops import sweep
from horayzon_tpu.parallel import mesh as pmesh
from horayzon_tpu.parallel import shard as pshard

from reference_impl import gaussian_bumps_terrain


@pytest.fixture(scope="module")
def terrain():
    z = gaussian_bumps_terrain(64, 64, seed=7, amp=400.0)
    return z


def _single_device(z, azim, **kw):
    hori, _ = sweep.horizon_sweep(z, **kw, azim=azim)
    return np.asarray(hori)


def test_sharded_matches_single_device(terrain):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    azim = (2 * np.pi / 16) * np.arange(16)
    kw = dict(dx=25.0, dy=-25.0, offset=(16, 16), inner_shape=(32, 32),
              dist_search=600.0, hori_acc=0.25)
    ref = _single_device(terrain, azim, **kw)

    mesh = pmesh.make_mesh(n_tile=4, n_azim=2)
    out = pshard.horizon_sweep_sharded(mesh, terrain, **kw, azim=azim)
    out = np.asarray(out)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sharded_8x1_mesh(terrain):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    azim = (2 * np.pi / 8) * np.arange(8)
    kw = dict(dx=25.0, dy=-25.0, offset=(16, 16), inner_shape=(32, 32),
              dist_search=500.0)
    ref = _single_device(terrain, azim, **kw)
    mesh = pmesh.make_mesh(n_tile=8, n_azim=1)
    out = np.asarray(pshard.horizon_sweep_sharded(mesh, terrain, **kw,
                                                  azim=azim))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sharded_gradients_flow(terrain):
    """Differentiability through the sharded sweep: gradients w.r.t. the
    replicated heightfield psum across shards."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    azim = (2 * np.pi / 8) * np.arange(8)
    mesh = pmesh.make_mesh(n_tile=4, n_azim=2)

    import jax.numpy as jnp

    def loss(z):
        hori = pshard.horizon_sweep_sharded(
            mesh, z, dx=25.0, dy=-25.0, offset=(16, 16),
            inner_shape=(32, 32), dist_search=500.0, azim=azim)
        return jnp.mean(hori)

    g = jax.grad(loss)(jnp.asarray(terrain))
    g = np.asarray(g)
    assert g.shape == terrain.shape
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0


def test_sharded_shadow_matches_single_device(terrain):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from horayzon_tpu.ops import sweep as _sweep

    dx = 25.0
    off = (16, 16)
    inner = (32, 32)
    z_in = terrain[16:48, 16:48]
    z_org = z_in + 0.05
    m = np.full(inner, 0.2, np.float32)
    u_cells = np.array([0.0, 1.0 / dx], dtype=np.float32)
    diag = np.hypot(64 * dx, 64 * dx)
    sched = _sweep.build_schedule(dx, diag, _sweep.default_rel_err(0.25))
    ref = np.asarray(_sweep.shadow_metric(
        terrain, z_org, z_in, m, u_cells, sched, off, inner))
    mesh = pmesh.make_mesh(n_tile=8, n_azim=1)
    out = np.asarray(pshard.shadow_metric_sharded(
        mesh, terrain, z_org, z_in, m, u_cells, sched, off, inner))
    np.testing.assert_allclose(out, ref, atol=1e-5)
