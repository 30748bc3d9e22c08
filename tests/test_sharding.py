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


@pytest.mark.parametrize("n_tile,n_azim", [(8, 1), (2, 4), (1, 8), (2, 2)])
def test_sharded_mesh_shapes(terrain, n_tile, n_azim):
    """Equality across (n_tile, n_azim) mesh shapes — the virtual stand-in
    for multi-host layouts where the tile axis spans hosts."""
    if len(jax.devices()) < n_tile * n_azim:
        pytest.skip("needs enough virtual devices")
    azim = (2 * np.pi / 8) * np.arange(8)
    kw = dict(dx=25.0, dy=-25.0, offset=(16, 16), inner_shape=(32, 32),
              dist_search=500.0)
    ref = _single_device(terrain, azim, **kw)
    mesh = pmesh.make_mesh(
        n_tile=n_tile, n_azim=n_azim,
        devices=jax.devices()[:n_tile * n_azim])
    out = np.asarray(pshard.horizon_sweep_sharded(mesh, terrain, **kw,
                                                  azim=azim))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_init_distributed_single_process(terrain):
    """init_distributed with no cluster config is a pure mesh builder."""
    from horayzon_tpu import parallel

    n_dev = len(jax.devices())
    if n_dev < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = parallel.init_distributed(n_azim=2)
    assert mesh.devices.shape == (n_dev // 2, 2)
    azim = (2 * np.pi / 4) * np.arange(4)
    kw = dict(dx=25.0, dy=-25.0, offset=(16, 16), inner_shape=(32, 32),
              dist_search=500.0)
    ref = _single_device(terrain, azim, **kw)
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


def test_sharded_pallas_matches_single_device(terrain):
    """Fused-Pallas engine under shard_map (4x2 tile x azim mesh) vs the
    single-device Pallas kernel — exact equality (same kernel, same
    arithmetic, shard offsets only relabel the work)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from horayzon_tpu.ops import pallas_sweep

    azim_num = 16
    kw = dict(dx=25.0, dy=-25.0, offset=(16, 16), inner_shape=(32, 32),
              dist_search=600.0, hori_acc=0.25)
    single = np.asarray(pallas_sweep.horizon_sweep_pallas(
        terrain, azim_num=azim_num, a_chunk=4, tile=(8, 32),
        interpret=True, **kw))
    mesh = pmesh.make_mesh(n_tile=4, n_azim=2)
    out = np.asarray(pshard.horizon_sweep_pallas_sharded(
        mesh, terrain, azim_num=azim_num, a_chunk=4, tile=(8, 32),
        interpret=True, **kw))
    np.testing.assert_array_equal(out, single)


def test_sharded_pallas_tilt_ramp(terrain):
    """Sharded Pallas with the curved-Earth tilt ramp (ramp fields sharded
    over rows) vs single-device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from horayzon_tpu.ops import pallas_sweep

    rng = np.random.default_rng(3)
    ramp_a = rng.normal(0.0, 1e-4, (32, 32)).astype(np.float32)
    ramp_b = rng.normal(0.0, 1e-4, (32, 32)).astype(np.float32)
    kw = dict(dx=25.0, dy=-25.0, offset=(16, 16), inner_shape=(32, 32),
              dist_search=500.0, azim_num=8, a_chunk=4, tile=(8, 32),
              tilt_ramp=(ramp_a, ramp_b), interpret=True)
    single = np.asarray(pallas_sweep.horizon_sweep_pallas(terrain, **kw))
    mesh = pmesh.make_mesh(n_tile=4, n_azim=2)
    out = np.asarray(pshard.horizon_sweep_pallas_sharded(
        mesh, terrain, **kw))
    np.testing.assert_array_equal(out, single)


def test_sharded_pallas_shadow_matches_single_device(terrain):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from horayzon_tpu.ops import pallas_sweep
    from horayzon_tpu.ops import sweep as _sweep

    dx = 25.0
    off = (16, 16)
    inner = (32, 32)
    n = terrain.shape[0]
    cx = 0.5 * (n - 1) * dx
    cy = -0.5 * (n - 1) * dx
    suns = np.array([[cx + 2e5, cy + 1e5, 2e4],
                     [cx - 1e5, cy - 2e5, 1.5e4]], dtype=np.float32)
    z_in = terrain[16:48, 16:48]
    z_org = z_in + 0.05
    diag = float(np.hypot(n * dx, n * dx))
    sched = _sweep.build_schedule(dx, diag, _sweep.default_rel_err(0.25))
    table, _ = pallas_sweep.shadow_sun_table(suns, (cx, cy), dx, -dx)
    kw = dict(schedule=sched, offset=off, inner_shape=inner, dx=dx, dy=-dx,
              grid_origin=(0.0, 0.0), t_chunk=2, interpret=True)
    single = np.asarray(pallas_sweep.shadow_metric_pallas(
        terrain, z_org, z_in, table, tile=(8, 32), **kw))
    mesh = pmesh.make_mesh(n_tile=8, n_azim=1)
    out = np.asarray(pshard.shadow_metric_pallas_sharded(
        mesh, terrain, z_org, z_in, table, tile=(4, 32), **kw))
    np.testing.assert_array_equal(out, single)


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
