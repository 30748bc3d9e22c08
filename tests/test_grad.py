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


def _make_terrain_obj(z, in0=24, in1=24, off=12):
    """Planar Terrain over a synthetic DEM (vert_grid convention)."""
    from horayzon_tpu import auxiliary, shadow

    h, w = z.shape
    dx = 25.0
    x = np.arange(w, dtype=np.float32) * dx
    y = -np.arange(h, dtype=np.float32) * dx
    xx, yy = np.meshgrid(x, y)
    vert_grid = auxiliary.rearrange_pad_buffer(xx, yy, z)
    vec = np.zeros((in0, in1, 3), np.float32)
    vec[..., 2] = 1.0
    t = shadow.Terrain()
    t.initialise(vert_grid, h, w, off, off, vec, vec,
                 np.ones((in0, in1), np.float32),
                 z[off:off + in0, off:off + in1],
                 np.ones((in0, in1), np.uint8), engine="sweep")
    return t


def test_sw_dir_cor_soft_matches_hard_forward():
    """straight_through soft occlusion must not change hard values
    (VERDICT round 3 item 3: shadow_comp.cpp:561-596 semantics kept)."""
    z = gaussian_bumps_terrain(48, 48, seed=3, amp=250.0)
    t = _make_terrain_obj(z)
    sun = np.array([3.0e5, -2.0e5, 2.0e4], np.float32)
    hard = t.sw_dir_cor(sun)
    soft_st = np.asarray(t.sw_dir_cor_soft(sun, soft_tau=2.0,
                                           straight_through=True))
    np.testing.assert_array_equal(soft_st, hard)
    # batch form
    suns = np.stack([sun, sun * np.array([-1.0, 1.0, 1.0], np.float32)])
    hard_b = t.sw_dir_cor_batch(suns)
    soft_b = np.asarray(t.sw_dir_cor_soft(suns, soft_tau=2.0))
    np.testing.assert_array_equal(soft_b, hard_b)


def test_sw_dir_cor_soft_gradient_finite_difference():
    """d mean(soft sw_dir_cor) / d elevation vs central finite difference
    of the softened loss (SURVEY.md section 7 step 8)."""
    z = gaussian_bumps_terrain(48, 48, seed=5, amp=250.0)
    t = _make_terrain_obj(z)
    sun = jnp.asarray([3.0e5, -2.0e5, 1.5e4], jnp.float32)

    def loss(zz):
        out = t.sw_dir_cor_soft(sun, elevation=zz, soft_tau=8.0,
                                straight_through=False)
        return jnp.mean(out)

    z0 = jnp.asarray(z)
    g = jax.grad(loss)(z0)
    g_np = np.asarray(g)
    assert np.isfinite(g_np).all() and np.abs(g_np).max() > 0.0
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal(z.shape).astype(np.float32))
    directional = float(jnp.vdot(g, v))
    eps = 0.05
    fd = (float(loss(z0 + eps * v)) - float(loss(z0 - eps * v))) / (2 * eps)
    assert abs(directional - fd) < 0.05 * (abs(fd) + abs(directional)) + 1e-6
