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


def _make_terrain_pallas(z, in0=24, in1=24, off=12):
    """Planar Terrain on the fused Pallas engine (interpret-able): the
    outer DEM is wide enough to pad the inner block to kernel tile
    multiples."""
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
                 np.ones((in0, in1), np.uint8), engine="pallas")
    return t


def test_sw_dir_cor_soft_pallas_matches_hard_forward():
    """Pallas-engine straight-through soft sw_dir_cor: forward values
    equal the hard Pallas result bit-for-bit (the exact-metric argmax
    forward thresholds to the same occlusion signs as the sign-exact
    production forward)."""
    z = gaussian_bumps_terrain(160, 160, seed=3, amp=250.0)
    t = _make_terrain_pallas(z)
    sun = np.array([3.0e5, -2.0e5, 2.0e4], np.float32)
    suns = np.stack([sun, sun * np.array([-1.0, 1.0, 0.75], np.float32)])
    hard = np.asarray(t._run_pallas(suns, "sw_dir_cor", interpret=True))
    soft_st = np.asarray(t.sw_dir_cor_soft(suns, soft_tau=2.0,
                                           straight_through=True,
                                           interpret=True))
    np.testing.assert_array_equal(soft_st, hard)


def test_sw_dir_cor_soft_pallas_gradient_finite_difference():
    """Winner-replay gradient of the Pallas shadow metric vs finite
    differences.  The metric is a point-sampled running max whose
    clearance races are decided at centimetre scale, so a fixed-eps
    central difference cannot equal the subgradient; instead assert the
    exact kink structure: at a winner cell the one-sided slopes bracket
    the analytic value (raising a winner keeps it winning -> forward
    slope >= subgradient; lowering loses races -> backward slope <=),
    and the central difference converges toward it as eps shrinks."""
    from horayzon_tpu.ops import pallas_sweep as _pallas
    from horayzon_tpu.shadow import _RAY_ORG_ELEV

    z = gaussian_bumps_terrain(160, 160, seed=5, amp=250.0)
    t = _make_terrain_pallas(z)
    sun = np.asarray([[3.0e5, -2.0e5, 1.5e4]], np.float32)
    table, _ = _pallas.shadow_sun_table(sun, t._pallas_center,
                                        t.grid.dx, t.grid.dy)
    c0, c1 = t.comp_shape
    p0, p1 = t._pallas_shape

    def loss(zz):
        z_inner_r = jax.lax.dynamic_slice(zz, t.offset, t.comp_shape)
        z_org_r = z_inner_r + _RAY_ORG_ELEV
        zorg_pad = jnp.pad(z_org_r, ((0, p0 - c0), (0, p1 - c1)),
                           mode="edge")
        zin_pad = jnp.pad(z_inner_r, ((0, p0 - c0), (0, p1 - c1)),
                          mode="edge")
        met = _pallas.shadow_metric_pallas_diff(
            zz, zorg_pad, zin_pad, table, schedule=t.schedule,
            offset=t.offset, inner_shape=t._pallas_shape, dx=t.grid.dx,
            dy=t.grid.dy, grid_origin=t._grid_origin,
            tile=t._pallas_tile, interpret=True)
        return jnp.sum(met[0, :c0, :c1])

    z0 = jnp.asarray(z)
    g = jax.grad(loss)(z0)
    g_np = np.asarray(g)
    assert np.isfinite(g_np).all() and np.abs(g_np).max() > 0.0
    l0 = float(loss(z0))
    flat = np.argsort(np.abs(g_np).ravel())[::-1]
    for idx in flat[:4]:
        ci, cj = np.unravel_index(idx, g_np.shape)
        an = float(g[ci, cj])
        e = jnp.zeros_like(z0).at[ci, cj].set(np.sign(an) or 1.0)
        eps = 0.25
        fwd = (float(loss(z0 + eps * e)) - l0) / eps
        bwd = (l0 - float(loss(z0 - eps * e))) / eps
        an_s = an * np.sign(an)
        slack = 0.05 * (abs(fwd) + abs(bwd)) + 1e-6
        assert bwd - slack <= an_s <= fwd + slack, (
            (ci, cj), bwd, an_s, fwd)
        # central differences converge toward the subgradient
        fds = [(float(loss(z0 + h * e)) - float(loss(z0 - h * e)))
               / (2 * h) for h in (0.5, 0.05)]
        assert abs(fds[1] - an_s) < abs(fds[0] - an_s) + slack, (
            (ci, cj), fds, an_s)

    # and the sw_dir_cor_soft API end-to-end: gradient finite + nonzero,
    # sun-facing slopes gain from clearing terrain (sign structure)
    sun_v = jnp.asarray(sun[0])

    def loss_api(zz):
        out = t.sw_dir_cor_soft(sun_v, elevation=zz, soft_tau=8.0,
                                straight_through=False, interpret=True)
        return jnp.mean(out)

    g2 = np.asarray(jax.grad(loss_api)(z0))
    assert np.isfinite(g2).all() and np.abs(g2).max() > 0.0
    assert g2.min() < 0.0 < g2.max()
