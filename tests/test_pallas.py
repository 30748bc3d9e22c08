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


def test_pallas_mip_phase_matches_xla_interpret():
    """Far-field mip phases (level >= 1): a spike beyond the dense range
    must be caught by the coarse-level reads (regression: pltpu.repeat has
    tile semantics, not elementwise-repeat)."""
    dist = 6000.0
    halo = int(dist / 25) + 16
    inner = 64
    n = inner + 2 * halo
    z = np.zeros((n, n), dtype=np.float32)
    z[halo - 96, halo + 32] = 500.0          # 5.8 km north of cell (136, 32)
    kw = dict(dx=25.0, dy=-25.0, offset=(halo, halo),
              inner_shape=(inner, inner), dist_search=dist, hori_acc=0.25)
    h_pal = pallas_sweep.horizon_sweep_pallas(
        z, azim_num=4, a_chunk=4, tile=(32, 64), interpret=True, **kw)
    azim = (2 * np.pi / 4) * np.arange(4)
    h_ref, _ = sweep.horizon_sweep(z, azim=azim, **kw)
    d = np.rad2deg(np.abs(np.asarray(h_pal) - np.asarray(h_ref)))
    assert d.max() < 0.3, f"max diff {d.max():.3f} deg"


def test_pallas_mask_tile_skipping():
    """Tiles with no unmasked cell are skipped: active tiles match the
    unmasked run exactly; the grid shrinks to the active tile count."""
    z = gaussian_bumps_terrain(96, 96, seed=3, amp=300.0)
    azim_num = 4
    kw = dict(dx=25.0, dy=-25.0, offset=(32, 32), inner_shape=(32, 32),
              dist_search=900.0, hori_acc=0.25, azim_num=azim_num,
              a_chunk=4, tile=(16, 16), interpret=True)
    full = np.asarray(pallas_sweep.horizon_sweep_pallas(z, **kw))
    mask = np.zeros((32, 32), dtype=np.uint8)
    mask[:16, 16:] = 1                     # only tile (0, 1) active
    part = np.asarray(pallas_sweep.horizon_sweep_pallas(z, mask=mask, **kw))
    np.testing.assert_array_equal(part[:16, 16:], full[:16, 16:])
    # tile schedule really is compacted
    tmap = pallas_sweep.tile_schedule((32, 32), (16, 16), mask)
    assert tmap.shape == (1, 2) and tuple(tmap[0]) == (0, 1)
    # PARTIALLY masked tiles: the mask-aware accumulator init starts
    # masked cells at +inf (so skip bounds range over unmasked cells
    # only); unmasked outputs must stay bit-equal to the unmasked run
    mask_p = np.zeros((32, 32), dtype=np.uint8)
    mask_p[::3, ::2] = 1                   # scattered cells in every tile
    part_p = np.asarray(pallas_sweep.horizon_sweep_pallas(
        z, mask=mask_p, **kw))
    sel = mask_p == 1
    np.testing.assert_array_equal(part_p[sel], full[sel])
    # all-masked: defined fill, no kernel launch
    empty = np.asarray(pallas_sweep.horizon_sweep_pallas(
        z, mask=np.zeros((32, 32), np.uint8), **kw))
    assert empty.shape == full.shape


def test_pallas_grad_matches_xla_sweep():
    """jax.grad through the fused kernel (custom VJP, recompute via the
    XLA sweep) vs jax.grad through ops.sweep.horizon_sweep."""
    import jax
    import jax.numpy as jnp

    z = gaussian_bumps_terrain(96, 96, seed=4, amp=300.0)
    azim_num = 4
    azim = (2 * np.pi / azim_num) * np.arange(azim_num)
    kw = dict(dx=25.0, dy=-25.0, offset=(32, 32), inner_shape=(32, 32),
              dist_search=900.0, hori_acc=0.25)

    def loss_pallas(zz):
        h = pallas_sweep.horizon_sweep_pallas(
            zz, azim_num=azim_num, a_chunk=4, tile=(32, 32),
            interpret=True, **kw)
        return jnp.mean(h ** 2)

    def loss_xla(zz):
        h, _ = sweep.horizon_sweep(zz, azim=azim, **kw)
        return jnp.mean(h ** 2)

    gp = np.asarray(jax.grad(loss_pallas)(jnp.asarray(z)))
    gx = np.asarray(jax.grad(loss_xla)(jnp.asarray(z)))
    assert np.isfinite(gp).all() and np.abs(gp).max() > 0.0
    # The winner-replay backward routes the max-subgradient to the single
    # recorded winner; XLA's max-chain splits exact ties.  Near-tie cells
    # may therefore differ by the tied candidates' (equal-value)
    # subgradient difference — an O(1e-6) absolute effect on this terrain.
    np.testing.assert_allclose(gp, gx, atol=2e-6)
    # Stronger, routing-independent check: central finite difference of
    # the pallas loss along a random direction.
    rng = np.random.default_rng(11)
    v = rng.normal(size=z.shape).astype(np.float32)
    eps = 3e-2
    zl = jnp.asarray(z)
    fp = float(loss_pallas(zl + eps * v))
    fm = float(loss_pallas(zl - eps * v))
    fd = (fp - fm) / (2 * eps)
    an = float(np.sum(gp * v))
    assert abs(fd - an) < 3e-3 * max(1.0, abs(an)), (fd, an)


def test_pallas_grad_tilt_ramp():
    """Gradients also flow to the tilt-ramp fields (curved fast path)."""
    import jax
    import jax.numpy as jnp

    z = gaussian_bumps_terrain(64, 64, seed=6, amp=200.0)
    ramp = np.full((16, 16), 1e-4, np.float32)

    def loss(zz, ra, rb):
        h = pallas_sweep.horizon_sweep_pallas(
            zz, dx=25.0, dy=-25.0, offset=(24, 24), inner_shape=(16, 16),
            azim_num=4, a_chunk=4, dist_search=400.0, tile=(16, 16),
            tilt_ramp=(ra, rb), interpret=True)
        return jnp.mean(h)

    gz, ga, gb = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(z), jnp.asarray(ramp), jnp.asarray(ramp))
    assert np.isfinite(np.asarray(gz)).all()
    assert np.abs(np.asarray(ga)).max() > 0.0
    assert np.abs(np.asarray(gb)).max() > 0.0


def test_pallas_shadow_metric_interpret():
    """Shadow occlusion metric (pallas) vs ops.sweep.shadow_metric."""
    import jax.numpy as jnp

    z = gaussian_bumps_terrain(128, 128, seed=5, amp=400.0)
    n = z.shape[0]
    off = (32, 32)
    inner = (64, 64)
    dx, dy = 25.0, -25.0
    diag = float(np.hypot(n * dx, n * dx))
    schedule = sweep.build_schedule(dx, diag, sweep.default_rel_err(0.25))

    x0, y0 = 0.0, 0.0
    cx = x0 + 0.5 * (n - 1) * dx
    cy = y0 + 0.5 * (n - 1) * dy
    suns = np.array([[cx + 2.0e5, cy + 1.0e5, 2.0e4],
                     [cx - 1.5e5, cy - 0.5e5, 1.2e4],
                     [cx + 0.3e5, cy - 2.0e5, 3.0e4]], dtype=np.float32)

    z_inner = np.asarray(z)[off[0]:off[0] + inner[0],
                            off[1]:off[1] + inner[1]]
    z_org = z_inner + 0.05

    table, near_vert = pallas_sweep.shadow_sun_table(suns, (cx, cy), dx, dy)
    metric_pl = pallas_sweep.shadow_metric_pallas(
        z, z_org, z_inner, table, schedule=schedule, offset=off,
        inner_shape=inner, dx=dx, dy=dy, grid_origin=(x0, y0),
        tile=(32, 64), t_chunk=1, interpret=True)
    assert not near_vert.any()

    # XLA reference: per-cell slope from the same geometry
    xr = (x0 + np.arange(off[1], off[1] + inner[1]) * dx)[None, :]
    yr = (y0 + np.arange(off[0], off[0] + inner[0]) * dy)[:, None]
    xr = np.broadcast_to(xr, inner).astype(np.float32)
    yr = np.broadcast_to(yr, inner).astype(np.float32)
    for t, sun in enumerate(suns):
        sxr = sun[0] - xr
        syr = sun[1] - yr
        szr = sun[2] - z_org
        mag = np.sqrt(sxr ** 2 + syr ** 2 + szr ** 2)
        kx, ky = sun[0] - cx, sun[1] - cy
        k_norm = np.hypot(kx, ky)
        kx_u, ky_u = kx / k_norm, ky / k_norm
        adv = (sxr * kx_u + syr * ky_u) / mag
        m = (szr / mag) / np.maximum(adv, 1e-4)
        u_cells = np.array([ky_u / dy, kx_u / dx], dtype=np.float32)
        metric_ref = sweep.shadow_metric(
            jnp.asarray(z), jnp.asarray(z_org), jnp.asarray(z_inner),
            jnp.asarray(m), u_cells, schedule, off, inner)
        occ_pl = np.asarray(metric_pl[t]) > 0.0
        occ_ref = np.asarray(metric_ref) > 0.0
        agree = (occ_pl == occ_ref).mean()
        assert agree > 0.99, f"sun {t}: occlusion agreement {agree:.4f}"


def test_pallas_tilt_ramp_matches_general_mode():
    """Curved-Earth fast path: planar kernel + per-(cell, azimuth) tilt
    ramp vs the XLA general (per-cell tangent frame) mode."""
    rng = np.random.default_rng(11)
    n = 128
    z = gaussian_bumps_terrain(n, n, seed=11, amp=400.0)
    # synthetic spherical-cap normals: tilt grows linearly from the centre
    R = 6.371e6
    dx, dy = 25.0, -25.0
    xs = (np.arange(n) - n / 2) * dx
    ys = (np.arange(n) - n / 2) * (-dy)
    xx, yy = np.meshgrid(xs, ys)
    norm = np.stack([-xx / R, -yy / R, np.ones_like(xx)], axis=-1)
    norm /= np.linalg.norm(norm, axis=-1, keepdims=True)
    north = np.stack([np.zeros_like(xx), np.ones_like(xx),
                      yy / R], axis=-1)
    north -= np.sum(north * norm, axis=-1, keepdims=True) * norm
    north /= np.linalg.norm(north, axis=-1, keepdims=True)

    off = (32, 32)
    inner = (64, 64)
    sl = (slice(off[0], off[0] + inner[0]), slice(off[1], off[1] + inner[1]))
    azim_num = 8
    azim = (2 * np.pi / azim_num) * np.arange(azim_num)

    import horayzon_tpu.terrain as _terrain
    geom = _terrain.basis_fields(norm[sl].astype(np.float32),
                                 north[sl].astype(np.float32))
    u_xy = _terrain.mean_marching_directions(
        azim, norm[sl].astype(np.float32), north[sl].astype(np.float32))
    h_gen, _ = sweep.horizon_sweep(
        z, dx=dx, dy=dy, offset=off, inner_shape=inner, azim=azim,
        dist_search=800.0, hori_acc=0.25, geom=geom, u_xy=u_xy)

    ramp_a = (norm[sl][..., 0] / norm[sl][..., 2]).astype(np.float32)
    ramp_b = (norm[sl][..., 1] / norm[sl][..., 2]).astype(np.float32)
    h_pal = pallas_sweep.horizon_sweep_pallas(
        z, dx=dx, dy=dy, offset=off, inner_shape=inner, azim_num=azim_num,
        dist_search=800.0, hori_acc=0.25, tile=(32, 64),
        tilt_ramp=(ramp_a, ramp_b), interpret=True)

    d = np.rad2deg(np.abs(np.asarray(h_pal) - np.asarray(h_gen)))
    assert d.max() < 0.25, f"max diff {d.max():.4f} deg"


def test_pallas_azim_padding_awkward_count():
    """A prime azim_num pads the azimuth axis up to the a_chunk budget
    (extra rows computed and discarded) instead of collapsing a_chunk;
    values must match the same azimuths computed with a_chunk=1."""
    z = gaussian_bumps_terrain(96, 96, seed=3, amp=300.0)
    kw = dict(dx=25.0, dy=-25.0, offset=(32, 32), inner_shape=(32, 32),
              dist_search=900.0, hori_acc=0.25, tile=(32, 32),
              interpret=True)
    h7 = np.asarray(pallas_sweep.horizon_sweep_pallas(
        z, azim_num=7, **kw))                       # padded path
    h7_ref = np.asarray(pallas_sweep.horizon_sweep_pallas(
        z, azim_num=7, a_chunk=1, **kw))            # exact chunking
    assert h7.shape[-1] == 7
    np.testing.assert_array_equal(h7, h7_ref)
    # the plan really pads (budget at (32, 32) tiles is >= 7? the budget
    # is 1 MiB / (32*32*4) = 256 -> capped at azim_num -> no pad needed;
    # force a small budget case via tile (128, 1024) geometry instead)
    a_chunk, azim_pad = pallas_sweep.plan_azim(359, 128, 1024)
    assert azim_pad % a_chunk == 0 and azim_pad >= 359
    assert a_chunk == min(359, max(1, (1 << 20) // (128 * 1024 * 4)))


def test_pallas_grad_far_field_winners():
    """Gradient correctness when winners sit in the MIP far field and at
    the dense/mip id boundary (regression: position-merged d1 backward
    must not interpret mip point ids 2m+1 with m >= n_dense as quads)."""
    import jax
    import jax.numpy as jnp

    dist = 6000.0
    halo = int(dist / 25) + 16
    inner = 32
    n = inner + 2 * halo
    z = np.zeros((n, n), dtype=np.float32)
    z[halo - 96, halo + 16] = 500.0     # far-field spike -> mip winners
    z[halo - 150, halo + 8] = 400.0
    zj = jnp.asarray(z)
    kw = dict(dx=25.0, dy=-25.0, offset=(halo, halo),
              inner_shape=(inner, inner), dist_search=dist, hori_acc=0.25,
              azim_num=4, a_chunk=4, tile=(32, 32), interpret=True)

    def loss(zz):
        return jnp.mean(pallas_sweep.horizon_sweep_pallas(zz, **kw) ** 2)

    g = jax.grad(loss)(zj)
    gn = np.asarray(g)
    assert np.isfinite(gn).all()
    # the far spike must carry gradient (its 2x2 max-pool block)
    assert np.abs(gn[halo - 97:halo - 95, halo + 15:halo + 18]).max() > 0
    # replay must equal the recompute VJP here (finite differences are
    # below f32 loss noise at this gradient magnitude): the id-collision
    # bug this guards against produced gradients 6 orders too large
    import os
    os.environ["HZT_GRAD_RECOMPUTE"] = "1"
    try:
        g_rc = np.asarray(jax.grad(loss)(zj))
    finally:
        del os.environ["HZT_GRAD_RECOMPUTE"]
    np.testing.assert_allclose(gn, g_rc, atol=5e-9)
    assert abs(np.linalg.norm(gn) / np.linalg.norm(g_rc) - 1.0) < 1e-3
