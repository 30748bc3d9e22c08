import numpy as np

from horayzon_tpu import topo_param


def _plane_grid(a=0.3, b=-0.2, n=8, d=10.0):
    x1 = np.arange(n) * d
    y1 = np.arange(n) * d
    x, y = np.meshgrid(x1, y1)
    z = a * x + b * y
    return (x.astype(np.float32), y.astype(np.float32),
            z.astype(np.float32))


def test_slope_plane_meth_inclined_plane():
    a, b = 0.3, -0.2
    x, y, z = _plane_grid(a, b)
    vec = topo_param.slope_plane_meth(x, y, z)
    expect = np.array([-a, -b, 1.0])
    expect = expect / np.linalg.norm(expect)
    assert np.isnan(vec[0, 0]).all()  # border is NaN
    inner = vec[1:-1, 1:-1]
    assert np.allclose(inner, expect, atol=1e-5)


def test_slope_vector_meth_inclined_plane():
    a, b = 0.1, 0.25
    x, y, z = _plane_grid(a, b)
    vec = topo_param.slope_vector_meth(x, y, z)
    expect = np.array([-a, -b, 1.0])
    expect = expect / np.linalg.norm(expect)
    inner = vec[1:-1, 1:-1]
    assert np.allclose(inner, expect, atol=1e-5)


def test_slope_methods_agree_on_smooth_terrain():
    n, d = 12, 25.0
    x1 = np.arange(n) * d
    x, y = np.meshgrid(x1, x1)
    z = (100.0 * np.sin(x / 150.0) * np.cos(y / 200.0)).astype(np.float32)
    v1 = topo_param.slope_plane_meth(x.astype(np.float32),
                                     y.astype(np.float32), z)
    v2 = topo_param.slope_vector_meth(x.astype(np.float32),
                                      y.astype(np.float32), z)
    dots = np.sum(v1[1:-1, 1:-1] * v2[1:-1, 1:-1], axis=-1)
    assert (dots > 0.999).all()


def test_slope_plane_meth_with_identity_rot():
    x, y, z = _plane_grid()
    rot = np.zeros(x.shape + (3, 3), dtype=np.float32)
    rot[...] = np.eye(3, dtype=np.float32)
    v_no = topo_param.slope_plane_meth(x, y, z)
    v_id = topo_param.slope_plane_meth(x, y, z, rot_mat=rot)
    assert np.allclose(v_no[1:-1, 1:-1], v_id[1:-1, 1:-1], atol=1e-6)


def test_sky_view_factor_flat():
    azim = np.linspace(0, 2 * np.pi, 36, endpoint=False).astype(np.float32)
    hori = np.zeros((4, 5, 36), dtype=np.float32)
    tilt = np.zeros((4, 5, 3), dtype=np.float32)
    tilt[..., 2] = 1.0
    svf = topo_param.sky_view_factor(azim, hori, tilt)
    assert np.allclose(svf, 1.0, atol=1e-5)


def test_sky_view_factor_blocked():
    # Horizon at 90 degrees everywhere -> SVF ~ 0
    azim = np.linspace(0, 2 * np.pi, 36, endpoint=False).astype(np.float32)
    hori = np.full((2, 2, 36), np.pi / 2 - 1e-4, dtype=np.float32)
    tilt = np.zeros((2, 2, 3), dtype=np.float32)
    tilt[..., 2] = 1.0
    svf = topo_param.sky_view_factor(azim, hori, tilt)
    assert np.allclose(svf, 0.0, atol=1e-3)


def test_visible_sky_fraction_flat():
    azim = np.linspace(0, 2 * np.pi, 24, endpoint=False).astype(np.float32)
    hori = np.zeros((3, 3, 24), dtype=np.float32)
    tilt = np.zeros((3, 3, 3), dtype=np.float32)
    tilt[..., 2] = 1.0
    vsf = topo_param.visible_sky_fraction(azim, hori, tilt)
    assert np.allclose(vsf, 1.0, atol=1e-5)


def test_topographic_openness():
    azim = np.linspace(0, 2 * np.pi, 8, endpoint=False).astype(np.float32)
    hori = np.full((2, 2, 8), np.deg2rad(10.0), dtype=np.float32)
    top = topo_param.topographic_openness(azim, hori)
    assert np.allclose(top, np.pi / 2 - np.deg2rad(10.0), atol=1e-6)


def test_surface_enlargement_factor():
    norm = np.zeros((2, 2, 3), dtype=np.float32)
    norm[..., 2] = 1.0
    tilt = np.zeros((2, 2, 3), dtype=np.float32)
    tilt[..., 2] = np.cos(np.deg2rad(60.0))
    tilt[..., 0] = np.sin(np.deg2rad(60.0))
    fac = topo_param.surface_enlargement_factor(norm, tilt)
    assert np.allclose(fac, 2.0, atol=1e-5)


def test_slope_angle_aspect():
    tilt = np.zeros((1, 1, 3), dtype=np.float32)
    tilt[..., 0] = np.sin(np.deg2rad(30.0))   # leaning east
    tilt[..., 2] = np.cos(np.deg2rad(30.0))
    slope, aspect = topo_param.slope_angle_aspect(tilt)
    assert np.allclose(slope, np.deg2rad(30.0), atol=1e-5)
    assert np.allclose(aspect, np.pi / 2, atol=1e-5)  # facing east
