import numpy as np

from horayzon_tpu.models import PlanarPipeline

from reference_impl import gaussian_bumps_terrain


def test_planar_pipeline_end_to_end():
    n, dx = 120, 25.0
    z = gaussian_bumps_terrain(n, n, seed=4, amp=400.0)
    x = np.arange(n, dtype=np.float32) * dx
    y = (n - 1 - np.arange(n, dtype=np.float32)) * dx  # descending
    pad = 500.0
    domain = {"x_min": float(x.min()) + pad, "x_max": float(x.max()) - pad,
              "y_min": float(y.min()) + pad, "y_max": float(y.max()) - pad}
    pipe = PlanarPipeline(x, y, z, domain, dist_search=0.4, azim_num=12)
    out = pipe.run()
    in_shape = out["svf"].shape
    assert out["hori"].shape == in_shape + (12,)
    assert np.isfinite(out["svf"]).all()
    assert (out["svf"] > 0.3).all() and (out["svf"] <= 1.001).all()
    assert out["slope"].shape == in_shape
    assert (out["aspect"] >= 0).all() and (out["aspect"] <= 2 * np.pi).all()
    assert out["x"].shape[0] == in_shape[1]
    assert out["y"].shape[0] == in_shape[0]


def test_planar_pipeline_with_mask():
    n, dx = 80, 25.0
    z = np.zeros((n, n), dtype=np.float32)
    x = np.arange(n, dtype=np.float32) * dx
    y = (n - 1 - np.arange(n, dtype=np.float32)) * dx
    pad = 400.0
    domain = {"x_min": float(x.min()) + pad, "x_max": float(x.max()) - pad,
              "y_min": float(y.min()) + pad, "y_max": float(y.max()) - pad}
    pipe = PlanarPipeline(x, y, z, domain, dist_search=0.3, azim_num=8)
    in0 = pipe.slice_in[0].stop - pipe.slice_in[0].start
    in1 = pipe.slice_in[1].stop - pipe.slice_in[1].start
    mask = np.ones((in0, in1), dtype=np.uint8)
    mask[:5] = 0
    out = pipe.run(mask=mask)
    assert np.allclose(out["hori"][:5], 0.0)


def test_terrain_fit_gradient_example_smoke():
    """The differentiable-workflow example runs end-to-end (few steps —
    the full recovery assertions run at its default step count)."""
    import os
    import subprocess
    import sys
    import tempfile

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "horizon", "terrain_fit_gradient.py")
    with tempfile.TemporaryDirectory() as td:
        out = subprocess.run(
            [sys.executable, path, "--steps", "4", "--out", td],
            capture_output=True, text=True, timeout=560,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        assert out.returncode == 0, out.stderr[-2000:]
        assert "saved:" in out.stdout
