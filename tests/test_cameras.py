import jax.numpy as jnp
import numpy as np
import pytest

from instantsfm_tpu.scene import cameras as cm

# representative parameter sets per model (COLMAP order)
MODEL_PARAMS = {
    cm.SIMPLE_PINHOLE: [500.0, 320.0, 240.0],
    cm.PINHOLE: [500.0, 510.0, 320.0, 240.0],
    cm.SIMPLE_RADIAL: [500.0, 320.0, 240.0, 0.05],
    cm.RADIAL: [500.0, 320.0, 240.0, 0.05, -0.01],
    cm.OPENCV: [500.0, 510.0, 320.0, 240.0, 0.05, -0.01, 1e-3, -2e-3],
    cm.OPENCV_FISHEYE: [500.0, 510.0, 320.0, 240.0, 0.02, -0.005, 1e-3, 0.0],
    cm.FULL_OPENCV: [500.0, 510.0, 320.0, 240.0, 0.05, -0.01, 1e-3, -2e-3,
                     0.001, 0.002, -0.001, 0.0005],
    cm.FOV: [500.0, 510.0, 320.0, 240.0, 0.9],
    cm.SIMPLE_RADIAL_FISHEYE: [500.0, 320.0, 240.0, 0.02],
    cm.RADIAL_FISHEYE: [500.0, 320.0, 240.0, 0.02, -0.005],
    cm.THIN_PRISM_FISHEYE: [500.0, 510.0, 320.0, 240.0, 0.02, -0.005, 1e-3,
                            -2e-3, 0.001, 0.0, 5e-4, -5e-4],
}


@pytest.mark.parametrize("model_id", sorted(MODEL_PARAMS))
def test_project_unproject_roundtrip(model_id, rng):
    params = jnp.asarray(cm.pad_params(MODEL_PARAMS[model_id]))
    uv = rng.uniform(-0.25, 0.25, size=(64, 2))  # moderate field of view
    xyz = np.concatenate([uv, np.ones((64, 1))], axis=-1) * rng.uniform(1, 5, (64, 1))
    xy = cm.img_from_cam(model_id, params, jnp.asarray(xyz))
    assert np.all(np.isfinite(np.asarray(xy)))
    uv_back = np.asarray(cm.cam_from_img(model_id, params, xy, num_iters=50))
    np.testing.assert_allclose(uv_back, uv, atol=1e-6)


@pytest.mark.parametrize("model_id", sorted(MODEL_PARAMS))
def test_bearing_is_unit(model_id, rng):
    params = jnp.asarray(cm.pad_params(MODEL_PARAMS[model_id]))
    xy = rng.uniform(100, 500, size=(16, 2))
    b = np.asarray(cm.bearing_from_img(model_id, params, jnp.asarray(xy)))
    np.testing.assert_allclose(np.linalg.norm(b, axis=-1), 1.0, atol=1e-9)


def test_simple_radial_matches_reference_formula(rng):
    """SIMPLE_RADIAL projection must match the reference closed form
    (utils/cost_function.py:49-56): uv * (1 + k r^2) * f + pp."""
    params = jnp.asarray(cm.pad_params(MODEL_PARAMS[cm.SIMPLE_RADIAL]))
    f, cx, cy, k = MODEL_PARAMS[cm.SIMPLE_RADIAL]
    xyz = rng.normal(size=(32, 3)) * np.array([0.2, 0.2, 0]) + np.array([0, 0, 2.0])
    xy = np.asarray(cm.img_from_cam(cm.SIMPLE_RADIAL, params, jnp.asarray(xyz)))
    uv = xyz[:, :2] / xyz[:, 2:]
    r2 = np.sum(uv**2, axis=-1, keepdims=True)
    want = uv * (1 + k * r2) * f + np.array([cx, cy])
    np.testing.assert_allclose(xy, want, rtol=1e-9, atol=1e-7)


def test_pinhole_is_linear(rng):
    params = jnp.asarray(cm.pad_params(MODEL_PARAMS[cm.PINHOLE]))
    xyz = np.array([[0.1, -0.2, 2.0]])
    xy = np.asarray(cm.img_from_cam(cm.PINHOLE, params, jnp.asarray(xyz)))
    np.testing.assert_allclose(
        xy, [[0.05 * 500 + 320, -0.1 * 510 + 240]], atol=1e-6)


def test_calibration_matrix():
    params = jnp.asarray(cm.pad_params(MODEL_PARAMS[cm.OPENCV]))
    K = np.asarray(cm.calibration_matrix(cm.OPENCV, params))
    np.testing.assert_allclose(
        K, [[500, 0, 320], [0, 510, 240], [0, 0, 1]], atol=1e-12)
