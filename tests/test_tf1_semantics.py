"""Pin our post-processing ops to REAL TF1 op semantics (TF-gated).

The reference post-graph uses tf.image.resize_area, a depthwise-conv
Gaussian smoother, and tf.nn.pool MAX NMS (tf_pose/estimator.py).
These tests compare our JAX ops against the actual TF kernels, so the
"TF1 semantics" claim is machine-checked, not asserted.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from tfpose_tpu.ops import gaussian, nms, resize  # noqa: E402
from tfpose_tpu.oracle import numpy_post  # noqa: E402


def test_resize_area_matches_tf():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 46, 54, 57)).astype(np.float32)
    ref = tf.compat.v1.image.resize_area(
        tf.constant(x), [184, 216], align_corners=False).numpy()[0]
    got = np.asarray(resize.resize_area(x[0], 184, 216))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_resize_area_non_integer_ratio_matches_tf():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 23, 31, 3)).astype(np.float32)
    ref = tf.compat.v1.image.resize_area(
        tf.constant(x), [60, 77], align_corners=False).numpy()[0]
    got = np.asarray(resize.resize_area(x[0], 60, 77))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_smoother_matches_tf_depthwise():
    """Reference Smoother: 25x25 scipy-cdf kernel via depthwise_conv2d."""
    rng = np.random.default_rng(2)
    x = np.abs(rng.normal(size=(1, 40, 48, 19))).astype(np.float32)
    kern2d = numpy_post.gauss_kernel_2d(25, 3.0).astype(np.float32)
    tf_kernel = np.tile(kern2d[:, :, None, None], (1, 1, 19, 1))
    ref = tf.nn.depthwise_conv2d(
        tf.constant(x), tf.constant(tf_kernel), [1, 1, 1, 1],
        "SAME").numpy()[0]
    got = np.asarray(gaussian.smooth(x[0], 25, 3.0))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_nms_matches_tf_pool():
    rng = np.random.default_rng(3)
    x = np.abs(rng.normal(size=(1, 32, 36, 19))).astype(np.float32)
    pooled = tf.nn.pool(tf.constant(x), window_shape=(3, 3),
                        pooling_type="MAX", padding="SAME").numpy()
    ref = np.where(np.equal(x, pooled), x, np.zeros_like(x))[0]
    got = np.asarray(nms.nms(x[0]))
    np.testing.assert_allclose(got, ref, atol=0)
