"""Parity of JAX post-processing ops vs the NumPy oracle
(upsample / Gaussian smooth / NMS)."""

import numpy as np

from tfpose_tpu.ops import gaussian, nms, resize
from tfpose_tpu.oracle import numpy_post as oracle
from tfpose_tpu.utils import synthetic


def test_area_resize_weights_rows_sum_to_one():
    for in_s, out_s in [(46, 184), (54, 216), (10, 33), (33, 10)]:
        w = oracle.area_resize_weights(in_s, out_s)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-12)


def test_area_resize_integer_upscale_is_nearest():
    # for integer upscale factors, TF1 resize_area == nearest replication
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, 7, 3))
    out = oracle.area_resize(x, 20, 28)
    expected = np.repeat(np.repeat(x, 4, axis=0), 4, axis=1)
    np.testing.assert_allclose(out, expected, atol=1e-12)


def test_jax_resize_area_matches_oracle():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(46, 54, 57)).astype(np.float32)
    ref = oracle.area_resize(x, 184, 216)
    got = np.asarray(resize.resize_area(x, 184, 216))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_gauss_kernel_properties():
    k2 = oracle.gauss_kernel_2d(25, 3.0)
    assert k2.shape == (25, 25)
    np.testing.assert_allclose(k2.sum(), 1.0, atol=1e-12)
    assert k2[12, 12] == k2.max()
    np.testing.assert_allclose(k2, k2.T, atol=1e-15)


def test_jax_smooth_matches_oracle():
    rng = np.random.default_rng(3)
    x = np.abs(rng.normal(size=(40, 48, 19))).astype(np.float32)
    ref = oracle.smooth(x, 25, 3.0)
    got = np.asarray(gaussian.smooth(x, 25, 3.0))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_jax_nms_matches_oracle():
    rng = np.random.default_rng(4)
    x = np.abs(rng.normal(size=(32, 36, 19))).astype(np.float32)
    ref = oracle.nms_peaks(x)
    got = np.asarray(nms.nms(x))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_full_post_pipeline_parity():
    rng = np.random.default_rng(5)
    net, _ = synthetic.render_scene(rng, 2, 23, 27)
    ref_peaks, ref_heat, ref_paf = oracle.full_post(net, 92, 108)
    from tfpose_tpu.core.config import DecodeParams
    from tfpose_tpu.ops.decode import postprocess
    got_peaks, got_heat, got_paf = postprocess(net, 92, 108, DecodeParams())
    np.testing.assert_allclose(np.asarray(got_heat), ref_heat, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_paf), ref_paf, atol=1e-4)
    # NMS peak positions must agree exactly where scores are not razor-thin
    ref_pos = ref_peaks > 0.05
    got_pos = np.asarray(got_peaks) > 0.05
    assert (ref_pos == got_pos).mean() > 0.9999
