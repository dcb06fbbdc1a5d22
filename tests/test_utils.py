"""Utility tests: MPII conversion, image quantization, profiling,
draw, imload."""

import numpy as np

from tfpose_tpu.core.topology import MPIIPart, mpii_from_coco
from tfpose_tpu.core.types import BodyPart, Human


def _human():
    h = Human()
    for idx, (x, y) in enumerate([(0.5, 0.1), (0.5, 0.2), (0.4, 0.2)]):
        h.body_parts[idx] = BodyPart(f"0-{idx}", idx, x, y, 0.9)
    return h


def test_mpii_from_coco():
    pairs = mpii_from_coco(_human())
    mpii_parts = [p for p, _ in pairs]
    assert MPIIPart.Head in mpii_parts       # from Nose
    assert MPIIPart.Neck in mpii_parts
    assert MPIIPart.RShoulder in mpii_parts
    assert MPIIPart.LAnkle not in mpii_parts


def test_quantize_img():
    from tfpose_tpu.estimator import TfPoseEstimator

    img = np.arange(256, dtype=np.uint8).reshape(16, 16, 1).repeat(3, 2)
    q8 = TfPoseEstimator._quantize_img(img, bits=8)
    np.testing.assert_array_equal(q8, img)  # 8 bits is lossless
    q2 = TfPoseEstimator._quantize_img(img, bits=2)
    assert len(np.unique(q2)) <= 4


def test_stage_timer():
    from tfpose_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()


def test_imload_missing_file():
    from tfpose_tpu.utils.imload import read_imgfile

    assert read_imgfile("/nonexistent/nope.jpg") is None


def test_sample_images_load():
    from tfpose_tpu.utils.imload import get_sample_images

    imgs = get_sample_images(96, 80)
    assert len(imgs) >= 4
    assert all(im.shape == (80, 96, 3) for im in imgs)


def test_profiler_trace_writes_files(tmp_path):
    import jax.numpy as jnp

    from tfpose_tpu.utils.profiling import trace

    with trace(str(tmp_path)):
        (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    import os
    files = [os.path.join(dp, f) for dp, _, fs in os.walk(tmp_path)
             for f in fs]
    assert files, "no trace files written"
