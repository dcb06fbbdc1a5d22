"""Dynamic micro-batching (serving/batcher.py): coalescing, padding,
error propagation, and the batched TCP service end-to-end."""

import threading
import time

import numpy as np
import pytest

from tfpose_tpu.core.types import BodyPart, Human
from tfpose_tpu.serving import PoseClient, PoseService
from tfpose_tpu.serving.batcher import DynamicBatcher


class FakeEstimator:
    """Returns one Human per image whose x encodes the image's first
    pixel value, so results can be matched back to requests."""

    def __init__(self, delay=0.0):
        self.batches = []
        self.delay = delay

    def inference_batch(self, imgs, upsample_size=1.0):
        self.batches.append(len(imgs))
        if self.delay:
            time.sleep(self.delay)
        out = []
        for im in imgs:
            h = Human()
            tag = float(im[0, 0, 0]) / 255.0
            h.body_parts[0] = BodyPart("0-0", 0, tag, 0.5, 0.9)
            out.append([h])
        return out


def _img(tag, h=8, w=8):
    return np.full((h, w, 3), tag, np.uint8)


def test_batcher_coalesces_and_routes_results():
    est = FakeEstimator(delay=0.02)
    b = DynamicBatcher(est, max_batch=4, max_wait_ms=50.0)
    try:
        futs = [b.submit(_img(t)) for t in (10, 20, 30, 40, 50, 60)]
        got = [f.result(timeout=10.0) for f in futs]
        # every request got ITS OWN result, in submit order
        for tag, humans in zip((10, 20, 30, 40, 50, 60), got):
            assert len(humans) == 1
            assert humans[0].body_parts[0].x == pytest.approx(tag / 255)
        # padding: every device batch is exactly max_batch
        assert all(n == 4 for n in est.batches)
        # coalescing happened (6 requests in <= 3 padded batches)
        assert len(est.batches) <= 3
        assert sum(b.batch_sizes.keys()) >= 2  # some batch held > 1
    finally:
        b.stop()


def test_batcher_single_request_pads_and_resolves():
    est = FakeEstimator()
    b = DynamicBatcher(est, max_batch=8, max_wait_ms=1.0)
    try:
        humans = b.submit(_img(99)).result(timeout=10.0)
        assert humans[0].body_parts[0].x == pytest.approx(99 / 255)
        assert est.batches == [8]  # padded to the compiled shape
        assert b.batch_sizes == {1: 1}
    finally:
        b.stop()


def test_batcher_no_padding_mode():
    est = FakeEstimator()
    b = DynamicBatcher(est, max_batch=8, max_wait_ms=1.0,
                       pad_to_max=False)
    try:
        b.submit(_img(1)).result(timeout=10.0)
        assert est.batches == [1]
    finally:
        b.stop()


def test_batcher_propagates_estimator_errors():
    class Boom:
        def inference_batch(self, imgs, upsample_size=1.0):
            raise RuntimeError("device on fire")

    b = DynamicBatcher(Boom(), max_batch=2, max_wait_ms=1.0)
    try:
        fut = b.submit(_img(1))
        with pytest.raises(RuntimeError, match="device on fire"):
            fut.result(timeout=10.0)
    finally:
        b.stop()


def test_batcher_stop_fails_pending_and_rejects_new():
    est = FakeEstimator()
    b = DynamicBatcher(est, max_batch=2, max_wait_ms=1.0)
    b.stop()
    with pytest.raises(RuntimeError):
        b.submit(_img(1))


def test_pose_service_with_dynamic_batching():
    """Concurrent TCP clients share device batches; each still gets
    its own answer (real estimator, tiny input)."""
    from tfpose_tpu.estimator import TfPoseEstimator

    e = TfPoseEstimator("mobilenet_thin", target_size=(96, 80))
    svc = PoseService(e, port=0, upsample_size=2.0, max_batch=4,
                      max_wait_ms=100.0)
    host, port = svc.start()
    results = {}
    errors = []

    def one(i):
        try:
            c = PoseClient(host, port)
            img = np.random.default_rng(i).integers(
                0, 255, (80, 96, 3), np.uint8)
            results[i] = c.infer_raw(img)
            c.close()
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    try:
        # warm the compiled b=4 pipeline once, then race 4 clients
        one(0)
        threads = [threading.Thread(target=one, args=(i,))
                   for i in range(1, 5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors
        assert set(results) == {0, 1, 2, 3, 4}
        for msg in results.values():
            assert msg.image_w == 96 and msg.image_h == 80
        sizes = svc._batcher.batch_sizes
        assert sum(k * v for k, v in sizes.items()) == 5
    finally:
        svc.stop()
