"""Batched/sharded evaluation sweep tests (hermetic, CPU mesh)."""

import numpy as np

from tfpose_tpu.evaluation.sweep import BatchedEvaluator
from tfpose_tpu.parallel.mesh import make_mesh


def _images(n, h, w):
    rng = np.random.default_rng(0)
    for i in range(n):
        yield i, rng.integers(0, 255, (h, w, 3), np.uint8), (w, h)


def test_batched_evaluator_shapes():
    ev = BatchedEvaluator("mobilenet_thin", (96, 80), batch_size=4,
                          dtype="float32")
    dets = ev.evaluate(_images(6, 80, 96))  # non-multiple of batch
    assert isinstance(dets, list)
    for d in dets:
        assert set(d) == {"image_id", "category_id", "keypoints", "score"}
        assert len(d["keypoints"]) == 51


def test_batched_evaluator_on_mesh():
    mesh = make_mesh(n_data=8, n_spatial=1)
    ev = BatchedEvaluator("mobilenet_thin", (96, 80), batch_size=8,
                          dtype="float32", mesh=mesh)
    with mesh:
        dets = ev.evaluate(_images(8, 80, 96))
    assert isinstance(dets, list)
