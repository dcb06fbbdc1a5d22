"""Evaluation tests: COCO json mapping + self-contained OKS AP."""

import numpy as np

from tfpose_tpu.core.types import BodyPart, Human
from tfpose_tpu.evaluation.coco_eval import (
    evaluate_oks_ap,
    humans_to_detections,
    oks,
    write_coco_json,
)


def _human_from_kp17(kp17, w, h):
    """Build a Human whose COCO-17 keypoints are kp17."""
    from tfpose_tpu.core.topology import COCO17_FROM_MODEL18
    human = Human()
    for coco_id, (x, y) in enumerate(kp17):
        part = int(COCO17_FROM_MODEL18[coco_id])
        human.body_parts[part] = BodyPart(
            f"0-{part}", part, x / w, y / h, 0.9)
    human.score = 1.0
    return human


def test_write_coco_json_roundtrip():
    rng = np.random.default_rng(0)
    kp17 = rng.uniform(10, 100, (17, 2))
    human = _human_from_kp17(kp17, 640, 480)
    out = write_coco_json(human, 640, 480)
    assert len(out) == 51
    got = np.asarray(out).reshape(17, 3)
    np.testing.assert_allclose(got[:, :2], kp17, atol=1e-2)
    assert (got[:, 2] == 2).all()


def test_missing_parts_zeroed():
    human = Human()
    human.body_parts[0] = BodyPart("0-0", 0, 0.5, 0.5, 0.9)  # nose only
    out = np.asarray(write_coco_json(human, 100, 100)).reshape(17, 3)
    assert out[0, 2] == 2  # nose present
    assert (out[1:, 2] == 0).all()


def test_oks_perfect_match():
    kp = np.concatenate([np.random.default_rng(1).uniform(0, 100, (17, 2)),
                         np.full((17, 1), 2)], axis=1)
    assert oks(kp, 2500.0, kp) == 1.0


def test_ap_perfect_detections():
    rng = np.random.default_rng(2)
    gts, dets = {}, []
    for img_id in range(5):
        kp = np.concatenate([rng.uniform(50, 400, (17, 2)),
                             np.full((17, 1), 2)], axis=1)
        gts[img_id] = [{"keypoints": kp.flatten().tolist(),
                        "area": 350.0 * 350.0}]
        human = _human_from_kp17(kp[:, :2], 640, 480)
        dets.extend(humans_to_detections([human], img_id, 640, 480))
    stats = evaluate_oks_ap(gts, dets)
    assert stats["AP"] > 0.99
    assert stats["AP50"] > 0.99


def test_ap_no_detections():
    gts = {0: [{"keypoints": [10, 10, 2] * 17, "area": 100.0}]}
    stats = evaluate_oks_ap(gts, [])
    assert stats["AP"] == 0.0


def test_ap_jittered_detections_mid_range():
    """Detections off by a moderate OKS distance score between AP50
    and AP75-ish — sanity that thresholds discriminate."""
    rng = np.random.default_rng(3)
    gts, dets = {}, []
    for img_id in range(8):
        kp = np.concatenate([rng.uniform(100, 400, (17, 2)),
                             np.full((17, 1), 2)], axis=1)
        area = 300.0 * 300.0
        gts[img_id] = [{"keypoints": kp.flatten().tolist(), "area": area}]
        noisy = kp[:, :2] + rng.normal(0, 18.0, (17, 2))
        human = _human_from_kp17(noisy, 640, 480)
        dets.extend(humans_to_detections([human], img_id, 640, 480))
    stats = evaluate_oks_ap(gts, dets)
    assert 0.05 < stats["AP"] < 0.95
    assert stats["AP50"] >= stats["AP75"]
