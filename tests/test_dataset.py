"""Training data layer tests: COCO parsing, rasterizers, augmentation."""

import json
import os

import numpy as np
import pytest

from tfpose_tpu.train import augment as aug
from tfpose_tpu.train.dataset import (
    coco_to_18,
    get_heatmap,
    get_vectormap,
    load_coco_annotations,
)


def test_coco_to_18_neck_midpoint():
    kp = np.zeros((17, 3))
    kp[5] = [10, 20, 2]   # left shoulder
    kp[6] = [30, 40, 2]   # right shoulder
    out = coco_to_18(kp.flatten().tolist())
    np.testing.assert_allclose(out[1], [20, 30])  # neck midpoint
    np.testing.assert_allclose(out[2], [30, 40])  # RShoulder from coco 6
    assert np.isnan(out[0, 0])  # nose missing


def test_heatmap_peak_at_joint():
    joints = np.full((1, 18, 2), np.nan)
    joints[0, 0] = [10.0, 6.0]
    heat = get_heatmap(joints, 24, 32, sigma=2.0)
    assert heat.shape == (24, 32, 19)
    y, x = np.unravel_index(heat[:, :, 0].argmax(), (24, 32))
    assert (y, x) == (6, 10)
    assert heat[6, 10, 0] == pytest.approx(1.0)
    # background complements the max
    assert heat[6, 10, 18] == pytest.approx(0.0, abs=1e-6)


def test_vectormap_direction():
    joints = np.full((1, 18, 2), np.nan)
    joints[0, 1] = [4.0, 10.0]   # neck
    joints[0, 2] = [16.0, 10.0]  # rshoulder: pair 0 = (1, 2), channels (12, 13)
    vec = get_vectormap(joints, 20, 24, threshold=1.0)
    assert vec.shape == (20, 24, 38)
    # along the horizontal limb the x-channel is 1, y-channel 0
    assert vec[10, 10, 12] == pytest.approx(1.0)
    assert vec[10, 10, 13] == pytest.approx(0.0)
    # far away: zero
    assert vec[0, 0, 12] == 0.0


def test_vectormap_overlap_normalised():
    joints = np.full((2, 18, 2), np.nan)
    for p in range(2):  # two identical limbs -> count-normalised to 1
        joints[p, 1] = [4.0, 10.0]
        joints[p, 2] = [16.0, 10.0]
    vec = get_vectormap(joints, 20, 24, threshold=1.0)
    assert vec[10, 10, 12] == pytest.approx(1.0)


def test_flip_swaps_parts():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 40, 3), np.uint8)
    joints = np.full((1, 18, 2), np.nan)
    joints[0, 2] = [5.0, 10.0]   # RShoulder
    # force flip by trying until it happens (prob 0.5)
    for seed in range(20):
        r = np.random.default_rng(seed)
        img2, j2 = aug.random_flip(img, joints, r)
        if not np.isnan(j2[0, 5, 0]):
            assert j2[0, 5, 0] == 40 - 1 - 5.0  # now LShoulder
            assert np.isnan(j2[0, 2, 0])
            return
    pytest.fail("flip never triggered")


def test_augment_chain_output_size():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (120, 160, 3), np.uint8)
    joints = np.stack([np.stack([np.linspace(10, 100, 18),
                                 np.linspace(10, 100, 18)], 1)])
    out_img, out_j = aug.augment(img, joints, (64, 48), rng)
    assert out_img.shape == (48, 64, 3)
    assert out_j.shape == (1, 18, 2)


def test_load_coco_annotations(tmp_path):
    coco = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 100,
                    "height": 80}],
        "annotations": [{
            "image_id": 1, "num_keypoints": 3, "iscrowd": 0,
            "keypoints": ([10, 10, 2] + [0, 0, 0] * 4
                          + [20, 20, 2, 30, 20, 2] + [0, 0, 0] * 10),
            "area": 500.0,
        }],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(coco))
    anns = load_coco_annotations(str(p), str(tmp_path))
    assert len(anns) == 1
    assert anns[0].width == 100
    assert anns[0].joints.shape == (1, 18, 2)


def test_pose_dataset_seed_varies_epochs(tmp_path):
    """Different seeds must produce different augmentations/order —
    train.py advances the seed per epoch so epochs don't replay
    identical batches (a fixed seed silently killed augmentation
    diversity across epochs)."""
    import cv2

    from tfpose_tpu.train.dataset import Annotation, PoseDataset
    from tfpose_tpu.utils import synthetic

    rng = np.random.default_rng(0)
    anns = []
    for i in range(4):
        people = synthetic.random_people(
            rng, 2, 64, 64, template=synthetic.SPREAD_TEMPLATE)
        img = synthetic.render_image(people, 64, 64, rng)
        p = str(tmp_path / f"e{i}.png")
        cv2.imwrite(p, img)
        anns.append(Annotation(img_path=p, width=64, height=64,
                               joints=people.astype(np.float64)))

    kw = dict(input_size=(64, 64), batch_size=4, augment=True)
    b0 = next(iter(PoseDataset(anns, seed=0, **kw)))
    b0_again = next(iter(PoseDataset(anns, seed=0, **kw)))
    b1 = next(iter(PoseDataset(anns, seed=1, **kw)))
    # deterministic per seed...
    np.testing.assert_array_equal(b0["image"], b0_again["image"])
    # ...but different across seeds (epochs)
    assert not np.array_equal(b0["image"], b1["image"])
