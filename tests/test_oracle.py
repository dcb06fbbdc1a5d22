"""Oracle decoder behavioural tests on synthetic ground-truth scenes."""

import numpy as np

from tfpose_tpu.core.config import DecodeParams
from tfpose_tpu.oracle import numpy_decoder, numpy_post
from tfpose_tpu.utils import synthetic


def _decode_scene(rng, n_people, h=46, w=54, up=4, **kw):
    net, people = synthetic.render_scene(rng, n_people, h, w, **kw)
    peaks, heat, paf = numpy_post.full_post(net, h * up, w * up)
    res = numpy_decoder.process_paf(peaks, heat, paf)
    return res, people, (h * up, w * up)


def test_single_person_recovered():
    rng = np.random.default_rng(10)
    res, people, (uh, uw) = _decode_scene(rng, 1)
    assert len(res.subset) == 1
    parts = res.parts[0]
    found = parts[:, 0] >= 0
    assert found.sum() >= 15
    # keypoints land near the (upsampled) ground truth
    for p in range(18):
        if not found[p]:
            continue
        gx, gy = people[0, p] * 4  # upsample factor
        assert abs(parts[p, 1] - gx) <= 4.0
        assert abs(parts[p, 2] - gy) <= 4.0


def test_three_people_recovered():
    rng = np.random.default_rng(11)
    res, people, _ = _decode_scene(rng, 3)
    assert len(res.subset) == 3


def test_empty_scene():
    rng = np.random.default_rng(12)
    res, _, _ = _decode_scene(rng, 0)
    assert len(res.subset) == 0


def test_dropped_parts_tolerated():
    rng = np.random.default_rng(13)
    res, _, _ = _decode_scene(rng, 2, drop_prob=0.15)
    assert 1 <= len(res.subset) <= 2


def test_noise_robustness():
    rng = np.random.default_rng(14)
    res, _, _ = _decode_scene(rng, 2, noise=0.01)
    assert len(res.subset) == 2


def test_low_part_count_filtered():
    """A 'person' with only 3 visible parts must be dropped
    (THRESH_PART_CNT = 4)."""
    h, w = 46, 54
    people = synthetic.random_people(np.random.default_rng(15), 1, h, w)
    people[0, 4:] = np.nan  # keep nose, neck, rshoulder, relbow? -> 4 parts
    people[0, 3:] = np.nan  # keep only 3 parts
    heat = synthetic.render_heatmap(people, h, w)
    paf = synthetic.render_paf(people, h, w)
    net = np.concatenate([heat, paf], axis=2).astype(np.float32)
    peaks, heat_up, paf_up = numpy_post.full_post(net, h * 4, w * 4)
    res = numpy_decoder.process_paf(peaks, heat_up, paf_up)
    assert len(res.subset) == 0


def test_scores_positive_and_bounded():
    rng = np.random.default_rng(16)
    res, _, _ = _decode_scene(rng, 2)
    for s in res.scores:
        assert 0.4 <= s  # passed the human-score threshold
