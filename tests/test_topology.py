"""Topology table sanity (reference tf_pose/common.py constants)."""

import numpy as np

from tfpose_tpu.core import topology as T


def test_counts():
    assert len(T.CocoPairs) == 19
    assert len(T.CocoPairsNetwork) == 19
    assert len(T.CocoPairsRender) == 17
    assert len(T.CocoColors) == 18
    assert T.NUM_OUT_CH == 57


def test_pairs_reference_parts():
    for a, b in T.CocoPairs:
        assert 0 <= a < 18 and 0 <= b < 18


def test_paf_channels_cover_all_38():
    chans = sorted(c for pair in T.CocoPairsNetwork for c in pair)
    assert chans == list(range(38))


def test_paf_channels_are_xy_adjacent():
    for cx, cy in T.CocoPairsNetwork:
        assert cy == cx + 1 and cx % 2 == 0


def test_flip_swap_is_involution():
    swap = np.asarray([int(p) for p in T.FLIP_SWAP])
    assert (swap[swap] == np.arange(18)).all()


def test_coco17_mapping_complete():
    vals = sorted(int(p) for p in T.COCO17_FROM_MODEL18)
    # 17 distinct parts; Neck (1) is the only part without a COCO match
    assert len(set(vals)) == 17
    assert 1 not in vals
