"""On-device rasterizers vs the NumPy reference implementations."""

import numpy as np

from tfpose_tpu.train import dataset as npds
from tfpose_tpu.train.targets_jax import (
    batch_targets,
    heatmap_targets,
    paf_targets,
)
from tfpose_tpu.utils import synthetic


def _joints(seed, n, h, w, max_people=8):
    rng = np.random.default_rng(seed)
    people = synthetic.random_people(rng, n, h, w, drop_prob=0.1)
    out = np.full((max_people, 18, 2), np.nan)
    out[:n] = people
    return people, out


def test_heatmap_matches_numpy():
    h, w = 24, 32
    people, padded = _joints(0, 2, h, w)
    ref = npds.get_heatmap(people, h, w, sigma=2.0)
    got = np.asarray(heatmap_targets(padded, h, w, sigma=2.0))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_paf_matches_numpy():
    h, w = 24, 32
    people, padded = _joints(1, 3, h, w)
    ref = npds.get_vectormap(people, h, w, threshold=1.5)
    got = np.asarray(paf_targets(padded, h, w, threshold=1.5))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_empty_people():
    padded = np.full((8, 18, 2), np.nan)
    heat = np.asarray(heatmap_targets(padded, 16, 16, sigma=2.0))
    assert heat[:, :, :18].max() == 0.0
    assert np.allclose(heat[:, :, 18], 1.0)
    paf = np.asarray(paf_targets(padded, 16, 16))
    assert paf.max() == 0.0


def test_batched():
    h, w = 16, 16
    _, p0 = _joints(2, 1, h, w)
    _, p1 = _joints(3, 2, h, w)
    out = batch_targets(np.stack([p0, p1]), h, w, sigma=2.0)
    assert out["heat"].shape == (2, h, w, 19)
    assert out["paf"].shape == (2, h, w, 38)
