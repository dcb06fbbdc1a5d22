"""Golden-fixture regression: frozen scenes + frozen oracle outputs.

Catches semantic drift in EITHER the oracle or the JAX decode — the
parity tests alone would pass if both drifted together.
"""

import os

import numpy as np
import pytest

from tfpose_tpu.core.config import DecodeParams
from tfpose_tpu.ops.decode import decode_jit
from tfpose_tpu.oracle import numpy_decoder, numpy_post

FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                   "golden_decode.npz")

pytestmark = pytest.mark.skipif(not os.path.exists(FIX),
                                reason="golden fixtures not generated")


@pytest.fixture(scope="module")
def fixtures():
    return np.load(FIX)


@pytest.mark.parametrize("i", [0, 1, 2])
def test_oracle_matches_golden(fixtures, i):
    net = fixtures[f"net_{i}"]
    peaks, heat, paf = numpy_post.full_post(net, 184, 216)
    res = numpy_decoder.process_paf(peaks, heat, paf, DecodeParams())
    np.testing.assert_allclose(res.parts, fixtures[f"parts_{i}"],
                               atol=1e-4)
    np.testing.assert_allclose(res.scores, fixtures[f"scores_{i}"],
                               atol=1e-4)


@pytest.mark.parametrize("i", [0, 1, 2])
def test_jax_decode_matches_golden(fixtures, i):
    net = fixtures[f"net_{i}"]
    g_parts = fixtures[f"parts_{i}"]
    out = decode_jit(net, 184, 216, DecodeParams())
    coords = np.asarray(out.coords)
    valid = np.asarray(out.part_valid)
    hvalid = np.asarray(out.human_valid)
    assert int(hvalid.sum()) == g_parts.shape[0]
    # match each golden human to a decoded one by part coordinates
    got = []
    for hi in range(coords.shape[0]):
        if not hvalid[hi]:
            continue
        parts = {}
        for p in range(18):
            if valid[hi, p]:
                parts[p] = (int(round(coords[hi, p, 0] * 216)),
                            int(round(coords[hi, p, 1] * 184)))
        got.append(parts)
    for gi in range(g_parts.shape[0]):
        want = {p: (int(g_parts[gi, p, 1]), int(g_parts[gi, p, 2]))
                for p in range(18) if g_parts[gi, p, 0] >= 0}
        assert any(g == want for g in got), f"golden human {gi} missing"
