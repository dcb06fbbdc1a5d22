"""Native C++ decoder vs NumPy oracle parity (both reimplement the
reference pafprocess semantics; they must agree exactly)."""

import numpy as np
import pytest

from tfpose_tpu.core.config import DecodeParams
from tfpose_tpu.oracle import numpy_decoder, numpy_post
from tfpose_tpu.utils import synthetic

cpp = pytest.importorskip("tfpose_tpu.oracle.cpp")


@pytest.mark.parametrize("seed,n_people,noise",
                         [(0, 1, 0.0), (1, 2, 0.0), (2, 3, 0.01),
                          (3, 4, 0.02)])
def test_cpp_matches_numpy_oracle(seed, n_people, noise):
    rng = np.random.default_rng(seed)
    net, _ = synthetic.render_scene(rng, n_people, 46, 54, noise=noise)
    peaks, heat, paf = numpy_post.full_post(net, 184, 216)
    params = DecodeParams()
    ref = numpy_decoder.process_paf(peaks, heat, paf, params)
    parts, scores = cpp.process_paf(
        peaks.astype(np.float32), heat.astype(np.float32),
        paf.astype(np.float32))
    assert parts.shape[0] == ref.parts.shape[0]
    # float32 casting can move candidates at threshold edges, so use a
    # tolerance on scores but exact match on structure/coords
    np.testing.assert_array_equal(parts[:, :, 0] >= 0,
                                  ref.parts[:, :, 0] >= 0)
    np.testing.assert_allclose(parts[:, :, 1:3], ref.parts[:, :, 1:3],
                               atol=0)
    np.testing.assert_allclose(scores, ref.scores, atol=1e-4)


def test_cpp_empty():
    peaks = np.zeros((46, 54, 19), np.float32)
    paf = np.zeros((46, 54, 38), np.float32)
    parts, scores = cpp.process_paf(peaks, peaks, paf)
    assert parts.shape[0] == 0
