"""Reference-API compatibility shims: pafprocess module + PoseEstimator."""

import numpy as np
import pytest

cpp = pytest.importorskip("tfpose_tpu.oracle.cpp")

from tfpose_tpu.compat import pafprocess  # noqa: E402
from tfpose_tpu.estimator import PoseEstimator  # noqa: E402
from tfpose_tpu.oracle import numpy_post  # noqa: E402
from tfpose_tpu.utils import synthetic  # noqa: E402


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(50)
    net, people = synthetic.render_scene(rng, 2, 46, 54)
    peaks, heat, paf = numpy_post.full_post(net, 184, 216)
    return (peaks.astype(np.float32), heat.astype(np.float32),
            paf.astype(np.float32), people)


def test_pafprocess_api(scene):
    peaks, heat, paf, people = scene
    assert pafprocess.process_paf(peaks, heat, paf) == 0
    n = pafprocess.get_num_humans()
    assert n == 2
    for h in range(n):
        assert pafprocess.get_score(h) > 0.4
        found = 0
        for p in range(18):
            if pafprocess.get_part_cid(h, p) >= 0:
                found += 1
                assert 0 <= pafprocess.get_part_x(h, p) < 216
                assert 0 <= pafprocess.get_part_y(h, p) < 184
                assert pafprocess.get_part_score(h, p) > 0.05
        assert found >= 4


def test_pose_estimator_estimate_paf(scene):
    peaks, heat, paf, people = scene
    humans = PoseEstimator.estimate_paf(peaks, heat, paf)
    assert len(humans) == 2
    for hum in humans:
        assert hum.part_count() >= 4
        for bp in hum.body_parts.values():
            assert 0.0 <= bp.x <= 1.0 and 0.0 <= bp.y <= 1.0
