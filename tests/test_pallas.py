"""Pallas kernel parity tests (interpret mode on the CPU mesh; the
compiled kernel is verified bit-exact on the TPU by the bench/verify
flow)."""

import numpy as np
import pytest

from tfpose_tpu.ops import gaussian, nms
from tfpose_tpu.ops.pallas.smooth_nms import smooth_nms_pallas


@pytest.mark.parametrize("shape", [(40, 48, 19), (46, 54, 19),
                                   (92, 108, 19)])
def test_smooth_nms_parity(shape):
    rng = np.random.default_rng(0)
    x = np.abs(rng.normal(size=shape)).astype(np.float32)
    ref = np.asarray(nms.nms(gaussian.smooth(x)))
    got = np.asarray(smooth_nms_pallas(x, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_smooth_nms_on_synthetic_scene():
    from tfpose_tpu.utils import synthetic

    rng = np.random.default_rng(1)
    net, _ = synthetic.render_scene(rng, 2, 46, 54)
    heat = net[:, :, :19]
    ref = np.asarray(nms.nms(gaussian.smooth(heat)))
    got = np.asarray(smooth_nms_pallas(heat, interpret=True))
    # identical peak sets above the decode threshold
    np.testing.assert_array_equal(got > 0.05, ref > 0.05)
    np.testing.assert_allclose(got, ref, atol=1e-5)
