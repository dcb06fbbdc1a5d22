"""Converter cold-start dress rehearsal over ALL FIVE backbones
(round-3 verdict #5): adversarial self-frozen pb file on disk ->
``convert_pb_file`` -> ``TfPoseEstimator(params_path=...)`` -> decode.

The pb fixtures are generated deterministically in-test (not
committed: full-width weight sets are 8-100 MB each and the advisor
flagged binary repo bloat in round 2); adversarial features match
what real ``graph_opt.pb`` files contain — slim nested naming for the
v2 models, flat network_base naming for cmu/mobilenet/thin, all under
an ``Openpose`` scope with ``<name>/read`` Identity nodes
(reference ``models/graph/*/graph_opt.pb``, ``networks.py:~100``).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tfpose_tpu.convert import graphdef as gdc  # noqa: E402
from tfpose_tpu.models import get_network  # noqa: E402

import os  # noqa: E402

# All 5 reference backbones are covered; the three full-width ones
# cost minutes each on this 1-core host, so they run under
# TFPOSE_SLOW_TESTS=1 (results recorded in PARITY.md §converter).
_SLOW = pytest.mark.skipif(
    not os.environ.get("TFPOSE_SLOW_TESTS"),
    reason="full-width converter rehearsal: set TFPOSE_SLOW_TESTS=1")
ALL_MODELS = [pytest.param("cmu", marks=_SLOW),
              pytest.param("mobilenet", marks=_SLOW),
              "mobilenet_thin",
              pytest.param("mobilenet_v2_large", marks=_SLOW),
              "mobilenet_v2_small"]


@pytest.mark.parametrize("name", ALL_MODELS)
def test_convert_pb_cold_start(name, tmp_path):
    net = get_network(name)
    template = net.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)), train=False)
    rng = np.random.default_rng(hash(name) % 2**32)
    perturbed = jax.tree.map(
        lambda x: x + rng.normal(0, 0.01, x.shape).astype(x.dtype),
        template)
    style = "slim" if name.startswith("mobilenet_v2") else "flat"
    gd = gdc.variables_to_graphdef(perturbed, scope="Openpose",
                                   style=style, read_nodes=True)
    pb_path = str(tmp_path / f"{name}_graph_opt.pb")
    with open(pb_path, "wb") as f:
        f.write(gd.SerializeToString())

    out_path = str(tmp_path / f"{name}.msgpack")
    # cold: file in, file out, template re-initialised from scratch
    gdc.convert_pb_file(pb_path, name, out_path, input_size=(64, 64))

    from tfpose_tpu.estimator import TfPoseEstimator
    e = TfPoseEstimator(name, target_size=(96, 80),
                        params_path=out_path)
    # loaded params must be the pb's, not the estimator's random init
    flat_loaded = gdc._flatten(e.variables["params"])
    flat_pb = gdc._flatten(perturbed["params"])
    some = sorted(flat_pb)[0]
    np.testing.assert_allclose(np.asarray(flat_loaded[some]),
                               np.asarray(flat_pb[some]), atol=1e-6)

    img = np.random.default_rng(0).integers(
        0, 255, (80, 96, 3), np.uint8)
    humans = e.inference(img, resize_to_default=False,
                         upsample_size=2.0)
    assert isinstance(humans, list)  # full decode ran
