"""GraphDef <-> flax converter round-trip tests (TF-gated)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tfpose_tpu.convert import graphdef as gdc  # noqa: E402
from tfpose_tpu.models import get_network  # noqa: E402


@pytest.mark.parametrize("name", ["mobilenet_thin", "cmu"])
def test_roundtrip(name):
    net = get_network(name)
    template = net.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)), train=False)
    # perturb so the round trip is non-trivial
    perturbed = jax.tree.map(
        lambda x: x + np.random.default_rng(0).normal(
            0, 0.01, x.shape).astype(x.dtype), template)
    gd = gdc.variables_to_graphdef(perturbed)
    restored = gdc.graphdef_to_variables(gd, template)
    flat_a = gdc._flatten(perturbed)
    flat_b = gdc._flatten(restored)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_allclose(np.asarray(flat_a[k]),
                                   np.asarray(flat_b[k]), atol=1e-6,
                                   err_msg=str(k))


def test_missing_consts_reported():
    net = get_network("mobilenet_thin")
    template = net.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)), train=False)
    from tensorflow.core.framework import graph_pb2
    with pytest.raises(ValueError, match="missing consts"):
        gdc.graphdef_to_variables(graph_pb2.GraphDef(), template)


def test_name_examples():
    assert gdc.tf1_name_for(
        ("MConv_Stage1", "L1_1", "depthwise", "kernel"), "params") == \
        "MConv_Stage1_L1_1_depthwise/depthwise_weights"
    assert gdc.tf1_name_for(
        ("MConv_Stage1", "L1_1", "dw_bn", "scale"), "params") == \
        "MConv_Stage1_L1_1_depthwise/BatchNorm/gamma"
    assert gdc.tf1_name_for(
        ("conv4_3_CPM", "conv", "kernel"), "params") == \
        "conv4_3_CPM/weights"
    assert gdc.tf1_name_for(
        ("conv1_1", "conv", "bias"), "params", "Openpose") == \
        "Openpose/conv1_1/biases"
