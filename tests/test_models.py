"""Backbone construction + forward shape tests (all model families)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfpose_tpu.models import MODEL_NAMES, get_network, model_wh


@pytest.mark.parametrize("name", MODEL_NAMES)
def test_forward_shapes(name):
    net = get_network(name)
    x = jnp.zeros((1, 64, 80, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(variables, x, train=False)
    assert out["concat_stage7"].shape == (1, 8, 10, 57)
    assert len(out["stages"]) == 6
    for paf, heat in out["stages"]:
        assert paf.shape == (1, 8, 10, 38)
        assert heat.shape == (1, 8, 10, 19)


def test_output_concat_order_heat_then_paf():
    """concat_stage7 = [heat 19 | paf 38] — the estimator split depends
    on this (reference estimator.py splits [:19] / [19:])."""
    net = get_network("mobilenet_thin")
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    v = net.init(jax.random.PRNGKey(1), x, train=False)
    out = net.apply(v, x, train=False)
    paf, heat = out["stages"][-1]
    np.testing.assert_array_equal(np.asarray(out["concat_stage7"][..., :19]),
                                  np.asarray(heat))
    np.testing.assert_array_equal(np.asarray(out["concat_stage7"][..., 19:]),
                                  np.asarray(paf))


def test_param_count_ordering():
    """cmu (VGG-19) must dwarf the mobilenets; thin < full v1."""
    def n_params(name):
        net = get_network(name)
        v = net.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 32, 32, 3)), train=False)
        return sum(p.size for p in jax.tree.leaves(v["params"]))

    thin = n_params("mobilenet_thin")
    v1 = n_params("mobilenet")
    cmu = n_params("cmu")
    assert thin < v1 < cmu
    assert cmu > 20_000_000  # VGG-19 CPM class
    assert thin < 3_000_000  # committed thin graph was ~7MB fp32


def test_bf16_compute_path():
    net = get_network("mobilenet_thin", dtype=jnp.bfloat16)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(v, x, train=False)
    assert out["concat_stage7"].dtype == jnp.bfloat16
    # params stay fp32 for optimizer friendliness
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(v["params"]))


def test_model_wh():
    assert model_wh("432x368") == (432, 368)
    assert model_wh("0x0") == (0, 0)
    with pytest.raises(ValueError):
        model_wh("430x368")
