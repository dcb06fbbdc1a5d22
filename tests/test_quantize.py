"""Weight quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tfpose_tpu.convert.quantize import (
    cast_params,
    dequantize_params,
    quantization_error,
    quantize_params,
)
from tfpose_tpu.models import get_network


def _thin_params():
    net = get_network("mobilenet_thin")
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                 train=False)
    return net, v


def test_roundtrip_error_small():
    net, v = _thin_params()
    err = quantization_error(v["params"])
    assert err < 0.01  # <1% relative L2 per tensor


def test_quantized_forward_close():
    net, v = _thin_params()
    packed = quantize_params(v["params"])
    deq = {"params": dequantize_params(packed),
           "batch_stats": v["batch_stats"]}
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 32, 32, 3)), jnp.float32)
    a = net.apply(v, x, train=False)["concat_stage7"]
    b = net.apply(deq, x, train=False)["concat_stage7"]
    # random-init activations are O(1); quantization noise compounds
    # through 6 stages — just require strong correlation
    aa, bb = np.asarray(a).ravel(), np.asarray(b).ravel()
    corr = np.corrcoef(aa, bb)[0, 1]
    assert corr > 0.99


def test_int8_size_reduction():
    net, v = _thin_params()
    packed = quantize_params(v["params"])

    def nbytes(t):
        return sum(np.asarray(x).nbytes for x in jax.tree.leaves(t))

    assert nbytes(packed["q"]) < nbytes(v["params"]) / 3.5


def test_cast_params_bf16():
    net, v = _thin_params()
    cast = cast_params(v["params"])
    kinds = {np.asarray(x).dtype for x in jax.tree.leaves(cast)
             if np.ndim(x) >= 2}
    assert kinds == {np.dtype(jnp.bfloat16)}
