"""int8 PTQ inference path (models/quantize.py + layers.QuantConv).

The reference ran quantized-graph experiments (``TfPoseEstimator.
_quantize_img``, quantized model registry entry [LC]); the TPU rebuild
implements them as calibrated int8 PTQ. Measured on a v5e the int8
forward is a perf LOSS vs bf16 through XLA convs (0.82 vs 0.45 ms/img
at b=16 — see etcs/architecture.md), so this path is an accuracy/
deployment experiment, not the production pipeline; these tests pin its
correctness contract:

* the int8 net's parameter tree is byte-compatible with fp32
  checkpoints for every backbone (no conversion needed);
* calibration records sane scales;
* quantized outputs track fp32 outputs on a trained checkpoint well
  enough that decoded keypoints stay put.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tfpose_tpu.models.registry import MODEL_NAMES, get_network  # noqa: E402
from tfpose_tpu.pipeline.preprocess import normalize  # noqa: E402


@pytest.mark.parametrize("name", MODEL_NAMES)
def test_int8_param_tree_matches_fp32(name):
    """Same 'params' structure + shapes as the fp32 net, so converted /
    trained checkpoints load unchanged (eval_shape: no FLOPs)."""
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    v_f = jax.eval_shape(
        lambda: get_network(name).init(rng, x, train=False))
    v_q = jax.eval_shape(
        lambda: get_network(name, quant="int8").init(rng, x, train=False))
    flat_f = jax.tree.leaves_with_path(v_f["params"])
    flat_q = jax.tree.leaves_with_path(v_q["params"])
    assert [(p, l.shape) for p, l in flat_f] == \
        [(p, l.shape) for p, l in flat_q]
    # and the int8 net carries one in_absmax scalar per conv
    n_convs = sum(1 for p, _ in flat_f if p[-1].key == "kernel")
    assert len(jax.tree.leaves(v_q["quant"])) == n_convs


def test_calibration_records_absmax():
    from tfpose_tpu.models.quantize import (
        calibrate, default_calibration_images)

    name = "mobilenet_thin"
    imgs = default_calibration_images((64, 64), n=2)
    net = get_network(name)
    var = net.init(jax.random.PRNGKey(0),
                   normalize(jnp.asarray(imgs[:1])), train=False)
    quant = calibrate(name, dict(var), imgs)
    leaves = jax.tree.leaves(quant)
    assert all(np.asarray(l) > 0 for l in leaves)
    # first conv sees the normalized image: absmax <= 0.5 exactly
    flat = jax.tree.leaves_with_path(quant)
    first = [l for p, l in flat if "Conv2d_0" in str(p)]
    assert len(first) == 1 and 0.1 < float(first[0]) <= 0.5


def test_quantized_forward_tracks_fp32():
    """Random-init thin at 64x64: int8 output within a small absolute
    envelope of fp32 (random-init outputs are O(1e-3); the envelope
    checks the dequant arithmetic, the trained-checkpoint test below
    checks real-signal fidelity)."""
    from tfpose_tpu.models.quantize import (
        default_calibration_images, quantize_variables)

    name = "mobilenet_thin"
    imgs = default_calibration_images((64, 64), n=2)
    net = get_network(name)
    x = normalize(jnp.asarray(imgs[:1]))
    var = net.init(jax.random.PRNGKey(0), x, train=False)
    qvar = quantize_variables(name, dict(var), imgs, target_size=(64, 64))
    out_f = np.asarray(net.apply(var, x, train=False)["concat_stage7"])
    net_q = get_network(name, quant="int8")
    out_q = np.asarray(net_q.apply(qvar, x, train=False)["concat_stage7"])
    scale = max(np.abs(out_f).max(), 1e-4)
    assert np.abs(out_f - out_q).max() < 10 * scale / 127 + 1e-3


_CKPT = os.path.join(os.path.dirname(__file__), "..", "models",
                     "trained", "thin160_synth", "params.msgpack")


@pytest.mark.skipif(not os.environ.get("TFPOSE_SLOW_TESTS"),
                    reason="int8 e2e gate is minutes on the 1-core CPU "
                           "host; set TFPOSE_SLOW_TESTS=1 (TPU "
                           "recommended — see verify skill)")
def test_quantized_checkpoint_passes_e2e_gate():
    """Trained 160x160 checkpoint through the int8 backbone + fp32
    decode must still pass the OKS AP gate (measured on TPU: AP50
    parity with the fp32 path)."""
    import eval as eval_cli

    if not os.path.exists(_CKPT):
        pytest.skip("committed checkpoint missing")
    res = eval_cli.main([
        "--model", "mobilenet_thin", "--resize", "160x160",
        "--synthetic-e2e", "8", "--params", _CKPT, "--quantize"])
    assert res["AP50"] >= 0.6, res


def test_storage_quantize_roundtrip():
    """convert/quantize.py (checkpoint STORAGE quantization — distinct
    from the int8 PTQ inference path above): int8 weight-only pack /
    unpack of a real params tree must keep kernels within ~1% relative
    L2 (the models/README.md contract), leave vectors (biases, BN
    stats) bit-exact fp32, and cast_params must touch only >=2-D
    leaves."""
    from tfpose_tpu.convert.quantize import (
        cast_params,
        dequantize_params,
        quantization_error,
        quantize_params,
    )

    net = get_network("mobilenet_thin")
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3), jnp.float32),
                         train=False)
    params = jax.tree.map(np.asarray, variables["params"])

    packed = quantize_params(params)
    restored = dequantize_params(packed)

    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_r = dict(jax.tree_util.tree_flatten_with_path(restored)[0])
    assert set(flat_r) == {p for p, _ in flat_p}
    for path, leaf in flat_p:
        got = np.asarray(flat_r[path], np.float32)
        leaf = np.asarray(leaf, np.float32)
        if leaf.ndim >= 2:  # kernels: int8 roundtrip error bound
            denom = np.linalg.norm(leaf) + 1e-12
            assert np.linalg.norm(leaf - got) / denom < 0.01, path
        else:  # vectors stay untouched fp32
            np.testing.assert_array_equal(leaf, got, err_msg=str(path))

    assert quantization_error(params) < 0.01

    cast = cast_params(params, jnp.bfloat16)
    for path, leaf in jax.tree_util.tree_flatten_with_path(cast)[0]:
        want = jnp.bfloat16 if np.ndim(leaf) >= 2 else np.float32
        assert np.asarray(leaf).dtype == want, path
