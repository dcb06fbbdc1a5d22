"""Post-training int8 quantization: calibration + variable assembly.

The reference ran quantized-graph experiments (``TfPoseEstimator.
_quantize_img`` and a quantized model entry in ``tf_pose/networks.py``
[LC]); this is the TPU-native equivalent — int8 x int8 -> int32 convs on
the MXU with calibrated per-tensor activation scales and per-channel
weight scales (``models/layers.py QuantConv``). On a v5e the thin
forward is HBM-traffic-bound (etcs/architecture.md round-3 roofline),
so halving activation bytes is the one structural lever left after the
bf16 pipeline reached ~97% of its traffic floor.

Usage:
    net_q = get_network(name, quant="int8")
    variables = quantize_variables(name, fp32_variables, calib_images)
    out = net_q.apply(variables, x, train=False)

``fp32_variables`` is a plain fp32 checkpoint tree — parameter names and
shapes are identical between the fp32 and int8 paths, so converted
``graph_opt.pb`` checkpoints and trained orbax checkpoints work
unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tfpose_tpu.models.registry import get_network
from tfpose_tpu.pipeline.preprocess import normalize


def default_calibration_images(target_size, n: int = 8,
                               seed: int = 0) -> np.ndarray:
    """Hermetic calibration set: rendered multi-person synthetic scenes
    (the same renderer the e2e OKS gate uses, ``utils/synthetic.
    render_image``) at the network input size. Returns (n,h,w,3) uint8.
    """
    from tfpose_tpu.utils import synthetic

    w, h = target_size
    rng = np.random.default_rng(seed)
    imgs = []
    for _ in range(n):
        n_people = int(rng.integers(1, 4))
        people = synthetic.random_people(rng, n_people, h, w,
                                         separated=True)
        imgs.append(synthetic.render_image(people, h, w, rng))
    return np.stack(imgs)


def calibrate(model_name: str, variables, images: np.ndarray,
              dtype=jnp.float32) -> Dict[str, Any]:
    """Run the fp32 forward over ``images`` (N,H,W,3 uint8) recording
    each conv's input absmax; returns the calibrated 'quant' collection.
    """
    net_c = get_network(model_name, dtype=dtype, quant="calib")
    # Initialise the quant collection (params are reused from the
    # caller's tree, so init only needs the structure: one image).
    x0 = normalize(jnp.asarray(images[:1]))
    quant0 = net_c.init(jax.random.PRNGKey(0), x0, train=False)["quant"]

    @jax.jit
    def step(merged, batch):
        _, mutated = net_c.apply(merged, normalize(batch), train=False,
                                 mutable=["quant"])
        return mutated["quant"]

    merged = dict(variables)
    merged["quant"] = quant0
    for i in range(images.shape[0]):
        merged["quant"] = step(merged, jnp.asarray(images[i:i + 1]))
    return jax.tree.map(np.asarray, merged["quant"])


def quantize_variables(model_name: str, variables,
                       images: Optional[np.ndarray] = None,
                       target_size=(432, 368)) -> Dict[str, Any]:
    """fp32 checkpoint tree -> variables for the ``quant="int8"`` net:
    same params/batch_stats plus a calibrated 'quant' collection."""
    if images is None:
        images = default_calibration_images(target_size)
    quant = calibrate(model_name, variables, images)
    out = dict(variables)
    out["quant"] = quant
    return out
