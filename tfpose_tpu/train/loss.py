"""Training loss — reference ``tf_pose/train.py``: sum over the 6
refinement stages x 2 branches of ``tf.nn.l2_loss(out - target)``
(= sum of squares / 2), averaged over the batch."""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp


def stage_l2_loss(stages: List[Tuple[jnp.ndarray, jnp.ndarray]],
                  paf_gt: jnp.ndarray, heat_gt: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, dict]:
    """``stages``: [(paf, heat)] per refinement stage, NHWC.
    ``paf_gt``: (N, H/8, W/8, 38); ``heat_gt``: (N, H/8, W/8, 19)."""
    batch = paf_gt.shape[0]
    total = 0.0
    last_paf = last_heat = None
    for paf, heat in stages:
        paf = paf.astype(jnp.float32)
        heat = heat.astype(jnp.float32)
        total = total + jnp.sum((paf - paf_gt) ** 2) / 2.0
        total = total + jnp.sum((heat - heat_gt) ** 2) / 2.0
        last_paf, last_heat = paf, heat
    total = total / batch
    metrics = {
        "loss": total,
        "loss_last_paf": jnp.sum((last_paf - paf_gt) ** 2) / 2.0 / batch,
        "loss_last_heat": jnp.sum((last_heat - heat_gt) ** 2) / 2.0 / batch,
    }
    return total, metrics
