"""Train state + jittable train step (reference ``tf_pose/train.py``
semantics: stage-summed L2 loss, Adam with exponential LR decay,
multi-device data parallelism — towers replaced by mesh sharding)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from tfpose_tpu.train.loss import stage_l2_loss


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables: Dict[str, Any], tx: optax.GradientTransformation):
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params))


def make_optimizer(lr: float = 1e-4, decay_rate: float = 0.33,
                   decay_steps: int = 10000) -> optax.GradientTransformation:
    """Adam with exponential decay (reference train.py defaults)."""
    sched = optax.exponential_decay(lr, decay_steps, decay_rate,
                                    staircase=True)
    return optax.adam(sched)


def make_train_step(model, tx: optax.GradientTransformation,
                    rasterize: bool = False, sigma: float = 1.0,
                    paf_threshold: float = 1.0):
    """Returns jittable ``train_step(state, batch) -> (state, metrics)``.

    ``batch``: dict with 'image' (N,H,W,3) float and either
    pre-rasterised targets ('heat' (N,H/8,W/8,19), 'paf'
    (N,H/8,W/8,38)) or — with ``rasterize=True`` — raw 'joints'
    (N, max_people, 18, 2) stride-8 pixel coords (NaN padded), which
    are rendered to heatmap/PAF targets ON DEVICE inside the step
    (host ships coordinates only). Works unsharded on one chip or with
    mesh-sharded batches (XLA all-reduces gradients over the mesh).
    """

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        image = batch["image"]
        if image.dtype == jnp.uint8:
            # uint8 feed: frames ship at 1/4 the bytes and normalize
            # ON DEVICE (the estimator's device-preprocess convention;
            # pipeline/preprocess.normalize semantics)
            image = image.astype(jnp.float32) / 256.0 - 0.5
        out, mutated = model.apply(
            variables, image, train=True,
            mutable=["batch_stats"] if batch_stats else [])
        if rasterize:
            from tfpose_tpu.train.targets_jax import batch_targets
            hs, ws = out["stages"][0][1].shape[1:3]
            targets = batch_targets(batch["joints"], hs, ws,
                                    sigma=sigma,
                                    threshold=paf_threshold)
            heat_gt, paf_gt = targets["heat"], targets["paf"]
        else:
            heat_gt, paf_gt = batch["heat"], batch["paf"]
        loss, metrics = stage_l2_loss(out["stages"], paf_gt, heat_gt)
        new_stats = mutated.get("batch_stats", batch_stats) \
            if batch_stats else {}
        return loss, (metrics, new_stats)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats,
                                  opt_state=new_opt)
        return new_state, metrics

    return train_step
