"""Batched / mesh-sharded evaluation sweep (BASELINE.json config 5:
"COCO val2017 keypoint eval sweep across all 4 backbones, bf16 batched
inference on TPU mesh").

Images are batched to the network size on the host, sharded over the
mesh 'data' axis, and the fused forward+decode runs as one program per
batch; detections come back as padded arrays and are converted to COCO
keypoint dicts host-side.
"""

from __future__ import annotations

import logging
from typing import Dict, Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tfpose_tpu.core.config import DecodeParams
from tfpose_tpu.core.types import PoseArrays
from tfpose_tpu.evaluation.coco_eval import humans_to_detections

logger = logging.getLogger("tfpose_tpu.sweep")


class BatchedEvaluator:
    """Runs one backbone over image batches, optionally mesh-sharded."""

    def __init__(self, model: str, target_size: Tuple[int, int],
                 batch_size: int = 8, dtype: str = "bfloat16",
                 upsample: float = 4.0, mesh=None,
                 params: DecodeParams = DecodeParams(),
                 spatial: bool = False):
        from tfpose_tpu.models import get_network
        from tfpose_tpu.ops.decode import decode_batch
        from tfpose_tpu.pipeline.preprocess import normalize

        self.w, self.h = target_size
        self.batch = batch_size
        self.mesh = mesh
        # shard image H over the mesh 'spatial' axis in addition to the
        # batch over 'data' (GSPMD halo-exchanges the conv stack); the
        # decode upsample stays replicated per image
        self.spatial = spatial
        net = get_network(model, dtype=jnp.bfloat16
                          if dtype == "bfloat16" else jnp.float32)
        self.variables = net.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, self.h, self.w, 3), jnp.float32), train=False)
        up_h = int(self.h / 8 * upsample)
        up_w = int(self.w / 8 * upsample)
        self.up = (up_h, up_w)

        def fn(variables, imgs):
            x = normalize(imgs)
            outs = net.apply(variables, x, train=False)["concat_stage7"]
            return decode_batch(outs, up_h, up_w, params)

        self._fn = jax.jit(fn)
        self.decode_params = params
        # (B, 18) bool after each run_batch: peak-cap saturation per
        # image (same surfacing contract as TfPoseEstimator)
        self.last_peak_saturated = None
        self._warned_saturation = False
        if mesh is not None:
            from tfpose_tpu.parallel.mesh import replicated
            self.variables = jax.device_put(self.variables,
                                            replicated(mesh))

    def load_params(self, path: str):
        from tfpose_tpu.convert.checkpoint import load_params
        self.variables = load_params(path, self.variables)

    def run_batch(self, imgs: np.ndarray) -> List[List]:
        """(B, H, W, 3) uint8 -> list of per-image Human lists."""
        x = jnp.asarray(imgs, jnp.uint8)
        if self.mesh is not None:
            from tfpose_tpu.parallel.mesh import batch_sharding
            x = jax.device_put(x, batch_sharding(
                self.mesh, 1 if self.spatial else None))
        out = self._fn(self.variables, x)
        arrays = jax.tree.map(np.asarray, out)
        self.last_peak_saturated = arrays.peak_saturated
        if arrays.peak_saturated.any() and not self._warned_saturation:
            import logging
            logging.getLogger("BatchedEvaluator").warning(
                "peak cap (max_peaks=%d) saturated — crowded batch, "
                "low-score peaks may have been dropped",
                self.decode_params.max_peaks)
            self._warned_saturation = True
        results = []
        for i in range(imgs.shape[0]):
            results.append(PoseArrays(
                coords=arrays.coords[i], scores=arrays.part_scores[i],
                part_valid=arrays.part_valid[i],
                human_scores=arrays.human_scores[i],
                human_valid=arrays.human_valid[i]).to_humans())
        return results

    def evaluate(self, images: Iterable[Tuple[int, np.ndarray,
                                              Tuple[int, int]]]
                 ) -> List[dict]:
        """images: iterable of (image_id, uint8 HxWx3 at network size,
        (orig_w, orig_h)). Returns COCO detection dicts."""
        import cv2

        dets: List[dict] = []
        buf, meta = [], []
        for image_id, img, orig_wh in images:
            if img.shape[:2] != (self.h, self.w):
                img = cv2.resize(img, (self.w, self.h),
                                 interpolation=cv2.INTER_AREA)
            buf.append(img)
            meta.append((image_id, orig_wh))
            if len(buf) == self.batch:
                self._flush(buf, meta, dets)
                buf, meta = [], []
        if buf:
            while len(buf) < self.batch:  # pad the tail batch
                buf.append(np.zeros_like(buf[0]))
                meta.append((None, (1, 1)))
            self._flush(buf, meta, dets)
        return dets

    def _flush(self, buf, meta, dets):
        results = self.run_batch(np.stack(buf))
        for humans, (image_id, (ow, oh)) in zip(results, meta):
            if image_id is None:
                continue
            dets.extend(humans_to_detections(humans, image_id, ow, oh))


def sweep(models: Sequence[str], images_fn, gts: Dict[int, List[dict]],
          target_size=(432, 368), batch_size: int = 8,
          mesh=None) -> Dict[str, Dict[str, float]]:
    """Evaluate several backbones; ``images_fn()`` returns a fresh
    image iterable per model. Returns {model: AP stats}."""
    from tfpose_tpu.evaluation.coco_eval import evaluate_oks_ap

    out = {}
    for model in models:
        ev = BatchedEvaluator(model, target_size, batch_size, mesh=mesh)
        dets = ev.evaluate(images_fn())
        out[model] = evaluate_oks_ap(gts, dets)
        logger.info("%s: %s", model, out[model])
    return out
