"""Double-buffered streaming inference driver.

The reference webcam/video loop is fully serial (capture -> forward ->
C++ decode -> draw, ``run_webcam.py``; SURVEY.md §3.2 notes "no
pipelining"). JAX dispatch is asynchronous, so here the host keeps
``depth`` frames in flight: while the TPU runs frame N, the host
uploads frame N+1 and materialises frame N-1's humans. This hides
host<->device transfer and Python overhead behind device compute.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tfpose_tpu.core.types import Human, PoseArrays


class VideoPipeline:
    def __init__(self, estimator, upsample_size: float = 4.0,
                 depth: int = 2):
        self.e = estimator
        self.ratio = upsample_size
        self.depth = max(1, depth)

    def _dispatch(self, frame: np.ndarray):
        import cv2
        w, h = self.e.target_size
        if frame.shape[:2] != (h, w):
            frame_r = cv2.resize(frame, (w, h),
                                 interpolation=cv2.INTER_AREA)
        else:
            frame_r = frame
        up_h = int(h / 8 * self.ratio)
        up_w = int(w / 8 * self.ratio)
        fn = self.e._pipeline(h, w, up_h, up_w, False, False)
        out = fn(self.e.variables, jnp.asarray(frame_r, jnp.uint8))
        return out

    def _collect(self, out) -> List[Human]:
        arrays = jax.tree.map(np.asarray, out)
        self.e._note_saturation(arrays.peak_saturated)
        return PoseArrays(
            coords=arrays.coords, scores=arrays.part_scores,
            part_valid=arrays.part_valid,
            human_scores=arrays.human_scores,
            human_valid=arrays.human_valid).to_humans()

    def run(self, frames: Iterable[np.ndarray]
            ) -> Iterator[Tuple[np.ndarray, List[Human]]]:
        """Yields (original_frame, humans) in order, ``depth`` frames of
        latency behind the input."""
        inflight = collections.deque()
        for frame in frames:
            inflight.append((frame, self._dispatch(frame)))
            if len(inflight) > self.depth:
                f, out = inflight.popleft()
                yield f, self._collect(out)
        while inflight:
            f, out = inflight.popleft()
            yield f, self._collect(out)
