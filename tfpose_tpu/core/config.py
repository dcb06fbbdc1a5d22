"""Configuration dataclasses for the decode path and estimator.

The decode thresholds replicate the constants in the reference native
decoder ``tf_pose/pafprocess/pafprocess.h``:
``THRESH_HEAT 0.05``, ``THRESH_VECTOR_SCORE 0.05``,
``THRESH_VECTOR_CNT1 8``, ``THRESH_PART_CNT 4``,
``THRESH_HUMAN_SCORE 0.4``, ``STEP_PAF 10``.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class DecodeParams:
    """Static decode configuration; every field is a compile-time constant."""

    thresh_heat: float = 0.05
    thresh_vector_score: float = 0.05
    thresh_vector_cnt1: int = 8
    thresh_part_cnt: int = 4
    thresh_human_score: float = 0.4
    step_paf: int = 10
    # TPU-native fixed-shape parameters (the reference's native decoder is
    # dynamically sized; on TPU we pad to static bounds):
    max_peaks: int = 32          # max peaks kept per part channel
    max_humans: int = 32         # max humans returned
    # Gaussian smoothing (reference Smoother(..., 25, 3.0)):
    smooth_kernel_size: int = 25
    smooth_sigma: float = 3.0
    # NMS window (reference tf.nn.pool (3,3) MAX):
    nms_window: int = 3
    # Pallas fused smooth+NMS kernel: True/False, or None = auto
    # (on for TPU backends, off for CPU)
    use_pallas: bool | None = None
    # Adaptive-K escalation (round-3 verdict #5): the reference peak
    # scan is unbounded (pafprocess.cpp step 1), so a crowded scene
    # that saturates ``max_peaks`` decodes DIFFERENT inputs than the
    # reference would. When True, host-side dispatchers (estimator
    # paths, ops.decode.decode_adaptive) re-decode saturated images
    # through a lazily-compiled larger-K pipeline (``escalated()``),
    # restoring unbounded-parity at near-zero common-case cost.
    escalate_on_saturation: bool = True
    # peak/human caps the escalated pipeline uses
    escalated_max_peaks: int = 128
    escalated_max_humans: int = 64

    def escalated(self) -> "DecodeParams":
        """Large-K fallback parameters for saturated scenes. 128 peaks
        per part is effectively unbounded for real imagery (a 46x54
        stride-8 grid holds ~2.5k cells; 3x3-NMS admits at most ~1/4
        of them, and >128 above-threshold maxima in ONE part channel
        means the input is noise, not people)."""
        return dataclasses.replace(
            self,
            max_peaks=max(self.max_peaks, self.escalated_max_peaks),
            max_humans=max(self.max_humans, self.escalated_max_humans))

    @classmethod
    def fast(cls, **overrides) -> "DecodeParams":
        """Latency-oriented preset: candidate work scales with
        max_peaks^2, so halving the cap (32 -> 16 peaks/part, plenty
        for <=8-person scenes) roughly quarters the PAF-scoring stage.
        Thresholds stay at reference values — only the padding caps
        shrink, so results are identical whenever no part has more
        than 16 peaks above threshold."""
        kw = dict(max_peaks=16, max_humans=16)
        kw.update(overrides)
        return cls(**kw)


@dataclasses.dataclass(frozen=True)
class EstimatorConfig:
    """Static estimator configuration (reference TfPoseEstimator ctor args)."""

    target_size: tuple = (432, 368)   # (w, h), reference default for run.py
    upsample_ratio: float = 4.0       # reference --resize-out-ratio default
    decode: DecodeParams = DecodeParams()
    backbone_dtype: str = "float32"   # "bfloat16" for TPU speed runs
