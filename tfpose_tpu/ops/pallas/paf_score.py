"""Gather-free PAF line-integral sampling as a Pallas TPU kernel.

The decode profile showed the PAF sample gather is the hot stage
(~1.1 ms/img at b=1 and the only stage that did not amortise under
batching): XLA's gather costs ~5 ns PER ROW regardless of row width or
table size, and 19 pairs x K x K x STEP_PAF ~= 195k rows/image.

This kernel removes the gather. The standard decode path upsamples the
stride-8 PAF map by an integer factor, and integer-factor TF1
``resize_area`` is exact replication (``ops/resize.py:87``), so
sampling the upsampled map at (y, x) equals sampling the RAW stride-8
map at (y//f, x//f). The raw per-pair planes are tiny (<= 128x128
fp32), so each grid program holds one pair's two channel planes in
VMEM and evaluates 128 samples per row with two factorised one-hot
selections on the MXU:

  row select:  R = planes_T @ onehot_yT   (one fp32-exact matmul)
  col select:  s = sum(R * onehot_xT, 0)  (VPU multiply + reduce)

Sample layout is LANE-PACKED everywhere — (rows, 128) int32/f32
blocks — because the obvious (n_samples, 1) layout makes every 4-byte
value occupy a full 512-byte lane tile in VMEM and the resulting DMA
(~400 MB/image) costs more than the original gather (measured: a
no-compute kernel with (M, 1) inputs already ran 1.07 ms).

The per-candidate reduction over STEP_PAF samples rides the grid: the
sample index is a grid dimension whose output block index is constant,
so partial sums accumulate in the revolving VMEM output block and hit
HBM once (two (19, K*K) arrays total).

Reference semantics: ``pafprocess.cpp`` step 2's 10-point
line-integral scoring (SURVEY.md §2.1); threshold criteria are applied
by the caller (``ops/paf.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Plane padding: every standard config fits (thin 432x368 -> 46x54,
# v2 368x368 -> 46x46, CMU 656x368 -> 46x82).
HPAD = 128
WPAD_MAX = 512  # sanity cap for the fitted sublane padding
LANES = 128


def _kernel(nrows_ref, planes_ref, iy_ref, ix_ref, vx_ref, vy_ref,
            sum_ref, cnt_ref, *, rows: int, thresh: float,
            s_paf: int, wpad: int):
    """One (pair, sample-index) program over ``rows``*128 candidates.

    nrows_ref: SMEM (P, 1) int32 (whole array, indexed by the pair
      program id) — number of candidate rows to actually score for
      this pair. Rows >= nrows hold only candidates whose
      endpoint validity is False (prefix-valid peak layout), so their
      scores are dead values downstream; skipping them drops the
      kernel's matmul count from ``rows`` to ~ceil(n_peaks_a/ (128/K))
      on real scenes. Pass ``rows`` to score everything.
    planes_ref: (1, 2*wpad, HPAD) TRANSPOSED planes — row w of
      [0, wpad) is x-channel column values P_x[:, w]; rows
      [wpad, 2*wpad) the y-channel. ``wpad`` is the raw plane width
      padded to a sublane multiple (8) — sized to fit, NOT a fixed
      128: the row-select matmul cost scales with it.
    iy/ix/vx/vy_ref: (rows, LANES) lane-packed samples of THIS sample
      index: lane l of row r is candidate r*128+l.
    sum_ref/cnt_ref: (rows, LANES) revolving accumulators (same block
      for every sample index of a pair).
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        sum_ref[...] = jnp.zeros((rows, LANES), jnp.float32)
        cnt_ref[...] = jnp.zeros((rows, LANES), jnp.float32)

    nr = nrows_ref[pl.program_id(0), 0]            # scalar SMEM load
    planes_t = planes_ref[0]                       # (2*wpad, HPAD)
    hp = jax.lax.Precision.HIGHEST
    sub_h = jax.lax.broadcasted_iota(jnp.int32, (HPAD, LANES), 0)
    sub_w = jax.lax.broadcasted_iota(jnp.int32, (wpad, LANES), 0)

    for r in range(rows):
        @pl.when(r < nr)
        def _row(r=r):
            iy_row = iy_ref[r:r + 1, :]            # (1, LANES)
            ix_row = ix_ref[r:r + 1, :]
            oh_y = (sub_h == iy_row).astype(jnp.float32)  # (HPAD, LANES)
            sel = jnp.dot(planes_t, oh_y, precision=hp)   # (2*wpad, LANES)
            oh_x = (sub_w == ix_row).astype(jnp.float32)  # (wpad, LANES)
            t = (sel[0:wpad, :] * vx_ref[r:r + 1, :]
                 + sel[wpad:2 * wpad, :] * vy_ref[r:r + 1, :]) * oh_x
            s_row = jnp.sum(t, axis=0, keepdims=True)
            sum_ref[r:r + 1, :] += s_row
            cnt_ref[r:r + 1, :] += (s_row > thresh).astype(jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("s_paf", "thresh", "interpret"))
def paf_sample_scores_pallas(planes_t: jnp.ndarray, iy: jnp.ndarray,
                             ix: jnp.ndarray, vx: jnp.ndarray,
                             vy: jnp.ndarray, *, s_paf: int,
                             thresh: float,
                             nrows: jnp.ndarray | None = None,
                             interpret: bool = False):
    """Per-candidate (mean PAF score, #samples above ``thresh``).

    planes_t: (P, 2*wpad, HPAD) fp32 transposed per-pair planes,
      wpad a multiple of 8 (fit to the raw plane width).
    iy, ix, vx, vy: (P, S, KK) raw-grid sample coords / per-sample
      direction components; KK must be a multiple of 128.
    nrows: optional (P,) int32 — per-pair count of 128-candidate rows
      to score; rows beyond it return 0 mean/cnt (callers use this to
      skip all-invalid candidate rows — see _kernel docstring).
    Returns (mean, cnt): each (P, KK) fp32.
    """
    assert thresh > 0.0, "lane trick requires a positive threshold"
    p, s, kk = iy.shape
    assert s == s_paf and kk % LANES == 0
    rows = kk // LANES
    wpad2 = planes_t.shape[1]
    assert wpad2 % 16 == 0 and planes_t.shape[2] == HPAD
    wpad = wpad2 // 2
    if nrows is None:
        nrows = jnp.full((p,), rows, jnp.int32)

    def pack(a, dtype):
        return a.reshape(p * s * rows, LANES).astype(dtype)

    grid = (p, s)
    samp_spec = pl.BlockSpec(
        (rows, LANES), lambda pi, si: (pi * s_paf + si, 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rows, LANES), lambda pi, si: (pi, 0),
                            memory_space=pltpu.VMEM)
    total, cnt = pl.pallas_call(
        functools.partial(_kernel, rows=rows, thresh=thresh,
                          s_paf=s_paf, wpad=wpad),
        out_shape=(jax.ShapeDtypeStruct((p * rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((p * rows, LANES), jnp.float32)),
        grid=grid,
        in_specs=[
            # whole-array SMEM block (Mosaic rejects 1-element blocked
            # specs); the kernel indexes it by pair program id
            pl.BlockSpec((p, 1), lambda pi, si: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2 * wpad, HPAD), lambda pi, si: (pi, 0, 0),
                         memory_space=pltpu.VMEM),
            samp_spec, samp_spec, samp_spec, samp_spec,
        ],
        out_specs=(out_spec, out_spec),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(nrows, jnp.int32).reshape(p, 1),
      jnp.asarray(planes_t, jnp.float32),
      pack(iy, jnp.int32), pack(ix, jnp.int32), pack(vx, jnp.float32),
      pack(vy, jnp.float32))
    mean = total.reshape(p, kk) * (1.0 / s_paf)
    return mean, cnt.reshape(p, kk)
