#!/usr/bin/env python
"""One-command on-chip Pallas kernel parity verdict (round-3 verdict
item #7).

For every Pallas kernel in the decode path, run the COMPILED kernel on
the default backend (the TPU when present) against its
``interpret=True`` reference on the CPU, over a fixed seeded corpus,
and print ONE JSON line with a per-kernel verdict. This turns the
"compiled-vs-interpret bit-identical" statements in BASELINE.md /
etcs/architecture.md into a reproducible artifact instead of session
lore.

Corpus notes:
- the f=8 phase-kernel case (46x54 raw -> 368x432) is the
  VMEM-admission edge the round-2 advisor flagged: c_blk must shrink
  to fit the ~16 MB scoped budget rather than fail Mosaic allocation;
- peaks corpora include dense-valid, sparse-valid, and prefix-valid
  layouts (the production top-K extraction emits prefix-valid);
- "identical" means bit-identical (``np.array_equal``) — the kernels
  are fixed-order fp32 reductions, so compiled and interpret must
  agree exactly; any drift is a lowering bug, not noise.

Reference twin: the reference verifies its C++ pafprocess against
Python by eyeball (SURVEY §4); this script is the TPU-native analogue
with a machine-checkable verdict.

Usage: python scripts/verify_kernels.py           # full corpus
       python scripts/verify_kernels.py --quick   # skip the f=8 edge
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _run(fn, *args, interpret, **kw):
    """Run fn Mosaic-compiled or in interpret mode (the kernel body as
    plain XLA ops), both on the SAME default backend: the comparison
    isolates the Mosaic lowering, which is the thing interpret-mode CPU
    tests cannot exercise. (Interpret on a DIFFERENT backend is not
    bit-comparable — cross-backend fp32 reassociation alone produces
    ~1e-7 drift that cascades into peak/tie selection.)"""
    import jax
    out = fn(*args, interpret=interpret, **kw)
    return jax.tree.map(np.asarray, out)


def _verdict(name, compiled, ref, results):
    flat_c = jax.tree_util.tree_leaves(compiled)
    flat_r = jax.tree_util.tree_leaves(ref)
    ok = all(np.array_equal(c, r) for c, r in zip(flat_c, flat_r))
    max_abs = max((float(np.max(np.abs(
        np.asarray(c, np.float64) - np.asarray(r, np.float64)))
        ) if c.size else 0.0)
        for c, r in zip(flat_c, flat_r))
    results[name] = {"bit_identical": bool(ok),
                     "max_abs_diff": max_abs}
    print(f"[verify] {name}: {'OK' if ok else 'MISMATCH'} "
          f"(max|d|={max_abs:.3g})", file=sys.stderr)
    return ok


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="skip the f=8 VMEM-admission edge case")
    args = parser.parse_args(argv)

    global jax
    import jax
    import jax.numpy as jnp

    from tfpose_tpu.core.config import DecodeParams
    from tfpose_tpu.ops import nms, paf
    from tfpose_tpu.ops.pallas.smooth_nms import (
        can_use_phase_kernel,
        smooth_nms_pallas,
        smooth_nms_topk_pallas,
        smooth_nms_topk_raw_pallas,
    )
    from tfpose_tpu.utils import synthetic
    from tfpose_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    backend = jax.devices()[0].platform
    results = {}
    t0 = time.time()
    all_ok = True

    # --- smooth + NMS (full-plane variant) -----------------------------
    rng = np.random.default_rng(0)
    noise = np.abs(rng.normal(size=(46, 54, 19))).astype(np.float32)
    scene, _ = synthetic.render_scene(np.random.default_rng(1), 3, 46, 54)
    heat = np.asarray(scene[:, :, :19], np.float32)
    for name, x in (("smooth_nms/noise", noise),
                    ("smooth_nms/scene", heat)):
        c = _run(smooth_nms_pallas, jnp.asarray(x), interpret=False)
        r = _run(smooth_nms_pallas, jnp.asarray(x), interpret=True)
        all_ok &= _verdict(name, c, r, results)

    # --- fused smooth + NMS + top-K on the upsampled plane --------------
    up = np.repeat(np.repeat(heat, 4, 0), 4, 1)  # exact x4 replication
    c = _run(smooth_nms_topk_pallas, jnp.asarray(up), 32, 0.05,
             interpret=False)
    r = _run(smooth_nms_topk_pallas, jnp.asarray(up), 32, 0.05,
             interpret=True)
    all_ok &= _verdict("smooth_nms_topk/184x216_k32", c, r, results)

    # --- phase-decomposed raw-grid kernel -------------------------------
    cases = [("f4", 4, 4, 32), ("f4_k4", 4, 4, 4)]
    if not args.quick:
        # f=8: the VMEM-admission edge (c_blk shrinks to fit the
        # scoped budget; advisor r2 finding)
        cases.append(("f8_vmem_edge", 8, 8, 32))
    for tag, fy, fx, k in cases:
        assert can_use_phase_kernel(46, 54, 46 * fy, 54 * fx)
        c = _run(smooth_nms_topk_raw_pallas, jnp.asarray(heat),
                 fy, fx, k, 0.05, interpret=False)
        r = _run(smooth_nms_topk_raw_pallas, jnp.asarray(heat),
                 fy, fx, k, 0.05, interpret=True)
        all_ok &= _verdict(f"smooth_nms_topk_raw/{tag}", c, r, results)

    # --- PAF sampling scorer (single + batched flat-grid) ---------------
    params = DecodeParams()
    k = params.max_peaks
    h8, w8, up_h, up_w = 46, 54, 184, 216
    rng = np.random.default_rng(2)
    paf8 = rng.normal(size=(h8, w8, 38)).astype(np.float32)
    assert paf.can_use_pallas_sampling(h8, w8, up_h, up_w, k)

    def random_peaks(rng, dense):
        return nms.Peaks(
            x=jnp.asarray(rng.integers(0, up_w, (19, k), np.int32)),
            y=jnp.asarray(rng.integers(0, up_h, (19, k), np.int32)),
            score=jnp.asarray(
                rng.uniform(0.1, 1, (19, k)).astype(np.float32)),
            valid=jnp.asarray(rng.uniform(size=(19, k))
                              < (0.9 if dense else 0.25)))

    for tag, dense in (("dense", True), ("sparse", False)):
        pk = random_peaks(rng, dense)
        c = _run(paf.score_candidates_pallas, pk, jnp.asarray(paf8),
                 up_h, up_w, params, interpret=False)
        r = _run(paf.score_candidates_pallas, pk, jnp.asarray(paf8),
                 up_h, up_w, params, interpret=True)
        all_ok &= _verdict(f"paf_score/{tag}", c, r, results)

    # batched flat-grid path with prefix-valid row skip (the
    # production decode_batch program)
    b = 4
    paf8_b = rng.normal(size=(b, h8, w8, 38)).astype(np.float32)
    nval = rng.integers(0, k + 1, (b, 19))
    iota = np.arange(k)[None, None, :]
    pk_b = nms.Peaks(
        x=jnp.asarray(rng.integers(0, up_w, (b, 19, k), np.int32)),
        y=jnp.asarray(rng.integers(0, up_h, (b, 19, k), np.int32)),
        score=jnp.asarray(
            rng.uniform(0.1, 1, (b, 19, k)).astype(np.float32)),
        valid=jnp.asarray(iota < nval[:, :, None]))
    c = _run(paf.score_candidates_pallas_batch, pk_b,
             jnp.asarray(paf8_b), up_h, up_w, params, interpret=False)
    r = _run(paf.score_candidates_pallas_batch, pk_b,
             jnp.asarray(paf8_b), up_h, up_w, params, interpret=True)
    all_ok &= _verdict("paf_score_batch/prefix_valid", c, r, results)

    print(json.dumps({
        "backend": backend,
        "all_bit_identical": bool(all_ok),
        "kernels": results,
        "elapsed_s": round(time.time() - t0, 1),
    }))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
