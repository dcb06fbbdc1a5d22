"""Bulk decode-parity net (round-3 verdict #4; SURVEY §7 promised the
oracle parity suite at "thousands of random + COCO-real inputs").

Always-on: 16 adversarial scenes (2 per recipe) JAX vs NumPy oracle.
TFPOSE_SLOW_TESTS=1: 1000+ scenes with the C++ twin sampled every
10th — results of the latest full run are recorded in PARITY.md.

This net is what exposed the round-2 assembly's two real divergences
(overlapping-row fuse where the reference attaches; phase-parallel
vs sequential slot displacement) — both fixed in round 3 by the
slot-owner sequential model (ops/assemble.py docstring). The budgets
are now tight: any systematic divergence fails loudly, with a small
allowance for not-yet-characterised long tail (pathological
duplicate-peak chains the module docstring describes).
"""

import os

import pytest

from tfpose_tpu.evaluation.parity_sweep import (
    RECIPES,
    run_ckpt_sweep,
    run_sweep,
)

_SYNTH_CKPT = os.path.join(
    os.path.dirname(__file__), "..", "models", "trained",
    "thin160_synth", "params.msgpack")


def test_parity_sweep_fast():
    # 16 scenes (2 per recipe): the NumPy oracle costs ~10 s/scene on
    # this 1-core host, so the always-on net stays small; the bulk
    # 1000-scene net runs under TFPOSE_SLOW_TESTS (results: PARITY.md)
    stats = run_sweep(16, seed0=1000)
    assert stats.total == 16
    assert stats.mismatch_total == 0, (
        f"decode parity broke: {stats.mismatch_total}/16; "
        f"examples: {stats.examples}")


@pytest.mark.skipif(not os.path.exists(_SYNTH_CKPT),
                    reason="committed checkpoint missing")
def test_parity_sweep_real_activations_fast():
    """SURVEY §7's "COCO-real inputs" leg: decode parity on REAL
    trained-network activations (rendered scenes forwarded through the
    committed checkpoint), not just synthetic-renderer tensors."""
    stats = run_ckpt_sweep(4, _SYNTH_CKPT, seed0=50, cpp_every=2)
    assert stats.total == 4
    assert stats.mismatch_total == 0, stats.examples
    assert stats.cpp_mismatch == 0, stats.examples


@pytest.mark.skipif(not os.environ.get("TFPOSE_SLOW_TESTS"),
                    reason="bulk sweep: set TFPOSE_SLOW_TESTS=1")
def test_parity_sweep_real_activations_bulk():
    stats = run_ckpt_sweep(200, _SYNTH_CKPT, seed0=0, cpp_every=10)
    assert stats.mismatch_total / stats.total <= 0.005, (
        f"{stats.mismatch_total}/{stats.total}: {stats.examples}")
    if stats.cpp_total:
        assert stats.cpp_mismatch / stats.cpp_total <= 0.005, (
            stats.examples)


@pytest.mark.skipif(not os.environ.get("TFPOSE_SLOW_TESTS"),
                    reason="bulk sweep: set TFPOSE_SLOW_TESTS=1")
def test_parity_sweep_bulk():
    stats = run_sweep(1000, seed0=0, cpp_every=10)
    assert stats.mismatch_total / stats.total <= 0.005, (
        f"bulk divergence rate {stats.mismatch_total}/{stats.total} "
        f"exceeds budget; per-recipe: {stats.per_recipe}; "
        f"examples: {stats.examples}")
    if stats.cpp_total:
        assert stats.cpp_mismatch / stats.cpp_total <= 0.005, (
            f"C++ twin divergence: {stats.cpp_mismatch}/"
            f"{stats.cpp_total}; examples: {stats.examples}")
    # all recipes actually ran
    assert set(stats.per_recipe) == set(RECIPES)
