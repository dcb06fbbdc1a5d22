#!/usr/bin/env python
"""Benchmark harness. Prints the summary JSON line on stdout (flushed
once after the headline configs and again, complete, at the end — so a
mid-run kill still leaves a parseable record); per-config detail goes
to stderr.

Headline (BASELINE.json): images/sec/chip at MobileNet-thin 432x368
multi-person with fused decode + p50 e2e latency. The TF1-reference CPU
comparator could not be measured (empty reference mount, BASELINE.md);
the documented reconstructed baseline is ~0.20 s/image (5 img/s).

Methodology: this dev environment reaches the TPU through a tunnel
whose ``block_until_ready`` returns at dispatch and whose round-trip is
~40 ms, so naive host-side timing is meaningless in both directions.
Two independent measurements are therefore reported per config:

* **throughput slope** (``per_image_ms``): each config scans its
  workload S times over DISTINCT inputs inside ONE XLA program and
  times a forced host transfer; per-image time is the slope between two
  scan lengths (cancelling the tunnel's fixed per-call cost). b=1
  configs use S=128 so slope jitter is <2% (at S=32 the tunnel's
  per-call jitter put ±0.3 ms on b=1 slopes — round-2 verdict).
* **device p50 per image** (``device_p50_per_image_ms``): the median
  on-device execution time of the ALREADY-COMPILED scan program, read
  from the device lane of a ``jax.profiler`` trace, divided by the
  number of scanned images — per-scan-iteration device time, immune to
  tunnel RTT. (Round 3 compiled a SECOND single-image program per
  config for this; two compiles x 9 configs blew the driver's timeout
  — BENCH_r03.json rc=124. One compile per config now.)

Budget control: ``TFPOSE_BENCH_DEADLINE_S`` (default 1200 s) is a
global wall-clock deadline; configs that would start after it are
skipped, and the summary JSON is re-flushed to stdout after every
completed config so even a kill mid-run leaves a parseable record.

Decode cost depends on peak population, so alongside the random-noise
configs (worst case) the harness benches decode on REALISTIC
activations: rendered multi-person scene tensors (utils/synthetic
render_scene — the trainer's target format) and an e2e run with the
committed trained checkpoint on rendered scene images.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 5.0  # reconstructed TF1 CPU reference (BASELINE.md)

_T0 = time.perf_counter()


def _elapsed():
    return time.perf_counter() - _T0


def _deadline_s():
    return float(os.environ.get("TFPOSE_BENCH_DEADLINE_S", 1200))


def _slope_timer(many, xs, scans, batch, n_rep):
    """Differential throughput: slope between two scan lengths cancels
    the fixed per-invocation cost (tunnel adds ~35 ms RTT/call)."""
    def timed(arr):
        best = float("inf")
        for _ in range(n_rep):
            t0 = time.perf_counter()
            np.asarray(many(arr))
            best = min(best, time.perf_counter() - t0)
        return best

    t_full = timed(xs)
    if scans >= 8:
        n_small = scans // 4
        t_small = timed(xs[:n_small])
        return (t_full - t_small) / ((scans - n_small) * batch) * 1e3
    return t_full / (scans * batch) * 1e3


def _scan_device_p50_per_image_ms(many, xs, scans, batch, n_runs=12):
    """Per-image on-device time of the already-compiled scan program:
    p50 of the program's device-lane duration over n_runs invocations,
    divided by scans*batch. No second compile (round-3 verdict #1)."""
    import shutil

    from tfpose_tpu.utils.profiling import (device_event_durations_ms,
                                            trace)

    log_dir = "/tmp/tfpose_tpu_bench_p50"
    shutil.rmtree(log_dir, ignore_errors=True)
    with trace(log_dir):
        for _ in range(n_runs):
            np.asarray(many(xs))
    durs = device_event_durations_ms(log_dir)
    jit_events = [v for k, v in durs.items() if k.startswith("jit_")]
    if not jit_events:
        raise RuntimeError(f"no jit_ device events in {log_dir}")
    runs = max(jit_events, key=len)  # the traced program dominates
    return float(np.percentile(runs, 50)) / (scans * batch)


def bench_config(model, w, h, ratio, batch, scans, dtype="bfloat16",
                 n_rep=6, fast=False, params_path=None,
                 scene_images=False, measure_p50=True):
    # n_rep: per-image time is min-of-n_rep of the differential slope's
    # two endpoints; the tunnel's per-call jitter is one-sided, so the
    # min is the clean estimate.
    import jax
    import jax.numpy as jnp

    from tfpose_tpu.core.config import DecodeParams
    from tfpose_tpu.models import get_network
    from tfpose_tpu.ops.decode import decode_batch
    from tfpose_tpu.pipeline.preprocess import normalize

    net = get_network(model, dtype=jnp.bfloat16 if dtype == "bfloat16"
                      else jnp.float32)
    # Init on the CPU backend at a small spatial size: this ASSUMES
    # every benched model is fully convolutional (all registry models
    # are — a spatially-shaped param would load wrong-shaped here and
    # only fail at apply time), and a remote init compile through
    # the tunnel cost 150-330 s PER CONFIG in the cold-cache rehearsal
    # (decode_scene, the one config with no net.init, had 21 s of
    # overhead vs 150-330 s for the model configs). One device_put
    # replaces all of it.
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 96, 96, 3), jnp.float32),
                             train=False)
    if params_path is not None:
        from tfpose_tpu.convert.checkpoint import load_params
        variables = load_params(params_path, variables)
    variables = jax.device_put(variables, jax.devices()[0])
    params = DecodeParams.fast() if fast else DecodeParams()
    up_h, up_w = int(h / 8 * ratio), int(w / 8 * ratio)

    def body(imgs):  # (B, H, W, 3) uint8 -> scalar
        outs = net.apply(variables, normalize(imgs),
                         train=False)["concat_stage7"]
        d = decode_batch(outs, up_h, up_w, params)
        return d.human_scores.sum()

    @jax.jit
    def many(xs):
        def step(c, x):
            return c + body(x), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), xs)
        return acc

    rng = np.random.default_rng(0)
    if scene_images:
        from tfpose_tpu.utils.synthetic import random_people, render_image
        frames = []
        for _ in range(min(scans, 16) * batch):
            people = random_people(rng, int(rng.integers(1, 5)), h, w)
            frames.append(render_image(people, h, w, rng=rng,
                                       joint_radius=6))
        arr = np.stack(frames).reshape(-1, batch, h, w, 3)
        reps = (scans + arr.shape[0] - 1) // arr.shape[0]
        xs = jnp.asarray(np.tile(arr, (reps, 1, 1, 1, 1))[:scans])
    else:
        xs = jnp.asarray(rng.integers(
            0, 255, (scans, batch, h, w, 3), np.uint8))
    t0 = time.perf_counter()
    np.asarray(many(xs))  # compile + first run
    compile_s = time.perf_counter() - t0

    per_image_ms = _slope_timer(many, xs, scans, batch, n_rep)
    result = {"per_image_ms": round(per_image_ms, 4),
              "images_per_sec": round(1e3 / per_image_ms, 1),
              "batch": batch, "compile_s": round(compile_s, 1)}

    if measure_p50:
        p50 = _scan_device_p50_per_image_ms(many, xs, scans, batch)
        result["device_p50_per_image_ms"] = round(p50, 4)
    return result


def bench_decode_realistic(w=432, h=368, ratio=4.0, batch=16, scans=32,
                           n_rep=6):
    """Decode-only cost on realistic multi-person activations (rendered
    scene tensors in the trainer's target format), vs the worst-case
    noise the e2e configs use. Decode cost is population-dependent;
    this is the production-representative number."""
    import jax
    import jax.numpy as jnp

    from tfpose_tpu.core.config import DecodeParams
    from tfpose_tpu.ops.decode import decode_batch
    from tfpose_tpu.utils.synthetic import render_scene

    h8, w8 = h // 8, w // 8
    up_h, up_w = int(h8 * ratio), int(w8 * ratio)
    params = DecodeParams()
    rng = np.random.default_rng(7)
    outs = []
    for _ in range(min(scans, 8) * batch):
        out, _ = render_scene(rng, int(rng.integers(1, 6)), h8, w8,
                              noise=0.02)
        outs.append(out)
    arr = np.stack(outs).reshape(-1, batch, h8, w8, 57)
    reps = (scans + arr.shape[0] - 1) // arr.shape[0]
    xs = jnp.asarray(np.tile(arr, (reps, 1, 1, 1, 1))[:scans])

    def body(out57):
        return decode_batch(out57, up_h, up_w, params).human_scores.sum()

    @jax.jit
    def many(xs):
        def step(c, x):
            return c + body(x), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), xs)
        return acc

    t0 = time.perf_counter()
    np.asarray(many(xs))
    compile_s = time.perf_counter() - t0
    per_image_ms = _slope_timer(many, xs, scans, batch, n_rep)
    return {"per_image_ms": round(per_image_ms, 4),
            "images_per_sec": round(1e3 / per_image_ms, 1),
            "batch": batch, "compile_s": round(compile_s, 1)}


def main():
    from tfpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    # Start the deadline clock at the first SUCCESSFUL device op, not
    # at import: the axon tunnel can refuse a new client for many
    # minutes right after a previous client exits (measured: a 20 min
    # backend-init wedge in round 5 counted as "compile", pushed every
    # remaining config past the deadline and skipped them all). The
    # deadline exists to bound measured work, not tunnel recovery.
    global _T0
    import jax
    import jax.numpy as jnp
    t_init = time.perf_counter()
    np.asarray(jnp.zeros((8, 128)) + 1)
    print(f"[bench] device ready "
          f"(init {time.perf_counter() - t_init:.1f}s, "
          f"excluded from the deadline)", file=sys.stderr)
    _T0 = time.perf_counter()

    results = {}
    skipped = []

    def emit():
        """Print the summary JSON (complete record of what has finished
        so far). Called after every completed config and again at the
        very end, so a driver-side kill mid-run still leaves a
        parseable line (round-3 verdict #1: BENCH_r03 rc=124,
        parsed null)."""
        head = results.get("thin_432x368_b1")
        if head is None:
            line = {"metric": "error", "value": 0,
                    "unit": "images/sec", "vs_baseline": 0}
        else:
            batched = results.get("thin_432x368_b16", head)
            line = {
                "metric": "images_per_sec_per_chip_mobilenet_thin_432x368",
                "value": head["images_per_sec"],
                "unit": "images/sec",
                "vs_baseline": round(
                    head["images_per_sec"] / BASELINE_IMAGES_PER_SEC, 2),
                "p50_latency_ms": head.get("device_p50_per_image_ms",
                                           head["per_image_ms"]),
                "throughput_slope_ms": head["per_image_ms"],
                "batched_images_per_sec": batched["images_per_sec"],
                "elapsed_s": round(_elapsed(), 1),
                "skipped": skipped,
                "configs": results,
            }
        print(json.dumps(line), flush=True)

    def run(name, fn, *a, **kw):
        # Global deadline: never START a config past it; whatever
        # completed still reaches the summary JSON.
        if _elapsed() > _deadline_s():
            skipped.append(name)
            print(f"[bench] {name} SKIPPED (deadline "
                  f"{_deadline_s():.0f}s exceeded at {_elapsed():.0f}s)",
                  file=sys.stderr)
            return
        # One retry: the tunnel's remote-compile service occasionally
        # drops a response mid-read (INTERNAL: read body ...) or leaves
        # the next program with a bare FAILED_PRECONDITION; both clear
        # on a clean re-run (CLAUDE.md).
        for attempt in (1, 2):
            try:
                r = fn(*a, **kw)
                results[name] = r
                p50 = r.get("device_p50_per_image_ms")
                p50_txt = f"p50 {p50} ms/img, " if p50 is not None else ""
                print(f"[bench] {name}: {r['per_image_ms']} ms/img "
                      f"({r['images_per_sec']} img/s, b={r['batch']}, "
                      f"{p50_txt}compile {r['compile_s']}s, "
                      f"t={_elapsed():.0f}s)",
                      file=sys.stderr)
                # re-flush the summary after EVERY completed config:
                # the driver's record is whatever JSON line stdout last
                # held when (if) it kills the process
                if "thin_432x368_b1" in results:
                    emit()
                return
            except Exception as e:
                print(f"[bench] {name} FAILED (attempt {attempt}): {e}",
                      file=sys.stderr)
                if attempt == 1:
                    if _elapsed() > _deadline_s():
                        skipped.append(name)
                        return
                    time.sleep(20)

    # The two headline configs run first and the summary JSON is
    # flushed immediately after them; remaining configs are ordered
    # cheap-compile-first (CMU's conv HLO takes minutes to compile
    # remotely) so a deadline cut loses the least information.
    run("thin_432x368_b1", bench_config,
        "mobilenet_thin", 432, 368, 4.0, 1, 128)
    run("thin_432x368_b16", bench_config,
        "mobilenet_thin", 432, 368, 4.0, 16, 32)

    if not os.environ.get("TFPOSE_BENCH_QUICK"):
        run("v2small_368x368_b8", bench_config,
            "mobilenet_v2_small", 368, 368, 4.0, 8, 32)
        run("v2large_432x368_b1", bench_config,
            "mobilenet_v2_large", 432, 368, 4.0, 1, 128)
        # realistic activations (decode is population-dependent)
        run("decode_scene_432x368_b16", bench_decode_realistic)
        root = os.path.dirname(os.path.abspath(__file__))
        # realistic e2e: the trained checkpoint on rendered scene
        # images, at the resolution it was trained for when the
        # production-resolution (368) checkpoint exists
        ckpt368 = os.path.join(root,
                               "models/trained/thin368_coco/params.msgpack")
        ckpt160 = os.path.join(root,
                               "models/trained/thin160_synth/params.msgpack")
        if os.path.exists(ckpt368):
            run("thin_scene_ckpt_432x368_b16", bench_config,
                "mobilenet_thin", 432, 368, 4.0, 16, 32,
                params_path=ckpt368, scene_images=True)
        elif os.path.exists(ckpt160):
            run("thin_scene_ckpt_432x368_b16", bench_config,
                "mobilenet_thin", 432, 368, 4.0, 16, 32,
                params_path=ckpt160, scene_images=True)
        run("cmu_656x368_b1", bench_config,
            "cmu", 656, 368, 4.0, 1, 32, n_rep=4)
        # The forward-only +3% at b=16 survives decode e2e: 294.7 vs
        # 289.3 img/s at b=8, measured in one process
        # (etcs/cmu_b16_r5.json) — b=16 is the production config.
        run("cmu_656x368_b16", bench_config,
            "cmu", 656, 368, 4.0, 16, 8, n_rep=4)
        # vestigial fast-preset config (its edge evaporated in round 3;
        # BASELINE.md) — opt-in only
        if os.environ.get("TFPOSE_BENCH_FAST"):
            run("thin_fast_432x368_b1", bench_config,
                "mobilenet_thin", 432, 368, 4.0, 1, 128, fast=True)

    emit()


if __name__ == "__main__":
    main()
