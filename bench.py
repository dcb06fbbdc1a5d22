#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): images/sec/chip at MobileNet-thin
432x368 multi-person, fused decode, single-image e2e (p50 latency
path). The TF1-reference CPU comparator could not be measured (empty
reference mount, see BASELINE.md); the documented reconstructed
baseline is ~0.20 s/image (5 img/s) for mobilenet-thin on a laptop
CPU, which `vs_baseline` is computed against.
"""

import json
import statistics
import sys
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 5.0  # reconstructed TF1 CPU reference (BASELINE.md)


def bench_single(model="mobilenet_thin", w=432, h=368, ratio=4.0,
                 dtype="bfloat16", iters=50):
    import jax
    import jax.numpy as jnp

    from tfpose_tpu.core.config import DecodeParams
    from tfpose_tpu.models import get_network
    from tfpose_tpu.ops.decode import decode
    from tfpose_tpu.pipeline.preprocess import normalize

    net = get_network(model, dtype=jnp.bfloat16 if dtype == "bfloat16"
                      else jnp.float32)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, h, w, 3), jnp.float32), train=False)
    params = DecodeParams()
    up_h, up_w = h // 8 * int(ratio), w // 8 * int(ratio)

    @jax.jit
    def fn(variables, img):
        x = normalize(img)[None]
        out = net.apply(variables, x, train=False)["concat_stage7"][0]
        return decode(out, up_h, up_w, params)

    img = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (h, w, 3), np.uint8))
    # compile + warmup
    jax.block_until_ready(fn(variables, img))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(variables, img))
        times.append(time.perf_counter() - t0)
    p50 = statistics.median(times)
    return p50


def main():
    from tfpose_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p50 = bench_single()
    images_per_sec = 1.0 / p50
    print(json.dumps({
        "metric": "images_per_sec_per_chip_mobilenet_thin_432x368",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 2),
        "p50_latency_ms": round(p50 * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
