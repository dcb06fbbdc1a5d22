#!/usr/bin/env python
"""Device-trace profile of the BACKBONE FORWARD (round-3 verdict #2).

For each config: true on-device p50 of the forward program, per-op
device durations (top ops by total time), and XLA cost-analysis FLOPs
-> achieved TFLOP/s (vs v5e bf16 peak ~394). This replaces the stale
round-1 roofline in etcs/architecture.md and gives the first CMU
MXU-utilisation number.

NOTE on bandwidth: `cost_analysis()["bytes accessed"]` OVERCOUNTS HBM
traffic (it reports more than HBM peak at b=1 — every fusion's
operands are counted at every use). It is emitted here only as
`cost_analysis_bytes_gb`, an upper bound for eyeballing; HBM roofline
claims must use the analytic conv in+out+weights sum (see the
round-3 roofline in etcs/architecture.md and CLAUDE.md).

Run on TPU: `python scripts/profile_forward.py [quick]`
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from tfpose_tpu.models import get_network
from tfpose_tpu.pipeline.preprocess import normalize
from tfpose_tpu.utils.cache import enable_compilation_cache
from tfpose_tpu.utils.profiling import (
    device_event_durations_ms,
    device_p50_ms,
)

V5E_BF16_TFLOPS = 394.0


def profile_forward(model, w, h, batch, dtype=jnp.bfloat16):
    net = get_network(model, dtype=dtype)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, h, w, 3), jnp.float32),
                         train=False)

    def fwd(variables, img):
        x = normalize(img)
        return net.apply(variables, x, train=False)["concat_stage7"]

    img = np.random.default_rng(0).integers(
        0, 255, (batch, h, w, 3), np.uint8)
    jfwd = jax.jit(fwd)
    lowered = jfwd.lower(variables, jnp.asarray(img))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    log_dir = f"/tmp/tfpose_fwd_{model}_{batch}"
    p50 = device_p50_ms(jfwd, (variables, jnp.asarray(img)),
                        n_runs=30, log_dir=log_dir)
    sec = p50 / 1e3
    result = {
        "model": model, "batch": batch, "hw": f"{w}x{h}",
        "device_p50_ms": round(p50, 4),
        "per_image_ms": round(p50 / batch, 4),
        "gflops": round(flops / 1e9, 2),
        "achieved_tflops": round(flops / sec / 1e12, 2),
        "mxu_util_pct": round(flops / sec / 1e12
                              / V5E_BF16_TFLOPS * 100, 1),
        # upper bound only — NOT a roofline number (see module note)
        "cost_analysis_bytes_gb": round(bytes_acc / 1e9, 3),
    }

    # top device ops by total time (per-op events, not jit_ programs)
    durs = device_event_durations_ms(log_dir, prefix=None)
    ops = []
    for name, ds in durs.items():
        if name.startswith("jit_") or name.startswith("Infeed"):
            continue
        ops.append((sum(ds), len(ds), name))
    ops.sort(reverse=True)
    total = sum(t for t, _, _ in ops)
    result["top_ops"] = [
        {"name": n[:90], "total_ms": round(t, 3), "n": c,
         "pct": round(t / total * 100, 1)}
        for t, c, n in ops[:15]]
    result["trace_total_ms"] = round(total, 2)
    return result


def main():
    enable_compilation_cache()
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    configs = [("mobilenet_thin", 432, 368, 1),
               ("mobilenet_thin", 432, 368, 16)]
    if not quick:
        configs += [("cmu", 656, 368, 1),
                    ("cmu", 656, 368, 8)]
    out = []
    for model, w, h, b in configs:
        r = profile_forward(model, w, h, b)
        out.append(r)
        print(json.dumps(r, indent=1), flush=True)
    with open("/tmp/profile_forward.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
