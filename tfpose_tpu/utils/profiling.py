"""Profiling / tracing helpers (SURVEY.md §5: jax.profiler trace server
+ per-stage timers replacing the reference's wall-clock deltas and
tf.profiler flops)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tfpose_tpu_trace"):
    """Capture a Perfetto/TensorBoard trace of the enclosed block:
    ``with trace(): humans = e.inference(img)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Live profiling server (connect with TensorBoard's profile tab)."""
    return jax.profiler.start_server(port)


class StageTimer:
    """Accumulating wall-clock stage timer.

    NOTE on this dev environment: the TPU is reached through a tunnel
    where ``block_until_ready`` returns at dispatch; to time device
    work, transfer a small result to host (``np.asarray``) or use
    :func:`amortized_ms` which scans the op inside one program.
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:30s} {total*1e3:10.2f} ms total "
                         f"{total/n*1e3:8.3f} ms/call x{n}")
        return "\n".join(lines)


def device_event_durations_ms(log_dir: str,
                              prefix: str = "jit_") -> Dict[str, list]:
    """Parse the newest trace in ``log_dir`` and return device-lane
    event durations (ms) grouped by event name.

    The Perfetto/chrome trace emitted by ``jax.profiler`` carries true
    on-device timestamps, so these durations are immune to the dev
    tunnel's dispatch-time ``block_until_ready`` (CLAUDE.md) — this is
    the only honest per-program latency available in this environment.
    ``prefix=None`` returns every device event (per-op profile).
    """
    import glob
    import gzip
    import json
    import os

    paths = sorted(glob.glob(os.path.join(
        log_dir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e["args"].get("name", ""))}
    out: Dict[str, list] = {}
    for e in events:
        if e.get("ph") == "X" and e["pid"] in device_pids:
            name = e["name"]
            if prefix is None or name.startswith(prefix):
                out.setdefault(name, []).append(e["dur"] / 1e3)
    return out


def device_p50_ms(fn, args, n_runs: int = 30,
                  log_dir: str = "/tmp/tfpose_tpu_p50") -> float:
    """True on-device p50 latency (ms) of one execution of jitted
    ``fn(*args)``, measured from the device lane of a profiler trace
    (NOT a host wall — see :func:`device_event_durations_ms`)."""
    import shutil

    import numpy as np

    jax.block_until_ready(fn(*args))  # compile outside the trace
    shutil.rmtree(log_dir, ignore_errors=True)
    with trace(log_dir):
        for _ in range(n_runs):
            np.asarray(jax.tree.leaves(fn(*args))[0])
    durs = device_event_durations_ms(log_dir)
    jit_events = [v for k, v in durs.items() if k.startswith("jit_")]
    if not jit_events:
        raise RuntimeError(f"no jit_ device events in {log_dir}")
    # the traced fn is the dominant program; pick the name with the
    # most occurrences (warmup/transfer programs appear once or twice)
    runs = max(jit_events, key=len)
    return float(np.percentile(runs, 50))


def amortized_ms(body, xs, n_rep: int = 3,
                 differential: bool = True) -> float:
    """Per-iteration wall time of ``body`` scanned over the leading
    axis of ``xs`` inside ONE jitted program, with a forced host
    transfer — robust to async-dispatch backends.

    ``differential=True`` (default) times the scan at two lengths
    (N and N//4) and returns the slope, cancelling the fixed per-call
    cost exactly (the dev tunnel adds ~35 ms RTT per invocation, which
    otherwise inflates the result by RTT/N)."""
    import numpy as np
    import jax.numpy as jnp

    n_iter = int(xs.shape[0])

    def timed(arr):
        @jax.jit
        def many(xs):
            def step(carry, x):
                return carry + body(x), None
            acc, _ = jax.lax.scan(step, jnp.float32(0), xs)
            return acc

        np.asarray(many(arr))  # compile
        best = float("inf")
        for _ in range(n_rep):
            t0 = time.perf_counter()
            np.asarray(many(arr))
            best = min(best, time.perf_counter() - t0)
        return best

    t_full = timed(xs)
    if not differential or n_iter < 8:
        return t_full / n_iter * 1e3
    n_small = n_iter // 4
    t_small = timed(xs[:n_small])
    return (t_full - t_small) / (n_iter - n_small) * 1e3
