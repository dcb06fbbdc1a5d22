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
