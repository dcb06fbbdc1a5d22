"""Prototype: does XLA-on-v5e run int8 separable-conv blocks ~2x faster
than bf16 for mobilenet_thin's shapes?

The thin forward is traffic-bound (354 MB/img bf16 floor, ~97%
achieved — etcs/architecture.md round-3 roofline), so the only
structural lever left is halving activation bytes. This probes whether
the XLA TPU pipeline actually delivers that for int8 convs (incl.
depthwise / feature_group_count) before we invest in a quantized path.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/proto_int8.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tfpose_tpu.utils.cache import enable_compilation_cache
from tfpose_tpu.utils.profiling import amortized_ms

enable_compilation_cache()

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def sep_block_bf16(x, dw_w, pw_w):
    """depthwise 3x3 + relu + pointwise 1x1 + relu, all bf16."""
    c = x.shape[-1]
    y = lax.conv_general_dilated(x, dw_w, (1, 1), "SAME",
                                 dimension_numbers=DN,
                                 feature_group_count=c)
    y = jnp.maximum(y, 0)
    y = lax.conv_general_dilated(y, pw_w, (1, 1), "SAME",
                                 dimension_numbers=DN)
    return jnp.maximum(y, 0)


def sep_block_int8(x, dw_w, pw_w, s_dw, s_pw):
    """Same block, int8 activations + weights, int32 accumulation,
    fused requantize (scale + clip + round) between the convs."""
    c = x.shape[-1]
    y = lax.conv_general_dilated(x, dw_w, (1, 1), "SAME",
                                 dimension_numbers=DN,
                                 feature_group_count=c,
                                 preferred_element_type=jnp.int32)
    y = jnp.maximum(y, 0).astype(jnp.float32) * s_dw
    y = jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)
    y = lax.conv_general_dilated(y, pw_w, (1, 1), "SAME",
                                 dimension_numbers=DN,
                                 preferred_element_type=jnp.int32)
    y = jnp.maximum(y, 0).astype(jnp.float32) * s_pw
    return jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)


def bench_shape(h, w, cin, cout, batch=16, scans=16):
    rng = np.random.default_rng(0)
    xs_f = rng.standard_normal((scans, batch, h, w, cin), np.float32)
    dw_f = rng.standard_normal((3, 3, 1, cin), np.float32) * 0.1
    pw_f = rng.standard_normal((1, 1, cin, cout), np.float32) * 0.1

    xb = jnp.asarray(xs_f, jnp.bfloat16)
    dwb = jnp.asarray(dw_f, jnp.bfloat16)
    pwb = jnp.asarray(pw_f, jnp.bfloat16)
    t_bf16 = amortized_ms(
        lambda x: sep_block_bf16(x, dwb, pwb).astype(jnp.float32).sum(), xb)

    xi = jnp.asarray(np.clip(xs_f * 30, -127, 127).astype(np.int8))
    dwi = jnp.asarray(np.clip(dw_f * 300, -127, 127).astype(np.int8))
    pwi = jnp.asarray(np.clip(pw_f * 300, -127, 127).astype(np.int8))
    t_int8 = amortized_ms(
        lambda x: sep_block_int8(x, dwi, pwi, 1e-3, 1e-3)
        .astype(jnp.float32).sum(), xi)

    mb = (h * w * (2 * cin + cout) * batch) / 1e6  # bf16 act bytes/step
    print(f"sep {h}x{w} {cin}->{cout} b{batch}: "
          f"bf16 {t_bf16:.3f} ms  int8 {t_int8:.3f} ms  "
          f"ratio {t_bf16 / t_int8:.2f}x  (~{mb:.0f} MB bf16 act/step)",
          flush=True)


if __name__ == "__main__":
    print(jax.devices(), flush=True)
    bench_shape(184, 216, 24, 48)     # Conv2d_1 (early, big spatial)
    bench_shape(46, 54, 192, 384)     # Conv2d_5 (mid)
    bench_shape(46, 54, 384, 384)     # Conv2d_6..11 (bulk of backbone)
    bench_shape(46, 54, 64, 64, batch=16)  # CPM stage 3x3 sep at mid=64
