"""Generate the golden decode fixtures (run once; committed output).

Freezes three synthetic scenes and the oracle's decode of them so any
future change to the decode semantics — oracle or JAX — trips the
regression test, independent of both implementations.

Usage: python tests/make_golden.py
"""

import os

import numpy as np

from tfpose_tpu.core.config import DecodeParams
from tfpose_tpu.oracle import numpy_decoder, numpy_post
from tfpose_tpu.utils import synthetic

OUT = os.path.join(os.path.dirname(__file__), "fixtures", "golden_decode.npz")


def main():
    params = DecodeParams()
    arrays = {}
    for i, (seed, n_people, noise) in enumerate(
            [(101, 1, 0.0), (102, 3, 0.005), (103, 4, 0.02)]):
        rng = np.random.default_rng(seed)
        net, _ = synthetic.render_scene(rng, n_people, 46, 54,
                                        noise=noise)
        peaks, heat, paf = numpy_post.full_post(net, 184, 216)
        res = numpy_decoder.process_paf(peaks, heat, paf, params)
        arrays[f"net_{i}"] = net.astype(np.float32)
        arrays[f"parts_{i}"] = res.parts.astype(np.float32)
        arrays[f"scores_{i}"] = res.scores.astype(np.float32)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {OUT} ({os.path.getsize(OUT) // 1024} KB)")


if __name__ == "__main__":
    main()
