#!/usr/bin/env python
"""Checkpoint inspector — reference ``tf_pose/run_checkpoint.py``
(builds the net and prints its ops as a pre-freeze sanity tool).
Here: loads/initialises a model, prints the parameter tree with
shapes, sizes, and totals; optionally inspects a msgpack/orbax
checkpoint file."""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="inspect model params")
    parser.add_argument("--model", type=str, default="mobilenet_thin")
    parser.add_argument("--input-size", type=str, default="432x368")
    parser.add_argument("--checkpoint", type=str, default="",
                        help="msgpack params file to inspect")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tfpose_tpu.models import get_network, model_wh

    w, h = model_wh(args.input_size)
    net = get_network(args.model)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, h, w, 3), jnp.float32), train=False)
    if args.checkpoint:
        from tfpose_tpu.convert.checkpoint import load_params
        variables = load_params(args.checkpoint, variables)
        print(f"loaded {args.checkpoint}")

    total = 0
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        print(f"{name:80s} {str(leaf.shape):20s} {leaf.dtype}")
        total += leaf.size
    print(f"\n{args.model}: {len(flat)} tensors, {total:,} parameters "
          f"({total * 4 / 1e6:.1f} MB fp32)")


if __name__ == "__main__":
    main()
