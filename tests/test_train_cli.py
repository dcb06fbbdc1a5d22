"""Train CLI integration: remote data feed, TensorBoard summaries,
spatial mesh flag (reference train.py --remote-data / summaries,
SURVEY.md §2.3)."""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def test_train_cli_remote_data_and_logdir(tmp_path):
    """train.main consuming batches from a dataworker, writing
    TensorBoard event files, on a (data x spatial) mesh, with --bf16
    mixed precision (the flag must compose with mesh sharding and the
    remote-data feed; numeric learning proof is in test_learning.py)."""
    import train as train_cli
    from tfpose_tpu.train.dataworker import serve_batches

    h = w = 32
    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield {
                "image": rng.normal(size=(4, h, w, 3)).astype(np.float32),
                "heat": rng.uniform(size=(4, h // 8, w // 8, 19))
                .astype(np.float32),
                "paf": rng.uniform(size=(4, h // 8, w // 8, 38))
                .astype(np.float32),
            }

    (host, port), stop = serve_batches(batches())
    logdir = str(tmp_path / "logs")
    try:
        state = train_cli.main([
            "--model", "mobilenet_thin",
            "--input-size", f"{w}x{h}",
            "--batchsize", "4",
            "--max-steps", "3",
            "--log-every", "1",
            "--image-summary-every", "2",
            "--mesh-data", "4", "--mesh-spatial", "2",
            "--remote-data", f"{host}:{port}",
            "--logdir", logdir,
            "--bf16",
        ])
    finally:
        stop()
    assert int(state.step) == 3
    events = [f for f in os.listdir(logdir)
              if "tfevents" in f]
    assert events, f"no event files written in {logdir}"
    # event file must contain actual payload (scalars + image summary)
    size = os.path.getsize(os.path.join(logdir, events[0]))
    assert size > 500, f"event file suspiciously small ({size} B)"
