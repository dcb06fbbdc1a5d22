#!/usr/bin/env python
"""Training CLI — reference ``tf_pose/train.py`` equivalents:
``--model --batchsize --lr --max-steps --checkpoint-dir``; data comes
from COCO (``--coco-json --img-dir``) or ``--synthetic`` (rendered
scenes, hermetic smoke training). Multi-chip: data-parallel over a
device mesh (``--mesh-data N --mesh-spatial M``), gradients all-reduced
over ICI by XLA.
"""

import argparse
import logging
import os
import time

import numpy as np

logger = logging.getLogger("tfpose_tpu.train")
logging.basicConfig(level=logging.INFO)


def synthetic_joint_batches(batch_size, wh, rng, max_people=8,
                            style_randomize=False, uint8_feed=False):
    """Stream of {'image', 'joints'} batches for --device-targets.

    ``uint8_feed`` ships raw uint8 frames (1/4 the bytes; the train
    step normalizes on device) — through the dev tunnel the image
    upload dominates the step wall, so this is ~3x end-to-end."""
    from tfpose_tpu.pipeline.preprocess import normalize
    from tfpose_tpu.utils import synthetic

    w, h = wh
    while True:
        imgs, joints = [], []
        for _ in range(batch_size):
            n = int(rng.integers(1, 4))
            people = synthetic.random_people(
                rng, n, h, w, template=synthetic.SPREAD_TEMPLATE)
            style = (synthetic.random_style(rng)
                     if style_randomize else {})
            img = synthetic.render_image(people, h, w, rng, **style)
            padded = np.full((max_people, 18, 2), np.nan, np.float32)
            padded[:n] = people / 8.0  # stride-8 coords
            imgs.append(img if uint8_feed
                        else np.asarray(normalize(img)))
            joints.append(padded)
        yield {"image": np.stack(imgs), "joints": np.stack(joints)}


def synthetic_batches(batch_size, wh, rng, sigma=8.0,
                      style_randomize=False):
    """Endless stream of rendered scenes as training batches: part-
    colour-coded joint images (same convention the e2e eval gate
    renders) with stride-8 heatmap/PAF targets."""
    from tfpose_tpu.pipeline.preprocess import normalize
    from tfpose_tpu.train.dataset import get_heatmap, get_vectormap
    from tfpose_tpu.utils import synthetic

    w, h = wh
    hs, ws = h // 8, w // 8
    while True:
        imgs, heats, pafs = [], [], []
        for _ in range(batch_size):
            n = int(rng.integers(1, 4))
            people = synthetic.random_people(
                rng, n, h, w, template=synthetic.SPREAD_TEMPLATE)
            style = (synthetic.random_style(rng)
                     if style_randomize else {})
            img = synthetic.render_image(people, h, w, rng, **style)
            heat = get_heatmap(people / 8.0, hs, ws, sigma=sigma / 8.0)
            paf = get_vectormap(people / 8.0, hs, ws, threshold=1.0)
            imgs.append(np.asarray(normalize(img)))
            heats.append(heat)
            pafs.append(paf)
        yield {"image": np.stack(imgs), "heat": np.stack(heats),
               "paf": np.stack(pafs)}


def main(argv=None):
    parser = argparse.ArgumentParser(description="tfpose_tpu trainer")
    parser.add_argument("--model", type=str, default="mobilenet_thin")
    parser.add_argument("--input-size", type=str, default="368x368")
    parser.add_argument("--batchsize", type=int, default=16)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--max-steps", type=int, default=100)
    parser.add_argument("--decay-steps", type=int, default=10000)
    parser.add_argument("--decay-rate", type=float, default=0.33)
    parser.add_argument("--checkpoint-dir", type=str, default="")
    parser.add_argument("--save-every", type=int, default=1000)
    parser.add_argument("--log-every", type=int, default=10)
    parser.add_argument("--coco-json", type=str, default="")
    parser.add_argument("--img-dir", type=str, default="")
    parser.add_argument("--datum-shard", type=str, default="",
                        help="train from a Caffe-Datum record shard "
                             "(legacy LMDB path; reference datum_pb2 "
                             "-- see train/lmdb_dataset.py)")
    parser.add_argument("--no-augment", action="store_true",
                        help="disable the pose_augment chain (fixed "
                             "resize only)")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--style-randomize", action="store_true",
                        help="domain-randomise the synthetic render "
                             "style (dark-noise AND bright sample-"
                             "photo looks; see synthetic.random_style)")
    parser.add_argument("--uint8-feed", action="store_true",
                        help="ship raw uint8 frames and normalize on "
                             "device (1/4 the host->device bytes)")
    parser.add_argument("--bf16", action="store_true",
                        help="mixed-precision training: bf16 compute "
                             "in the network (MXU-native on TPU), fp32 "
                             "params/optimizer/BN-stats/loss")
    parser.add_argument("--prefetch", type=int, default=2,
                        help="host-side batch prefetch depth (0 = off)")
    parser.add_argument("--device-targets", action="store_true",
                        help="rasterise heatmap/PAF targets on device "
                             "inside the jitted step (host ships joint "
                             "coords only)")
    parser.add_argument("--mesh-data", type=int, default=0,
                        help="0 = all devices on the data axis")
    parser.add_argument("--mesh-spatial", type=int, default=1,
                        help=">1 shards image/target height over the "
                             "mesh 'spatial' axis (GSPMD halo "
                             "exchanges)")
    parser.add_argument("--remote-data", type=str, default="",
                        help="comma-separated worker host:port list; "
                             "consume batches from remote dataworkers "
                             "(reference --remote-data / "
                             "pose_dataworker.py)")
    parser.add_argument("--logdir", type=str, default="",
                        help="TensorBoard log dir (scalars + rendered "
                             "predictions); default <checkpoint-dir>/"
                             "logs when checkpointing")
    parser.add_argument("--image-summary-every", type=int, default=200)
    parser.add_argument("--resume", type=str, default="")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tfpose_tpu.models import get_network, model_wh
    from tfpose_tpu.parallel.mesh import (
        make_mesh, replicated, shard_batch)
    from tfpose_tpu.train.state import (
        TrainState, make_optimizer, make_train_step)
    from tfpose_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    w, h = model_wh(args.input_size)
    # --bf16: flax keeps params (and therefore Adam state) fp32; only
    # the layer compute dtype drops to bf16. Loss/targets stay fp32
    # (stage_l2_loss upcasts), BN statistics are computed in fp32 by
    # flax regardless of dtype, and bf16 shares fp32's exponent range
    # so no loss scaling is needed.
    net = get_network(args.model,
                      dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, h, w, 3), jnp.float32), train=True)
    tx = make_optimizer(args.lr, args.decay_rate, args.decay_steps)
    state = TrainState.create(variables, tx)
    train_step = make_train_step(net, tx, rasterize=args.device_targets)

    ckpt_mgr = None
    if args.checkpoint_dir:
        import orbax.checkpoint as ocp
        args.checkpoint_dir = os.path.abspath(args.checkpoint_dir)
        ckpt_mgr = ocp.CheckpointManager(
            args.checkpoint_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=3))
        if args.resume:
            # accept a step number, 'latest', or (for convenience) the
            # checkpoint dir itself
            if args.resume.isdigit():
                step0 = int(args.resume)
            else:
                step0 = ckpt_mgr.latest_step()
                if step0 is None:
                    raise SystemExit(
                        f"no checkpoints in {args.checkpoint_dir}")
            state = ckpt_mgr.restore(
                step0, args=ocp.args.StandardRestore(state))
            logger.info("resumed from step %s", step0)

    n_dev = len(jax.devices())
    n_data = args.mesh_data or max(n_dev // args.mesh_spatial, 1)
    mesh = make_mesh(n_data=n_data, n_spatial=args.mesh_spatial)
    logger.info("mesh: %s over %d devices", dict(mesh.shape), n_dev)

    rng = np.random.default_rng(0)
    prefetch_wrap = False
    if args.remote_data:
        from tfpose_tpu.train.dataworker import RemoteBatches
        addrs = [(hp.rsplit(":", 1)[0], int(hp.rsplit(":", 1)[1]))
                 for hp in args.remote_data.split(",")]
        batches = iter(RemoteBatches(addrs))
        logger.info("consuming remote batches from %s", addrs)
    elif args.datum_shard:
        from tfpose_tpu.train.lmdb_dataset import (
            DatumPoseDataset, DatumShardReader)
        reader = DatumShardReader(args.datum_shard)
        logger.info("%d datum records", len(reader))

        def datum_epochs():
            ep = 0
            while True:
                # advance the seed per epoch: a fixed seed would replay
                # identical augmentations/order every pass
                yield from DatumPoseDataset(
                    reader, input_size=(w, h), batch_size=args.batchsize,
                    augment=not args.no_augment, seed=ep,
                    device_targets=args.device_targets,
                    uint8=args.uint8_feed)
                ep += 1
        batches = datum_epochs()
        prefetch_wrap = True
    elif args.synthetic or not args.coco_json:
        if args.device_targets:
            batches = synthetic_joint_batches(
                args.batchsize, (w, h), rng,
                style_randomize=args.style_randomize,
                uint8_feed=args.uint8_feed)
        else:
            batches = synthetic_batches(
                args.batchsize, (w, h), rng,
                style_randomize=args.style_randomize)
        if args.prefetch:
            from tfpose_tpu.train.dataset import PrefetchIterator
            batches = iter(PrefetchIterator(batches,
                                            depth=args.prefetch))
    else:
        from tfpose_tpu.train.dataset import (
            PoseDataset, load_coco_annotations)
        anns = load_coco_annotations(args.coco_json, args.img_dir)
        logger.info("%d annotated images", len(anns))

        def epochs():
            ep = 0
            while True:
                # advance the seed per epoch: a fixed seed would replay
                # identical augmentations/order every pass
                yield from PoseDataset(anns, (w, h), args.batchsize,
                                       augment=not args.no_augment,
                                       seed=ep,
                                       device_targets=args.device_targets,
                                       uint8=args.uint8_feed)
                ep += 1
        batches = epochs()
        prefetch_wrap = True

    if prefetch_wrap and args.prefetch:
        # overlap host-side image read + augment + rasterize with the
        # device step (the synthetic branches already prefetch)
        from tfpose_tpu.train.dataset import PrefetchIterator
        batches = iter(PrefetchIterator(batches, depth=args.prefetch))

    from tfpose_tpu.train.summaries import (
        make_writer, write_prediction_panel, write_scalars)
    logdir = args.logdir or (args.checkpoint_dir + "/logs"
                             if args.checkpoint_dir else "")
    writer = make_writer(logdir)

    @jax.jit
    def predict_heat(state, image):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        if image.dtype == jnp.uint8:  # --uint8-feed batches
            image = image.astype(jnp.float32) / 256.0 - 0.5
        out = net.apply(variables, image, train=False)["concat_stage7"]
        return out[..., :19]  # heat channels lead the 57-ch concat

    step_jit = jax.jit(train_step)
    spatial_axis = 1 if args.mesh_spatial > 1 else None
    base = int(state.step)  # nonzero after --resume: steps continue
    with mesh:
        state = jax.device_put(state, replicated(mesh))
        t0 = time.time()
        for step, batch in enumerate(batches):
            gstep = base + step + 1
            if gstep > args.max_steps:
                break
            batch = shard_batch(mesh, batch, spatial_axis=spatial_axis)
            state, metrics = step_jit(state, batch)
            if gstep % args.log_every == 0:
                loss = float(metrics["loss"])
                rate = (step + 1) * args.batchsize / (time.time() - t0)
                logger.info("step %d loss=%.1f (%.1f img/s)",
                            gstep, loss, rate)
                write_scalars(
                    writer, gstep,
                    {f"train/{k}": float(v) for k, v in metrics.items()})
                writer.scalar("train/images_per_sec", rate, gstep)
            if (args.image_summary_every and logdir
                    and gstep % args.image_summary_every == 0):
                sample = np.asarray(batch["image"][:1])
                heat_pred = np.asarray(predict_heat(state, sample))[0]
                heat_gt = (np.asarray(batch["heat"][0])
                           if "heat" in batch else None)
                write_prediction_panel(writer, gstep, sample[0],
                                       heat_pred, heat_gt)
            if ckpt_mgr and gstep % args.save_every == 0:
                ckpt_mgr.save(gstep, args=__import__(
                    "orbax.checkpoint", fromlist=["args"]
                ).args.StandardSave(jax.device_get(state)))
    writer.flush()
    if ckpt_mgr:
        import orbax.checkpoint as ocp
        if ckpt_mgr.latest_step() != int(state.step):
            ckpt_mgr.save(
                int(state.step),
                args=ocp.args.StandardSave(jax.device_get(state)))
        ckpt_mgr.wait_until_finished()
        logger.info("final checkpoint saved")
    # export inference params
    if args.checkpoint_dir:
        from tfpose_tpu.convert.checkpoint import save_params
        out = {"params": jax.device_get(state.params)}
        if state.batch_stats:
            out["batch_stats"] = jax.device_get(state.batch_stats)
        save_params(args.checkpoint_dir + "/params.msgpack", out)
        logger.info("inference params exported")
    return state


if __name__ == "__main__":
    main()
