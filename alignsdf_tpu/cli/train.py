"""Training driver CLI — reference train.py:201-714 rebuilt TPU-native.

Usage:
    python -m alignsdf_tpu.cli.train -e experiments/obman/30k_1e2d_mlp5.json \
        [--mano --obj_pose --encode both ...reference override flags...]

Differences from the reference by design:
  * one process per HOST (not per chip): jax.distributed.initialize + a global
    1-D data mesh replace torch.distributed/NCCL (reference train.py:220-228);
  * a single jitted train step handles DP gradient psum and global-batch
    SyncBatchNorm via GSPMD (reference train.py:350,398,583);
  * orbax checkpoints under the reference's workspace layout;
  * metrics to JSONL (+TensorBoard if available) on host 0.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import signal
import socket
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from alignsdf_tpu import config as cfg
from alignsdf_tpu.data import make_train_dataset
from alignsdf_tpu.data.dataset import to_train_batch
from alignsdf_tpu.data.loader import DataLoader
from alignsdf_tpu.models.alignsdf import build_model
from alignsdf_tpu.parallel.mesh import make_mesh, maybe_initialize_distributed
from alignsdf_tpu.training import checkpoints as ckpt
from alignsdf_tpu.training.train_state import make_optimizer
from alignsdf_tpu.training.train_step import init_train_state, make_train_step

logger = logging.getLogger("alignsdf_tpu.train")


def batch_shardings(mesh):
    """Leading-axis data sharding for every batch field."""
    data = NamedSharding(mesh, P("data"))
    fields = ("image", "xyz", "sdf_gt_hand", "sdf_gt_obj", "labels", "cam_intr",
              "mano_root", "rest_obj_corners", "hand_joints_3d", "obj_center",
              "obj_corners")
    return {f: data for f in fields}


def install_slurm_requeue_handler() -> None:
    """SIGUSR1 -> scontrol requeue from process 0 (reference train.py:30-47);
    training then resumes from the latest checkpoint on restart."""

    def handler(signum, frame):
        logger.warning("signal %s on %s", signum, socket.gethostname())
        if int(os.environ.get("SLURM_PROCID", "0")) == 0:
            job = os.environ.get("SLURM_JOB_ID")
            logger.warning("requeuing job %s", job)
            os.system(f"scontrol requeue {job}")
        sys.exit(-1)

    signal.signal(signal.SIGUSR1, handler)
    logger.warning("SLURM requeue handler installed")


def main(argv: Optional[list] = None) -> None:
    parser = argparse.ArgumentParser(description="AlignSDF-TPU training")
    parser.add_argument("-e", dest="cfg", required=True, help="experiment spec json")
    parser.add_argument("--continue", dest="continue_from", default=None)
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--packed", default=None,
                        help="ASDF-pack file (native data path); overrides "
                             "the spec's lmdb/npz backend selection")
    parser.add_argument("--loader_mode", default="thread",
                        choices=["thread", "process"],
                        help="worker mode for the python loader paths (the "
                             "packed backend's native batch path ignores it)")
    parser.add_argument("--output_root", default="outputs")
    parser.add_argument("--smoke", action="store_true",
                        help="2 steps on synthetic data; no checkpoints")
    parser.add_argument("--slow_prng", action="store_true",
                        help="use threefry for dropout instead of rbg")
    parser.add_argument("--fused_decoder", dest="fused_decoder",
                        action="store_true", default=None,
                        help="fused Pallas decoder forward+backward with "
                             "in-kernel dropout (default on TPU)")
    parser.add_argument("--no_fused_decoder", dest="fused_decoder",
                        action="store_false",
                        help="force the XLA decoder path")
    parser.add_argument("--slurm", action="store_true",
                        help="install the SLURM SIGUSR1 requeue handler")
    parser.add_argument("--profile_steps", type=int, default=0,
                        help="capture a jax.profiler device trace of steps "
                             "[10, 10+N) into <exp>/profile (XProf/TensorBoard)")
    parser.add_argument("--skip_test", action="store_true",
                        help="skip the post-training test-set reconstruction "
                             "(reference train.py:653-668 runs it by default)")
    parser.add_argument("--test_split", default=None,
                        help="test filename json for the post-training "
                             "reconstruction (default input/<dataset>.json)")
    parser.add_argument("--test_data_root", default=None,
                        help="test-set directory override for the "
                             "post-training reconstruction")
    parser.add_argument("--test_cube_dim", type=int, default=128)
    parser.add_argument("--no_init_guard", action="store_true",
                        help="skip the clamp dead-zone init check (a fresh "
                             "init whose mean prediction starts in/past the "
                             "ClampingDistance band has a bit-frozen sdf "
                             "loss; the guard re-draws the init seed until "
                             "healthy — see BASELINE.md round 4)")
    parser.add_argument("--pixel_band", dest="pixel_band",
                        action="store_true", default=False,
                        help="banded pixel train kernel + the loader's "
                             "per-scene row ordering for pixel-align "
                             "configs (ops/decoder_train_pixel "
                             "band/presorted) — measured ~neutral on the "
                             "bench, see BASELINE.md r5")
    parser.add_argument("--multistep", type=int, default=1,
                        help="chain N train steps per device dispatch "
                             "(lax.scan over a stacked batch; hides host "
                             "dispatch latency on high-latency links)")
    cfg.add_train_args(parser)
    args = parser.parse_args(argv)

    logging.basicConfig(force=True, level=logging.INFO,
                        format="AlignSDF-TPU - %(levelname)s - %(message)s")

    with open(args.cfg) as f:
        specs = cfg.specs_from_dict(json.load(f))
    specs = cfg.apply_overrides(specs, args)
    if specs.scale_aug:
        logger.warning(
            "ScaleAug is accepted for spec compatibility but not implemented "
            "(the reference stores it and never consults it, networks/model.py:359); "
            "ignoring"
        )

    maybe_initialize_distributed()
    mesh = make_mesh()
    n_dev = len(jax.devices())
    logger.info("devices: %d, mesh: %s", n_dev, mesh)

    if specs.random_seed is not None:
        np.random.seed(specs.random_seed)

    model = build_model(specs)
    optimizer = make_optimizer(specs)
    rng = jax.random.PRNGKey(specs.random_seed or 0)
    # the guard only matters for FRESH params: warm starts / resumes
    # overwrite them immediately
    fresh = not args.smoke and not (
        (specs.resume and os.path.exists(specs.resume))
        or args.continue_from
        or ckpt.checkpoint_exists(
            os.path.join(args.output_root, specs.experiment_name())))
    if fresh and not args.no_init_guard and specs.clamping_distance:
        from alignsdf_tpu.training.train_step import healthy_init_train_state

        state, tries = healthy_init_train_state(model, specs, rng, optimizer)
        if tries > 1:
            logger.warning(
                "init guard: re-drew the init %d time(s) — the first draw(s) "
                "started the decoder inside the %.2f clamp's zero-gradient "
                "dead zone (BASELINE.md round 4)", tries - 1,
                specs.clamping_distance)
    else:
        state = init_train_state(model, specs, rng, optimizer)
    # per-step dropout stream: the TPU-native rbg generator is ~20 ms/step
    # cheaper than threefry at this mask volume (8x 128k x 512 per step);
    # still deterministic per seed.  --slow_prng restores threefry.
    if not args.slow_prng:
        rng = jax.random.key(specs.random_seed or 0, impl="rbg")

    experiment_dir = os.path.join(args.output_root, specs.experiment_name())
    if jax.process_index() == 0 and not args.smoke:
        os.makedirs(experiment_dir, exist_ok=True)
        with open(os.path.join(experiment_dir, "specs.json"), "w") as f:
            json.dump(cfg.specs_to_dict(specs), f, indent=2)

    start_epoch = 1
    if not args.smoke:
        # spec Resume warm start (external checkpoint, non-strict —
        # reference train.py:406-409); a later --continue overrides it
        if specs.resume and os.path.exists(specs.resume):
            state = ckpt.warm_start(state, specs.resume)
        name = args.continue_from or (
            "latest" if ckpt.checkpoint_exists(experiment_dir) else None
        )
        if name:
            state, saved_epoch = ckpt.restore_checkpoint(experiment_dir, state, name)
            start_epoch = saved_epoch + 1
            logger.info("resumed from %s at epoch %d", name, saved_epoch)

    # fused Pallas decoder fwd+bwd: default on TPU (36.7 vs 41.0 ms/step at
    # bf16, BASELINE.md); opt out with --no_fused_decoder
    use_fused = args.fused_decoder
    if use_fused is None:
        use_fused = jax.default_backend() not in ("cpu",)
    decoder_override = None
    pixel_band = False
    if use_fused:
        from alignsdf_tpu.ops.decoder_train_kernel import (
            make_fused_train_decoder,
            make_fused_train_decoder_factored,
        )
        from alignsdf_tpu.ops.decoder_train_pixel import (
            make_fused_train_decoder_pixel,
        )

        # pixel configs: banded sampling contraction with host-side row
        # ordering (the loader sorts each scene by approximate feature
        # row; the kernel's runtime fits check falls back to the full
        # contraction whenever the order is stale).  --no_pixel_band
        # opts out (exact legacy kernel, positional masks)
        pixel_band = specs.pixel_align and getattr(args, "pixel_band", False)
        if pixel_band:
            decoder_override = make_fused_train_decoder_pixel(
                specs, band="auto", presorted=True)
            pixel_band = decoder_override is not None
        if decoder_override is None:
            decoder_override = (make_fused_train_decoder_pixel(specs)
                                or make_fused_train_decoder_factored(specs)
                                or make_fused_train_decoder(specs))
        if decoder_override is None:
            logger.warning("decoder structure unsupported by the fused train "
                           "kernel; using the XLA decoder")
        else:
            kind = ("pixel-aligned" if getattr(decoder_override, "pixel", False)
                    else "scene-factored" if getattr(
                        decoder_override, "factored", False)
                    else "materialized inputs")
            logger.info("using the fused Pallas train decoder (%s)", kind)
    train_step = make_train_step(model, specs, optimizer, decoder_override)
    replicate = NamedSharding(mesh, P())
    batch_sh = batch_shardings(mesh)
    sort_batch = None
    if pixel_band:
        from alignsdf_tpu.data.pixel_sort import pixel_row_sort_batch

        def sort_batch(b):
            return pixel_row_sort_batch(
                b, float(specs.image_size[0]), specs.sdf_scale_factor,
                feat_rows=specs.image_size[0] // 4)

        batch_sh["point_is_hand"] = NamedSharding(mesh, P("data"))
    step_jit = jax.jit(
        train_step,
        in_shardings=(replicate, dict(batch_sh), replicate),
        donate_argnums=(0,),
    )
    multi_jit = None
    if args.multistep > 1:
        from alignsdf_tpu.training.train_step import make_multi_step

        stacked = {f: NamedSharding(mesh, P(None, "data"))
                   for f in batch_sh}
        multi_jit = jax.jit(
            make_multi_step(train_step, args.multistep),
            in_shardings=(replicate, stacked, replicate),
            donate_argnums=(0,),
        )
    state = jax.device_put(state, replicate)

    if args.smoke:
        from alignsdf_tpu.data.synthetic import synthetic_train_batch

        batch = synthetic_train_batch(specs, batch_size=max(2, n_dev))
        if sort_batch is not None:
            batch = sort_batch(batch)
        for step in range(2):
            state = state.replace(epoch=jnp.asarray(1, jnp.int32))
            state, losses = step_jit(state, batch, jax.random.fold_in(rng, step))
            logger.info("smoke step %d: loss=%.5f", step,
                        float(jax.device_get(losses["total"])))
        logger.info("smoke OK")
        return

    split_keys = None
    if specs.train_split:
        with open(specs.train_split) as f:
            split_keys = json.load(f)["train"]
    dataset = make_train_dataset(specs, split_keys, data_root=args.data_root,
                                 pack_path=args.packed, raw_image=True)
    logger.info("train dataset: %d scenes via %s", len(dataset),
                type(dataset.backend).__name__)
    loader = DataLoader(
        dataset,
        batch_size=specs.scenes_per_batch,
        num_workers=specs.data_loader_threads,
        shuffle=True,
        drop_last=True,
        seed=specs.random_seed or 0,
        num_shards=jax.process_count(),
        shard=jax.process_index(),
        to_batch=(lambda stacked: sort_batch(to_train_batch(specs, stacked)))
        if sort_batch is not None
        else (lambda stacked: to_train_batch(specs, stacked)),
        sharding=dict(batch_sh),
        worker_mode=args.loader_mode,
    )

    if args.slurm:
        install_slurm_requeue_handler()

    from alignsdf_tpu.training.train_state import learning_rate_for_epoch
    from alignsdf_tpu.utils.metrics import MetricsLogger

    metrics = MetricsLogger(experiment_dir, enabled=jax.process_index() == 0)
    profile_at = (10, 10 + args.profile_steps) if args.profile_steps else None
    profiling = False
    log_step = 0
    def log_losses(epoch, vals, step=None):
        step = log_step if step is None else step
        logger.info(
            "epoch %d step %d: " + " ".join(
                f"{k}={v * 1000:.3f}e-3" for k, v in sorted(vals.items())
            ), epoch, step,
        )
        metrics.log_step(epoch, step, vals)

    for epoch in range(start_epoch, specs.num_epochs + 1):
        loader.set_epoch(epoch)
        state = state.replace(epoch=jnp.asarray(epoch, jnp.int32))
        start = time.time()
        step_buf = []
        for i, batch in enumerate(loader):
            if profile_at and jax.process_index() == 0:
                # >= not ==: with --multistep, log_step advances in strides
                if log_step >= profile_at[0] and not profiling \
                        and log_step < profile_at[1]:
                    jax.profiler.start_trace(os.path.join(experiment_dir, "profile"))
                    profiling = True
                elif log_step >= profile_at[1] and profiling:
                    jax.block_until_ready(state.params)
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.info("profile trace written to %s",
                                os.path.join(experiment_dir, "profile"))
            if multi_jit is not None:
                step_buf.append(batch)
                if len(step_buf) < args.multistep:
                    continue
                batches = jax.tree.map(lambda *xs: jnp.stack(xs), *step_buf)
                keys = jnp.stack([jax.random.fold_in(rng, log_step + j)
                                  for j in range(args.multistep)])
                step_buf = []
                state, losses_k = multi_jit(state, batches, keys)
                group_start = log_step
                log_step += args.multistep
                if jax.process_index() == 0 and (
                        log_step // specs.log_frequency_step
                        != group_start // specs.log_frequency_step):
                    # losses come back stacked (k,): emit every group step
                    # that crosses the logging cadence so the per-step loss
                    # series matches single-step runs
                    losses_k = jax.device_get(losses_k)
                    for j in range(args.multistep):
                        step_j = group_start + j + 1
                        if step_j % specs.log_frequency_step == 0:
                            vals = {k: float(v[j]) for k, v in losses_k.items()}
                            log_losses(epoch, vals, step=step_j)
                continue
            state, losses = step_jit(state, batch, jax.random.fold_in(rng, log_step))
            log_step += 1
            if jax.process_index() == 0 and log_step % specs.log_frequency_step == 0:
                vals = {k: float(v) for k, v in jax.device_get(losses).items()}
                log_losses(epoch, vals)
        # epoch tail that didn't fill a multistep group runs single-step
        for batch in step_buf:
            state, losses = step_jit(state, batch, jax.random.fold_in(rng, log_step))
            log_step += 1
        metrics.log_epoch(
            epoch, float(learning_rate_for_epoch(specs, jnp.asarray(epoch))),
            time.time() - start,
        )
        logger.info("epoch %d time: %.1fs", epoch, time.time() - start)

        if epoch % specs.log_frequency == 0:
            ckpt.save_checkpoint(experiment_dir, state, epoch, "latest")
        if epoch in specs.additional_snapshots or (
            specs.snapshot_frequency and epoch % specs.snapshot_frequency == 0
        ):
            ckpt.save_checkpoint(experiment_dir, state, epoch, str(epoch))

    ckpt.save_checkpoint(experiment_dir, state, specs.num_epochs, "latest")
    metrics.close()
    logger.info("training complete: %s", experiment_dir)

    if not args.skip_test:
        run_post_training_test(
            model, state, specs, experiment_dir, mesh,
            split_filename=args.test_split,
            data_root=args.test_data_root,
            cube_dim=args.test_cube_dim,
        )


def run_post_training_test(model, state, specs, experiment_dir, mesh,
                           split_filename=None, data_root=None,
                           cube_dim: int = 128) -> None:
    """End training by reconstructing the test set, sharding files over hosts
    (reference train.py:653-668: cube_dim 128, label_out on, eval_mode for
    obman/dexycb)."""
    from alignsdf_tpu.data.dataset import ImagesDataset
    from alignsdf_tpu.inference.reconstruct import (
        Reconstructor,
        make_output_dirs,
        run_pipelined,
    )
    from alignsdf_tpu.models.alignsdf import full_variables

    task = specs.dataset
    split_filename = split_filename or f"input/{task}.json"
    if not os.path.exists(split_filename):
        logger.warning(
            "post-training test skipped: split %s not found "
            "(pass --test_split or --skip_test)", split_filename)
        return
    with open(split_filename) as f:
        filenames = json.load(f)["filenames"]

    n_proc, proc = jax.process_count(), jax.process_index()
    division = len(filenames) // n_proc
    start = proc * division
    end = start + division if proc != n_proc - 1 else len(filenames)
    filenames = filenames[start:end]
    logger.info("post-training test: %d files (host %d/%d), cube %d",
                len(filenames), proc, n_proc, cube_dim)

    dataset = ImagesDataset(filenames, specs, task, data_root=data_root)
    out_dirs = make_output_dirs(os.path.join(experiment_dir, f"Eval_{task}"))
    variables = full_variables(model, state.params, state.batch_stats)
    mano_faces = np.load(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets",
                     "closed_fmano.npy"))
    recon = Reconstructor(model, variables, specs, cube_dim=cube_dim,
                          mesh=mesh, mano_faces=mano_faces)
    eval_mode = "obman" in task or "dexycb" in task
    run_pipelined(recon, dataset, out_dirs, label_out=True,
                  eval_mode=eval_mode, task=task)


if __name__ == "__main__":
    main()
