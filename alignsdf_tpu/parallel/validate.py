"""Multi-process (multi-host) validation drill.

Runs the FULL training step + sharded grid eval + checkpoint save/restore in a
real ``jax.distributed`` process group (Gloo collectives on CPU, ICI/DCN on
TPU) and dumps per-process results so a harness can assert bitwise agreement
with a single-process run — the coverage the reference only gets by launching
under SLURM (reference train.py:205-228).

Worker usage (one interpreter per process; the launcher sets
XLA_FLAGS=--xla_force_host_platform_device_count=<D> for CPU drills):

    python -m alignsdf_tpu.parallel.validate \
        --coordinator localhost:12355 --num_processes 2 --process_id P \
        --out /tmp/mp_P.json [--workdir /tmp/ckpt]

Exercised paths: jax.distributed.initialize, a global mesh spanning
processes, per-process data sharding assembled into global arrays
(jax.make_array_from_process_local_data, the loader's multi-host path),
GSPMD gradient psum + global-batch BatchNorm across process boundaries,
replicated grid-eval output gathering, and process-0-gated checkpointing.
"""

from __future__ import annotations

import argparse
import json
import os


def run(coordinator: str, num_processes: int, process_id: int, out_path: str,
        workdir: str, steps: int = 3, grid_n: int = 16,
        production_grid: int = 0) -> dict:
    import jax

    if num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes=num_processes,
                                   process_id=process_id)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from alignsdf_tpu.config import NetworkSpecs, Specs
    from alignsdf_tpu.data.synthetic import synthetic_train_batch
    from alignsdf_tpu.inference.grid import make_grid_evaluator
    from alignsdf_tpu.models.alignsdf import build_model
    from alignsdf_tpu.parallel.mesh import make_mesh
    from alignsdf_tpu.training import checkpoints as ckpt
    from alignsdf_tpu.training.train_state import make_optimizer
    from alignsdf_tpu.training.train_step import init_train_state, make_train_step
    from alignsdf_tpu.cli.train import batch_shardings

    specs = Specs(
        model_type="1encoder2decoder", encode_style="both", point_feat_size=9,
        latent_size=32, sdf_scale_factor=7.0186, samples_per_scene=128,
        image_size=(64, 64), mano_branch=True, object_pose_branch=True,
        penetration_loss=True, contact_loss=True, additional_loss_start=1,
        network_specs=NetworkSpecs(dims=(64, 64, 64, 64), dropout=(0, 1),
                                   norm_layers=(0, 1, 2, 3), latent_in=(2,)),
        dataset="obman", random_seed=0,
    )
    model = build_model(specs)
    optimizer = make_optimizer(specs)
    state = init_train_state(model, specs, jax.random.PRNGKey(0), optimizer)

    # the production decoder path: the scene-factored fused kernel (interpret
    # mode on CPU), inside the multi-process sharded jit — 128 points/scene
    # is the smallest blockable count
    from alignsdf_tpu.ops.decoder_train_kernel import (
        make_fused_train_decoder_factored,
    )

    decoder_override = make_fused_train_decoder_factored(specs)
    assert decoder_override is not None and decoder_override.factored

    mesh = make_mesh()
    n_dev = len(jax.devices())
    replicate = NamedSharding(mesh, P())
    shardings = batch_shardings(mesh)
    step_jit = jax.jit(make_train_step(model, specs, optimizer,
                                       decoder_override),
                       in_shardings=(replicate, shardings | {}, replicate),
                       out_shardings=(replicate, replicate),
                       donate_argnums=(0,))
    state = jax.device_put(state, replicate)

    # deterministic global batch, identical on every process; each process
    # contributes only its local rows (the loader's multi-host contract)
    global_batch = n_dev
    full = synthetic_train_batch(specs, batch_size=global_batch, seed=1)
    local_scenes = global_batch // num_processes
    n_pts = specs.samples_per_scene

    def to_global(key, arr):
        if arr.shape[0] == global_batch * n_pts:  # point-axis fields
            rows = local_scenes * n_pts
        else:
            rows = local_scenes
        local = arr[process_id * rows:(process_id + 1) * rows]
        if num_processes == 1:
            return jax.device_put(arr, shardings[key])
        return jax.make_array_from_process_local_data(
            shardings[key], local, global_shape=arr.shape)

    batch = {k: to_global(k, v) for k, v in full.items()}

    rng = jax.random.PRNGKey(7)
    losses_log = []
    for i in range(steps):
        state, losses = step_jit(state, batch, jax.random.fold_in(rng, i))
        losses_log.append({k: float(np.asarray(jax.device_get(v)))
                           for k, v in losses.items()})

    # --- sharded grid eval over the same global mesh
    def decode_fn(ctx, inputs):
        return model.apply({"params": ctx["params"]}, inputs,
                           method=model.decode_points)

    evaluate = make_grid_evaluator(decode_fn, specs, grid_n,
                                   chunk=grid_n ** 3 // n_dev, mesh=mesh,
                                   two_pass=True)
    params_host = jax.device_get(state.params)
    # consts come from the live state: the originals on model.mano_model were
    # consumed by the train step's buffer donation
    variables = {"params": params_host,
                 "batch_stats": jax.device_get(state.batch_stats)}
    if state.consts:
        variables["consts"] = jax.device_get(state.consts)
    img = np.zeros((1, 64, 64, 3), np.float32)
    cam = np.concatenate([np.array([[480.0, 0, 128], [0, 480.0, 128],
                                    [0, 0, 1]], np.float32),
                          np.zeros((3, 1), np.float32)], axis=1)[None]
    latent, mano_results, obj_results = model.apply(
        variables, jnp.asarray(img), jnp.asarray(cam),
        jnp.asarray([[0.0, 0.0, 0.6]]), jnp.zeros((1, 8, 3)),
        method=model.encode_scene)
    ctx = {
        "params": params_host, "decoder_params": params_host["decoder"],
        "latent": latent, "rot_center": mano_results["rot_center"],
        "global_trans": mano_results["global_trans"],
        "obj_trans": obj_results["obj_trans"],
    }
    grid = evaluate(ctx)
    grid_sum = float(np.asarray(grid.sdf_hand).sum() +
                     np.asarray(grid.sdf_obj).sum())

    # --- collective checkpoint save (fs swap on process 0); everyone
    # restores and must agree
    exp_dir = os.path.join(workdir, "mp_exp")
    ckpt.save_checkpoint(exp_dir, state, epoch=steps)
    restored, epoch = ckpt.restore_checkpoint(
        exp_dir, jax.device_get(state), "latest")
    max_dev = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                        jax.tree.leaves(restored.params)))

    result = {
        "process_id": process_id,
        "num_processes": num_processes,
        "n_devices": n_dev,
        "losses": losses_log,
        "grid_sum": grid_sum,
        "restored_epoch": int(epoch),
        "ckpt_roundtrip_max_dev": max_dev,
    }

    # --- production-PROPORTIONED sharded grid across the process group:
    # the bench workload's twin 512-wide/latent-256 decoders (BASELINE.md
    # 256^3 north star) on a CPU-sized cube, point-sharded over the global
    # mesh with the refine-cube reduction + field all-gather crossing the
    # process boundary (collective volumes audited by
    # tools/audit_collectives.py)
    if production_grid:
        import time

        from alignsdf_tpu.models.decoder import SeparateDecoder

        specs_p = Specs(model_type="1encoder2decoder", encode_style="nerf",
                        point_feat_size=3, latent_size=256,
                        sdf_scale_factor=7.018621123357809,
                        network_specs=NetworkSpecs())
        dec = SeparateDecoder(specs_p.latent_size, specs_p.point_feat_size,
                              specs_p.encode_style, specs_p.network_specs,
                              use_classifier=False)
        vars_p = dec.init(jax.random.PRNGKey(0),
                          jnp.zeros((8, specs_p.latent_size + 3)))

        def decode_p(ctx, inputs):
            h, o, _ = dec.apply({"params": ctx["params"]}, inputs)
            return h, o, None

        ev_p = make_grid_evaluator(
            decode_p, specs_p, production_grid,
            chunk=production_grid ** 3 // n_dev, mesh=mesh, two_pass=True)
        ctx_p = {"params": vars_p["params"],
                 "decoder_params": vars_p["params"],
                 "latent": jax.random.normal(jax.random.PRNGKey(3),
                                             (1, specs_p.latent_size))}
        t0 = time.time()
        rp = ev_p(ctx_p)
        s = float(np.asarray(rp.sdf_hand).sum()
                  + np.asarray(rp.sdf_obj).sum())
        result["prod_grid_n"] = production_grid
        result["prod_grid_sum"] = s
        result["prod_grid_s"] = round(time.time() - t0, 2)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    return result


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--coordinator", default="localhost:12355")
    parser.add_argument("--num_processes", type=int, default=2)
    parser.add_argument("--process_id", type=int, required=True)
    parser.add_argument("--out", default="")
    parser.add_argument("--workdir", default="/tmp/alignsdf_mp")
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--production_grid", type=int, default=0,
                        help="also run a production-proportioned sharded "
                             "grid (twin 512-wide/latent-256 decoders) at "
                             "this cube dim across the process group")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (virtual-device drill)")
    args = parser.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.workdir, exist_ok=True)
    result = run(args.coordinator, args.num_processes, args.process_id,
                 args.out, args.workdir, steps=args.steps,
                 production_grid=args.production_grid)
    print(json.dumps({k: v for k, v in result.items() if k != "losses"}))


if __name__ == "__main__":
    main()
