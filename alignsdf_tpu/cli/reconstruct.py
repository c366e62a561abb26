"""Reconstruction CLI — reference reconstruct.py:107-178 + dist_reconstruct.py.

Usage:
    python -m alignsdf_tpu.cli.reconstruct -e <experiment_dir> -t obman \
        [--start_point A --end_point B] [--label] [--viz] [--eval_mode] \
        [--cube_dim 256] [--pallas]

One process drives ALL local chips: the N^3 query grid itself is sharded over
the device mesh (vs the reference's one-subprocess-per-GPU file sharding,
dist_reconstruct.py:8-84).  Multi-host runs shard the *file list* across
hosts (reference train.py:653-667 convention) while each host shards its
grids across its chips.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

import jax
import numpy as np

from alignsdf_tpu import config as cfg
from alignsdf_tpu.data.dataset import ImagesDataset
from alignsdf_tpu.inference.reconstruct import (
    Reconstructor,
    make_output_dirs,
    run_pipelined,
)
from alignsdf_tpu.models.alignsdf import build_model, full_variables
from alignsdf_tpu.ops.decoder_kernel import make_pallas_decode_fn
from alignsdf_tpu.parallel.mesh import make_mesh, maybe_initialize_distributed
from alignsdf_tpu.training import checkpoints as ckpt
from alignsdf_tpu.training.train_state import make_optimizer
from alignsdf_tpu.training.train_step import init_train_state

logger = logging.getLogger("alignsdf_tpu.reconstruct")


def main(argv=None):
    parser = argparse.ArgumentParser(description="AlignSDF-TPU reconstruction")
    parser.add_argument("-e", dest="experiment_dir", required=True)
    parser.add_argument("-t", dest="task", default="obman",
                        choices=["obman", "dexycb", "ho3d"])
    parser.add_argument("-s", dest="split_filename", default=None)
    parser.add_argument("--checkpoint", default="latest")
    parser.add_argument("--start_point", type=int, default=None)
    parser.add_argument("--end_point", type=int, default=None)
    parser.add_argument("--cube_dim", type=int, default=128)
    parser.add_argument("--label", dest="label_out", action="store_true")
    parser.add_argument("--viz", action="store_true")
    parser.add_argument("--eval_mode", action="store_true")
    parser.add_argument("--pallas", action="store_true",
                        help="use the fused Pallas decoder kernel")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 grid fast path (~13%% faster at 256^3; "
                             "field deviation vs f32 documented in "
                             "BASELINE.md)")
    parser.add_argument("--lookahead", type=int, default=2,
                        help="images of device work kept in flight ahead of "
                             "the host-side meshing/export work")
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--ref_pixel_projection", action="store_true",
                        help="pixel-align configs: reproduce the reference "
                             "mesh path's embedded-column projection (its "
                             "train/inference inconsistency) instead of the "
                             "default train-consistent raw-xyz projection "
                             "(see inference/grid.py)")
    args = parser.parse_args(argv)

    logging.basicConfig(force=True, level=logging.INFO,
                        format="AlignSDF-TPU - %(levelname)s - %(message)s")
    maybe_initialize_distributed()
    mesh = make_mesh()

    with open(os.path.join(args.experiment_dir, "specs.json")) as f:
        specs = cfg.specs_from_dict(json.load(f))

    model = build_model(specs)
    optimizer = make_optimizer(specs)
    state = init_train_state(model, specs, jax.random.PRNGKey(0), optimizer)
    state, epoch = ckpt.restore_checkpoint(args.experiment_dir, state, args.checkpoint)
    logger.info("restored checkpoint %s (epoch %d)", args.checkpoint, epoch)
    variables = full_variables(model, state.params, state.batch_stats)

    split_filename = args.split_filename or f"input/{args.task}.json"
    with open(split_filename) as f:
        filenames = json.load(f)["filenames"]

    # host-level file sharding (multi-host); chip-level grid sharding below
    n_proc, proc = jax.process_count(), jax.process_index()
    if args.start_point is None:
        division = len(filenames) // n_proc
        start = proc * division
        end = start + division if proc != n_proc - 1 else len(filenames)
    else:
        start, end = args.start_point, args.end_point or len(filenames)
    filenames = filenames[start:end]

    dataset = ImagesDataset(filenames, specs, args.task, data_root=args.data_root)
    output_dir = os.path.join(args.experiment_dir, f"Eval_{args.task}")
    out_dirs = make_output_dirs(output_dir)

    import jax.numpy as jnp

    kdtype = jnp.bfloat16 if args.bf16 else None
    decode_fn = (make_pallas_decode_fn(specs, dtype=kdtype or jnp.float32)
                 if args.pallas else None)
    mano_faces = np.load(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets",
                     "closed_fmano.npy")
    )
    recon = Reconstructor(
        model, variables, specs, cube_dim=args.cube_dim, mesh=mesh,
        decode_fn=decode_fn, mano_faces=mano_faces, grid_dtype=kdtype,
        pixel_ref_projection=args.ref_pixel_projection,
    )

    t0 = time.time()

    def log_done(idx, pending):
        nonlocal t0
        logger.info("[%d/%d] %s: %.2fs", idx + 1, len(dataset),
                    pending["sample"]["key"], time.time() - t0)
        t0 = time.time()

    run_pipelined(recon, dataset, out_dirs, label_out=args.label_out,
                  viz=args.viz, eval_mode=args.eval_mode, task=args.task,
                  on_done=log_done, lookahead=args.lookahead)


if __name__ == "__main__":
    main()
