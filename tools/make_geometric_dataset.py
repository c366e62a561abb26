"""Create an analytically-known dataset in the reference layout.

Per scene: a hand sphere at the MANO root and an object sphere at a nearby
offset, exact sphere signed distances in both dual-SDF columns, meta
joints/corners consistent with the spheres (GT joints from a real MANO
forward pass, so the MANO branch can fit them), and GT eval meshes in the
half-scaled decoder frame the reference's evaluation expects.

Used for the proof-of-learning runs (BASELINE.md round 4: train the flagship
config on 16 such scenes until reconstruction recovers the spheres below one
voxel; tests/test_overfit.py is the CPU-sized version):

    python tools/make_geometric_dataset.py out_dir --scenes 16
    python -m alignsdf_tpu.cli.train -e spec.json   # DataSource: out_dir
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out_dir")
    parser.add_argument("--scenes", type=int, default=16)
    parser.add_argument("--dataset", default="obman",
                        choices=["obman", "dexycb"])
    parser.add_argument("--split", default="train")
    parser.add_argument("--points", type=int, default=20000,
                        help="SDF samples per mesh (reference uses 20k)")
    parser.add_argument("--image_hw", type=int, default=256)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--sdf_scale_factor", type=float,
                        default=7.018621123357809,
                        help="frame scale for the GT eval meshes (obman)")
    args = parser.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    import json

    from alignsdf_tpu.data.synthetic import write_geometric_dataset

    keys = [f"{i:08d}" for i in range(args.scenes)]
    base = write_geometric_dataset(
        args.out_dir, keys, dataset=args.dataset, n_points=args.points,
        seed=args.seed, image_hw=args.image_hw, split=args.split,
        sdf_scale_factor=args.sdf_scale_factor)
    split_path = os.path.join(args.out_dir, f"{args.dataset}_geometric.json")
    with open(split_path, "w") as f:
        json.dump({args.split: keys}, f)
    print(f"wrote {args.scenes} scenes to {base}")
    print(f"split file: {split_path} (use as TrainSplit)")


if __name__ == "__main__":
    main()
