"""Pose a random MANO hand and export it as a PLY mesh — the headless
equivalent of the reference's matplotlib demo (reference manopth/demo.py:18-141).

    python tools/show_hand.py out.ply [--seed 0] [--pose-std 0.5] [--left]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out", help="output .ply/.obj path")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--pose-std", type=float, default=0.5)
    parser.add_argument("--ncomps", type=int, default=15)
    parser.add_argument("--left", action="store_true")
    args = parser.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from alignsdf_tpu.geom.meshlib import TriMesh
    from alignsdf_tpu.mano.layer import load_mano_model, mano_forward

    rng = np.random.RandomState(args.seed)
    model = load_mano_model(side="left" if args.left else "right",
                            ncomps=args.ncomps)
    pose = jnp.asarray(
        (rng.randn(1, 3 + args.ncomps) * args.pose_std).astype(np.float32))
    betas = jnp.asarray((rng.randn(1, 10) * 0.3).astype(np.float32))
    out = mano_forward(model, pose, betas, center_idx=0)

    TriMesh(np.asarray(out.verts[0]), model.faces).export(args.out)
    joints = np.asarray(out.joints[0])
    print(f"wrote {args.out}: 778 verts, {model.faces.shape[0]} faces, "
          f"joint span {joints.max() - joints.min():.3f} m")


if __name__ == "__main__":
    main()
