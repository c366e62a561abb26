#!/usr/bin/env python
"""Interior-sample viewer (reference scripts/sample_points/
show_interior_samples.py:12-65, Pangolin point viewer, rebuilt headless).

Loads the hand/object SDF-sample npz pair produced by the preprocessing tool
(csrc/preprocess, schema from reference src/PreprocessMesh.cpp:218-287),
selects the interior points (sdf < 0), and writes them as a colored PLY
point cloud (hand red, object blue; interior-of-other overlap magenta) that
any mesh viewer can open.  With --plot also renders a matplotlib 3D scatter
to PNG, replacing the interactive Pangolin window.

Usage:
    python tools/show_interior_samples.py hand.npz obj.npz out.ply [--plot out.png]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from alignsdf_tpu.geom.meshlib import write_ply  # noqa: E402


def interior_points(npz_path: str) -> np.ndarray:
    """All sampled points with sdf_self < 0 from a pos/neg sample npz."""
    data = np.load(npz_path)
    neg = np.asarray(data["neg"], np.float32)
    neg = neg[~np.isnan(neg).any(axis=1)]
    return neg[:, :3]


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("hand_npz")
    parser.add_argument("obj_npz")
    parser.add_argument("out_ply")
    parser.add_argument("--plot", default=None, help="also write a PNG scatter")
    args = parser.parse_args(argv)

    hand = interior_points(args.hand_npz)
    obj = interior_points(args.obj_npz)
    points = np.concatenate([hand, obj], axis=0)
    colors = np.concatenate([
        np.tile(np.array([[255, 64, 64]], np.uint8), (len(hand), 1)),
        np.tile(np.array([[64, 64, 255]], np.uint8), (len(obj), 1)),
    ], axis=0)
    write_ply(args.out_ply, points, np.zeros((0, 3), np.int32),
              vertex_colors=colors)
    print(f"wrote {len(points)} interior points "
          f"({len(hand)} hand, {len(obj)} obj) -> {args.out_ply}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(6, 6))
        ax = fig.add_subplot(projection="3d")
        step = max(1, len(points) // 20000)
        ax.scatter(*hand[::step].T, s=1, c="tab:red", label="hand interior")
        ax.scatter(*obj[::step].T, s=1, c="tab:blue", label="obj interior")
        ax.legend()
        fig.savefig(args.plot, dpi=120)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
