"""Evaluation CLI — reference evaluate.py:115-178 argument surface.

    python -m alignsdf_tpu.cli.evaluate -e <experiment_dir> -t obman \
        [--mano] [--obj] [--optim] [--rot] [--workers 10] [--data_root ...]
"""

from __future__ import annotations

import argparse
import json
import logging
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="AlignSDF-TPU evaluation")
    parser.add_argument("-e", dest="experiment_dir", required=True)
    parser.add_argument("-t", dest="task", default="obman",
                        choices=["obman", "dexycb", "ho3d"])
    parser.add_argument("-s", dest="split_filename", default=None,
                        help="optional key list; default: discover from the "
                             "Eval workspace like the reference")
    parser.add_argument("--mano", action="store_true",
                        help="evaluate the predicted MANO mesh + joint/vert errors")
    parser.add_argument("--obj", action="store_true",
                        help="evaluate the object mesh + center/corner errors")
    parser.add_argument("--optim", action="store_true",
                        help="trans+scale ICP before chamfer")
    parser.add_argument("--optim_mano", action="store_true",
                        help="use optim_mano/ instead of pred_mano/")
    parser.add_argument("--fit", action="store_true",
                        help="hand-SDF vs MANO mesh consistency chamfer")
    parser.add_argument("--rot", action="store_true",
                        help="full-rotation ICP before chamfer")
    parser.add_argument("--workers", type=int, default=10)
    parser.add_argument("--data_root", default=None)
    args = parser.parse_args(argv)

    logging.basicConfig(force=True, level=logging.INFO,
                        format="AlignSDF-TPU - %(levelname)s - %(message)s")

    from alignsdf_tpu.eval.evaluate import evaluate

    keys = None
    if args.split_filename:
        with open(args.split_filename) as f:
            filenames = json.load(f)["filenames"]
        keys = [f.split("/")[-1].split(".")[0] for f in filenames]

    output_dir = os.path.join(args.experiment_dir, f"Eval_{args.task}")
    summary = evaluate(
        output_dir, args.task, keys, data_root=args.data_root,
        mano=args.mano, obj=args.obj, optim=args.optim,
        optim_mano=args.optim_mano, fit=args.fit, rot=args.rot,
        workers=args.workers,
    )
    for key, value in sorted(summary.items()):
        logging.info("%s: %s", key, value)


if __name__ == "__main__":
    main()
