"""Run the native SDF sampler over a whole dataset split — the equivalent of
the reference's prep_obman.py / prep_dexycb.py drivers (reference
scripts/sample_points/prep_obman.py:17-41).

Expects <root>/<split>/mesh_hand/<key>.obj and mesh_obj/<key>.obj; writes
sdf_hand/, sdf_obj/ and norm/ npz files in the reference schema.

    python tools/preprocess_dataset.py data/obman/train [--workers 8] \
        [--binary csrc/build/preprocess_mesh] [--samples 20000]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from concurrent.futures import ProcessPoolExecutor, as_completed

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_BINARY = os.path.join(REPO, "csrc", "build", "preprocess_mesh")
DEFAULT_FACE2LABEL = os.path.join(
    REPO, "alignsdf_tpu", "assets", "face2label_sealed.npy")


def process_one(args):
    key, root, binary, samples, face2label = args
    cmd = [
        binary,
        "--hand", os.path.join(root, "mesh_hand", key + ".obj"),
        "--obj", os.path.join(root, "mesh_obj", key + ".obj"),
        "--outhand", os.path.join(root, "sdf_hand", key + ".npz"),
        "--outobj", os.path.join(root, "sdf_obj", key + ".npz"),
        "--normalize", os.path.join(root, "norm", key + ".npz"),
        "-s", str(samples),
    ]
    if face2label:
        cmd += ["--face2label", face2label]
    result = subprocess.run(cmd, capture_output=True, text=True)
    ok = result.returncode == 0 and os.path.isfile(
        os.path.join(root, "sdf_hand", key + ".npz"))
    return key, ok, result.stdout[-200:] if not ok else ""


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("root", help=".../<dataset>/<split> directory")
    parser.add_argument("--workers", type=int, default=os.cpu_count() or 8)
    parser.add_argument("--binary", default=DEFAULT_BINARY)
    parser.add_argument("--samples", type=int, default=20000)
    parser.add_argument("--face2label", default=DEFAULT_FACE2LABEL)
    parser.add_argument("--keys", nargs="*", default=None)
    args = parser.parse_args()

    for sub in ("sdf_hand", "sdf_obj", "norm"):
        os.makedirs(os.path.join(args.root, sub), exist_ok=True)

    keys = args.keys or sorted(
        os.path.splitext(f)[0]
        for f in os.listdir(os.path.join(args.root, "mesh_hand"))
        if f.endswith(".obj")
    )
    face2label = args.face2label if os.path.isfile(args.face2label) else ""

    jobs = [(k, args.root, args.binary, args.samples, face2label) for k in keys]
    failures = []
    with ProcessPoolExecutor(max_workers=args.workers) as pool:
        futures = [pool.submit(process_one, j) for j in jobs]
        for i, fut in enumerate(as_completed(futures)):
            key, ok, err = fut.result()
            if not ok:
                failures.append(key)
                print(f"FAIL {key}: {err}", file=sys.stderr)
            if (i + 1) % 100 == 0:
                print(f"{i + 1}/{len(jobs)} done ({len(failures)} failed)")
    print(f"done: {len(jobs) - len(failures)}/{len(jobs)} succeeded")


if __name__ == "__main__":
    main()
