"""Host input-pipeline benchmark: fully-augmented scenes/s per backend.

The device-side train step consumes ~1,480 scenes/s/chip (BASELINE.md, bf16,
batch 64); the host pipeline must at least match that rate or real training is
host-bound.  This tool measures the end-to-end loader rate (storage decode +
augmentation + normalization + collate + to_train_batch) for the npz, LMDB
and native ASDF-pack backends across worker counts, on a synthetic dataset
with the production shapes (256x256 rgb, 20k-row SDF blocks, 2000 pts/scene).

Usage:  python tools/bench_loader.py [--scenes 96] [--batches 24]
Prints one JSON line per (backend, workers) combination.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alignsdf_tpu.config import Specs                      # noqa: E402
from alignsdf_tpu.data import make_train_dataset           # noqa: E402
from alignsdf_tpu.data.dataset import to_train_batch       # noqa: E402
from alignsdf_tpu.data.loader import DataLoader            # noqa: E402
from alignsdf_tpu.data.synthetic import write_synthetic_dataset  # noqa: E402


def measure(dataset, specs: Specs, workers: int, n_batches: int,
            batch_size: int, mode: str = "thread") -> float:
    loader = DataLoader(
        dataset, batch_size=batch_size, num_workers=workers, shuffle=True,
        drop_last=False, to_batch=lambda s: to_train_batch(specs, s),
        worker_mode=mode,
    )
    # warmup epoch 0 (thread spin-up, page cache)
    loader.set_epoch(0)
    for i, _ in enumerate(loader):
        if i >= 2:
            break
    done = 0
    start = time.perf_counter()
    epoch = 1
    while done < n_batches:
        loader.set_epoch(epoch)
        for batch in loader:
            done += 1
            if done >= n_batches:
                break
        epoch += 1
    dt = time.perf_counter() - start
    return done * batch_size / dt


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--scenes", type=int, default=96)
    parser.add_argument("--batches", type=int, default=24)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--points", type=int, default=20000,
                        help="SDF rows per scene on disk (production: 20000)")
    parser.add_argument("--workers", type=int, nargs="*",
                        default=[1, 4, 8, 16])
    parser.add_argument("--target", type=float, default=1480.0,
                        help="device-side scenes/s to beat (BASELINE.md)")
    args = parser.parse_args()

    tmp = tempfile.mkdtemp(prefix="bench_loader_")
    keys = [f"{i:08d}" for i in range(args.scenes)]
    base = write_synthetic_dataset(tmp, keys, n_points=args.points,
                                   image_hw=256)

    import create_lmdb

    create_lmdb.create_lmdbs(base, "obman", "train", keys)
    pack_path = os.path.join(tmp, "train.pack")
    import pack_dataset

    pack_dataset.pack(base, pack_path, keys, "obman")

    specs = Specs(dataset="obman", sdf_scale_factor=7.0186,
                  samples_per_scene=2000, image_size=(256, 256),
                  clamping_distance=0.05)

    datasets = {
        "npz": make_train_dataset(Specs(**{**specs.__dict__, "lmdb": False}),
                                  keys, data_root=base, raw_image=True),
        "lmdb": make_train_dataset(specs, keys, data_root=base,
                                   raw_image=True),
    }
    try:
        datasets["packed"] = make_train_dataset(specs, keys,
                                                pack_path=pack_path,
                                                raw_image=True)
    except RuntimeError as e:
        print(f"# packed backend unavailable: {e}", file=sys.stderr)

    for name, ds in datasets.items():
        native = hasattr(ds.backend, "build_batch")
        modes = [("native", 1), ("native", 2)] if native else []
        modes += [("thread", w) for w in args.workers]
        modes += [("process", w) for w in args.workers if w > 1]
        for mode, workers in modes:
            if mode == "native":
                # the loader uses the whole-batch C++ pipeline automatically
                # (feeder threads only hand off; C++ threads do the work)
                rate = measure(ds, specs, workers, args.batches,
                               args.batch_size, "thread")
            else:
                if native:  # mask the fast path to measure the python path
                    ds.build_batch = None  # type: ignore[assignment]
                try:
                    rate = measure(ds, specs, workers, args.batches,
                                   args.batch_size, mode)
                finally:
                    if native:
                        del ds.build_batch  # restore the class method
            print(json.dumps({
                "metric": "loader_scenes_per_s", "backend": name,
                "mode": mode, "workers": workers, "value": round(rate, 1),
                "unit": "scenes/s/host", "vs_device_rate": round(
                    rate / args.target, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
