"""End-to-end smoke across L1-L6: synthetic dataset -> LMDB pack -> 2 train
epochs through the wired lmdb path -> checkpoint -> grid reconstruction ->
evaluation with finite metrics (reference flow train.py:653-668 ->
reconstruct.py -> evaluate.py), all through the real CLI entry points."""

import json
import os
import pickle

import numpy as np

from alignsdf_tpu.data.synthetic import write_synthetic_dataset
from alignsdf_tpu.geom.meshlib import TriMesh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPEC = {
    "Description": "e2e smoke",
    "Dataset": "obman",
    "ModelType": "1encoder2decoder",
    "Backbone": "resnet18",
    "LMDB": True,
    "ImageSize": [64, 64],
    "SdfScaleFactor": 7.018621123357809,
    "LatentSize": 32,
    "PointFeatSize": 3,
    "EncodeStyle": "nerf",
    "PoseFeatSize": 15,
    "NumEpochs": 2,
    "LogFrequency": 1,
    "LogFrequencyStep": 1,
    "SnapshotFrequency": 0,
    "AdditionalSnapshots": [],
    "AdditionalLossStart": 10,
    "SamplesPerScene": 32,
    "ScenesPerBatch": 8,
    "DataLoaderThreads": 2,
    "ClampingDistance": 0.05,
    "HandBranch": True,
    "ObjectBranch": True,
    "ManoBranch": True,
    "RandomSeed": 0,
    "NetworkSpecs": {
        "dims": [64, 64, 64, 64], "dropout": [0, 1], "dropout_prob": 0.2,
        "norm_layers": [0, 1, 2, 3], "latent_in": [2], "num_class": 6,
        "xyz_in_all": False, "use_tanh": False, "latent_dropout": False,
        "weight_norm": True,
    },
    "LearningRateSchedule": [
        {"Type": "Step", "Initial": 1e-4, "Interval": 600, "Factor": 0.5},
    ],
}


def _octahedron(center, r=0.05):
    v = np.array([[r, 0, 0], [-r, 0, 0], [0, r, 0], [0, -r, 0],
                  [0, 0, r], [0, 0, -r]], np.float32) + np.asarray(center,
                                                                   np.float32)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int64)
    return TriMesh(v, f)


def test_train_cli_multistep(tmp_path):
    """cli/train --multistep wiring: batch grouping, stacked-key dispatch,
    logging cadence and the odd epoch tail (3 batches/epoch with
    --multistep 2 leaves one single-step batch per epoch)."""
    data_root = tmp_path / "data"
    keys = [f"{i:08d}" for i in range(24)]
    write_synthetic_dataset(str(data_root), keys, n_points=200, image_hw=64,
                            split="train")
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import create_lmdb

    create_lmdb.create_lmdbs(os.path.join(str(data_root), "obman", "train"),
                             "obman", "train", keys)
    spec = dict(SPEC)
    spec.update(DataSource=str(data_root), SamplesPerScene=16,
                ScenesPerBatch=8, NumEpochs=2)  # 3 batches/epoch: odd tail
    split_path = tmp_path / "split.json"
    with open(split_path, "w") as f:
        json.dump({"train": keys}, f)
    spec_path = tmp_path / "spec.json"
    with open(spec_path, "w") as f:
        json.dump(spec, f)

    from alignsdf_tpu.cli.train import main as train_main

    out_root = tmp_path / "out"
    train_main(["-e", str(spec_path), "--output_root", str(out_root),
                "--multistep", "2", "--skip_test"])
    exp_dir = os.path.join(out_root, os.listdir(out_root)[0])
    assert os.path.isdir(os.path.join(exp_dir, "ModelParameters", "latest"))
    with open(os.path.join(exp_dir, "metrics.jsonl")) as f:
        steps = [json.loads(line) for line in f if '"step"' in line]
    assert steps and all(np.isfinite(s["total"]) for s in steps)


def test_train_cli_pixel_band(tmp_path):
    """cli/train --pixel_band wiring: the loader's per-scene row ordering
    (data/pixel_sort) runs inside the workers, the batch carries
    point_is_hand, the jitted step consumes it for the loss masks, and the
    presorted banded decoder is constructed (band engages only for feature
    maps of 16+ rows with bps>1 — at these smoke shapes the decode
    legitimately resolves to the full kernel, so this covers the wiring,
    not the banding; kernel-level banding is covered in
    test_decoder_train_pixel and the multichip dryrun)."""
    data_root = tmp_path / "data"
    keys = [f"{i:08d}" for i in range(16)]
    write_synthetic_dataset(str(data_root), keys, n_points=200, image_hw=64,
                            split="train")
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import create_lmdb

    create_lmdb.create_lmdbs(os.path.join(str(data_root), "obman", "train"),
                             "obman", "train", keys)
    spec = dict(SPEC)
    # latent 256 = the HeadNet channel count (pixel-align configs pin it);
    # hidden dims must exceed latent+embed for the latent_in re-injection
    spec.update(DataSource=str(data_root), SamplesPerScene=16,
                ScenesPerBatch=8, NumEpochs=1, PixelAlign=True,
                EncodeStyle="both", PointFeatSize=9, LatentSize=256,
                ObjectPoseBranch=True,
                NetworkSpecs=dict(SPEC["NetworkSpecs"],
                                  dims=[288, 288, 288, 288]))
    split_path = tmp_path / "split.json"
    with open(split_path, "w") as f:
        json.dump({"train": keys}, f)
    spec["TrainSplit"] = str(split_path)
    spec_path = tmp_path / "spec.json"
    with open(spec_path, "w") as f:
        json.dump(spec, f)

    from alignsdf_tpu.cli.train import main as train_main

    out_root = tmp_path / "out"
    train_main(["-e", str(spec_path), "--output_root", str(out_root),
                "--pixel_band", "--fused_decoder", "--skip_test",
                "--no_init_guard"])
    exp_dir = os.path.join(out_root, os.listdir(out_root)[0])
    with open(os.path.join(exp_dir, "metrics.jsonl")) as f:
        steps = [json.loads(line) for line in f if '"step"' in line]
    assert steps and all(np.isfinite(s["total"]) for s in steps)


def test_train_reconstruct_evaluate(tmp_path):
    data_root = tmp_path / "data"
    keys = [f"{i:08d}" for i in range(16)]
    train_base = write_synthetic_dataset(str(data_root), keys, n_points=600,
                                         image_hw=64, split="train")
    test_keys = ["t0", "t1"]
    test_base = write_synthetic_dataset(str(data_root), test_keys,
                                        n_points=600, image_hw=64,
                                        split="test")

    # GT hand meshes near each sample's root so mano-mode chamfer is finite
    for key in test_keys:
        with open(os.path.join(test_base, "meta", key + ".pkl"), "rb") as f:
            meta = pickle.load(f)
        root = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32) @ \
            np.asarray(meta["coords_3d"], np.float32)[0]
        _octahedron(root).export(
            os.path.join(test_base, "mesh_hand", key + ".obj"))

    # L1: pack the reference five-LMDB layout
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import create_lmdb

    create_lmdb.create_lmdbs(train_base, "obman", "train", keys)

    spec = dict(SPEC)
    spec["DataSource"] = str(data_root)
    split_path = tmp_path / "split.json"
    with open(split_path, "w") as f:
        json.dump({"train": keys}, f)
    spec["TrainSplit"] = str(split_path)
    spec_path = tmp_path / "spec.json"
    with open(spec_path, "w") as f:
        json.dump(spec, f)

    # L4: train through the CLI (lmdb backend selected by the spec), ending
    # with the post-training test reconstruction (reference train.py:653-668)
    from alignsdf_tpu.cli.train import main as train_main

    input_json = tmp_path / "input.json"
    with open(input_json, "w") as f:
        json.dump({"filenames": [k + ".jpg" for k in test_keys]}, f)
    out_root = tmp_path / "out"
    train_main(["-e", str(spec_path), "--output_root", str(out_root),
                "--test_split", str(input_json), "--test_data_root", test_base,
                "--test_cube_dim", "16"])
    exps = os.listdir(out_root)
    assert len(exps) == 1
    exp_dir = os.path.join(out_root, exps[0])
    assert os.path.isdir(os.path.join(exp_dir, "ModelParameters", "latest"))
    assert os.path.isdir(os.path.join(exp_dir, "OptimizerParameters", "latest"))
    # post-training reconstruction artifacts (cleared before the standalone
    # reconstruct CLI re-creates them below)
    import shutil

    for key in test_keys:
        assert os.path.isfile(os.path.join(
            exp_dir, "Eval_obman", "pred_mano", key + ".json"))
    shutil.rmtree(os.path.join(exp_dir, "Eval_obman"))

    # L5: reconstruct through the CLI (sharded grid + exports)
    from alignsdf_tpu.cli.reconstruct import main as reconstruct_main

    reconstruct_main([
        "-e", exp_dir, "-t", "obman", "-s", str(input_json),
        "--cube_dim", "24", "--data_root", test_base,
    ])
    eval_dir = os.path.join(exp_dir, "Eval_obman")
    for key in test_keys:
        assert os.path.isfile(os.path.join(eval_dir, "pred_mano", key + ".json"))
        assert os.path.isfile(os.path.join(eval_dir, "pred_mano", key + ".ply"))

    # L6: evaluate (mano mode: MANO mesh chamfer + root-relative joint error)
    from alignsdf_tpu.eval.evaluate import evaluate

    summary = evaluate(eval_dir, "obman", list(test_keys),
                       data_root=test_base, mano=True, workers=1)
    assert summary["chamfer_count"] == 2 and summary["failure_count"] == 0
    assert np.isfinite(summary["chamfer_mean"])
    assert np.isfinite(summary["joint_err_mean"])
    assert os.path.isfile(os.path.join(eval_dir, "chamfer_mano.txt"))

    # HO3D task smoke (reference evaluate.py:20, utils/sdf_utils.py:104-106):
    # same trained weights, ho3d-style meta (camMat / handJoints3D root)
    ho3d_base = write_synthetic_dataset(str(data_root), ["h0"], dataset="ho3d",
                                        n_points=600, image_hw=64, split="test")
    with open(os.path.join(ho3d_base, "meta", "h0.pkl"), "rb") as f:
        meta = pickle.load(f)
    root = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32) @ \
        np.asarray(meta["handJoints3D"], np.float32)
    _octahedron(root).export(os.path.join(ho3d_base, "mesh_hand", "h0.obj"))
    ho3d_input = tmp_path / "ho3d_input.json"
    with open(ho3d_input, "w") as f:
        json.dump({"filenames": ["h0.jpg"]}, f)
    reconstruct_main([
        "-e", exp_dir, "-t", "ho3d", "-s", str(ho3d_input),
        "--cube_dim", "24", "--data_root", ho3d_base,
    ])
    ho3d_eval_dir = os.path.join(exp_dir, "Eval_ho3d")
    assert os.path.isfile(os.path.join(ho3d_eval_dir, "pred_mano", "h0.ply"))
    summary = evaluate(ho3d_eval_dir, "ho3d", ["h0"], data_root=ho3d_base,
                       mano=True, workers=1)
    assert summary["chamfer_count"] == 1 and summary["failure_count"] == 0
    assert np.isfinite(summary["chamfer_mean"])
