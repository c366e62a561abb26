"""DexYCB-family end-to-end smoke: the second dataset family's plumbing
(meta-pkl intrinsics instead of the fixed ObMan camera, identity test
extrinsics, SdfScaleFactor 6.205, classifier branch on, AdditionalLossStart
crossed mid-run) through the real CLI train -> reconstruct -> evaluate chain
(reference experiments/dexycb/140k_1e2d_mlp5.json + utils/sdf_utils.py:88-116).

Complements tests/test_e2e.py (obman + ho3d legs): this leg runs the npz
backend (no LMDB) and crosses the additional-loss epoch gate during training.
"""

import json
import os
import pickle

import numpy as np

from alignsdf_tpu.data.synthetic import write_synthetic_dataset
from tests.test_e2e import _octahedron

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPEC = {
    "Description": "dexycb e2e smoke",
    "Dataset": "dexycb",
    "ModelType": "1encoder2decoder",
    "Backbone": "resnet18",
    "LMDB": False,
    "ImageSize": [64, 64],
    "SdfScaleFactor": 6.205380387894951,
    "LatentSize": 32,
    "PointFeatSize": 3,
    "EncodeStyle": "nerf",
    "PoseFeatSize": 15,
    "NumEpochs": 3,
    "LogFrequency": 1,
    "LogFrequencyStep": 1,
    "SnapshotFrequency": 0,
    "AdditionalSnapshots": [],
    "AdditionalLossStart": 2,       # crossed during the 3-epoch run
    "SamplesPerScene": 32,
    "ScenesPerBatch": 8,
    "DataLoaderThreads": 2,
    "ClampingDistance": 0.05,
    "HandBranch": True,
    "ObjectBranch": True,
    "ManoBranch": True,
    "ObjectPoseBranch": True,       # obj center/corner losses gate on the
    "ObjCenterWeight": 0.5,         # additional-loss epoch (reference
    "ObjCornerWeight": 0.2,         # train.py:545-552, dexycb spec 0.5)
    "ClassifierBranch": True,       # hand-part labels CE (dexycb family)
    "ClassifierWeight": 0.005,
    "RandomSeed": 0,
    "NetworkSpecs": {
        "dims": [64, 64, 64, 64], "dropout": [0, 1], "dropout_prob": 0.2,
        "norm_layers": [0, 1, 2, 3], "latent_in": [2], "num_class": 6,
        "xyz_in_all": False, "use_tanh": False, "latent_dropout": False,
        "weight_norm": True,
    },
    "LearningRateSchedule": [
        {"Type": "Step", "Initial": 1e-4, "Interval": 300, "Factor": 0.5},
    ],
}


def test_dexycb_train_reconstruct_evaluate(tmp_path):
    data_root = tmp_path / "data"
    keys = [f"{i:08d}" for i in range(16)]
    write_synthetic_dataset(str(data_root), keys, dataset="dexycb",
                            n_points=600, image_hw=64, split="train")
    test_keys = ["t0", "t1"]
    test_base = write_synthetic_dataset(str(data_root), test_keys,
                                        dataset="dexycb", n_points=600,
                                        image_hw=64, split="test")

    # GT hand meshes near each sample's root (dexycb test unpack: identity
    # extrinsics, root = coords_3d[0], reference utils/sdf_utils.py:108-112)
    for key in test_keys:
        with open(os.path.join(test_base, "meta", key + ".pkl"), "rb") as f:
            meta = pickle.load(f)
        root = np.asarray(meta["coords_3d"], np.float32)[0]
        _octahedron(root).export(
            os.path.join(test_base, "mesh_hand", key + ".obj"))

    spec = dict(SPEC)
    spec["DataSource"] = str(data_root)
    split_path = tmp_path / "split.json"
    with open(split_path, "w") as f:
        json.dump({"train": keys}, f)
    spec["TrainSplit"] = str(split_path)
    spec_path = tmp_path / "spec.json"
    with open(spec_path, "w") as f:
        json.dump(spec, f)

    from alignsdf_tpu.cli.train import main as train_main

    input_json = tmp_path / "input.json"
    with open(input_json, "w") as f:
        json.dump({"filenames": [k + ".jpg" for k in test_keys]}, f)
    out_root = tmp_path / "out"
    train_main(["-e", str(spec_path), "--output_root", str(out_root),
                "--skip_test"])
    exps = os.listdir(out_root)
    assert len(exps) == 1
    exp_dir = os.path.join(out_root, exps[0])
    assert os.path.isdir(os.path.join(exp_dir, "ModelParameters", "latest"))

    # the additional-loss gate was crossed: epochs 2-3 log obj-center /
    # obj-corner / classifier losses with nonzero values
    with open(os.path.join(exp_dir, "metrics.jsonl")) as f:
        steps = [json.loads(line) for line in f if '"step"' in line]
    assert steps and all(np.isfinite(s["total"]) for s in steps)
    late = [s for s in steps if s["epoch"] >= 2]
    assert late and any(s.get("obj_center", 0.0) != 0.0 for s in late)
    assert any(s.get("cls", 0.0) != 0.0 for s in late)

    from alignsdf_tpu.cli.reconstruct import main as reconstruct_main

    reconstruct_main([
        "-e", exp_dir, "-t", "dexycb", "-s", str(input_json),
        "--cube_dim", "24", "--data_root", test_base,
    ])
    eval_dir = os.path.join(exp_dir, "Eval_dexycb")
    for key in test_keys:
        assert os.path.isfile(os.path.join(eval_dir, "pred_mano", key + ".json"))
        assert os.path.isfile(os.path.join(eval_dir, "pred_mano", key + ".ply"))
        # object-pose branch exports the transformed object mesh
        assert os.path.isdir(os.path.join(eval_dir, "object"))

    from alignsdf_tpu.eval.evaluate import evaluate

    summary = evaluate(eval_dir, "dexycb", list(test_keys),
                       data_root=test_base, mano=True, workers=1)
    assert summary["chamfer_count"] == 2 and summary["failure_count"] == 0
    assert np.isfinite(summary["chamfer_mean"])
    assert np.isfinite(summary["joint_err_mean"])
    assert os.path.isfile(os.path.join(eval_dir, "chamfer_mano.txt"))
