"""Native component tests (preprocess tool, marching cubes, packed reader).

Skipped when csrc/build artifacts are missing — build with:
    cmake -S csrc -B csrc/build && cmake --build csrc/build -j
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = os.path.join(REPO, "csrc", "build")


def _icosphere(r, center, subdiv=3):
    t = (1 + 5 ** 0.5) / 2
    verts = [np.array(v, float) for v in
             [(-1, t, 0), (1, t, 0), (-1, -t, 0), (1, -t, 0), (0, -1, t),
              (0, 1, t), (0, -1, -t), (0, 1, -t), (t, 0, -1), (t, 0, 1),
              (-t, 0, -1), (-t, 0, 1)]]
    faces = [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
             (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
             (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
             (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)]
    verts = [v / np.linalg.norm(v) for v in verts]
    cache = {}

    def mid(a, b):
        key = tuple(sorted((a, b)))
        if key not in cache:
            m = verts[a] + verts[b]
            verts.append(m / np.linalg.norm(m))
            cache[key] = len(verts) - 1
        return cache[key]

    for _ in range(subdiv):
        nf = []
        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        faces = nf
    return np.array(verts) * r + np.array(center), np.array(faces)


def _write_obj(path, verts, faces):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for a, b, c in faces + 1:
            f.write(f"f {a} {b} {c}\n")


@pytest.mark.skipif(not os.path.isfile(os.path.join(BUILD, "preprocess_mesh")),
                    reason="native preprocess_mesh not built")
def test_preprocess_tool_sphere_accuracy(tmp_path):
    for name, r, c in [("hand", 0.1, (0, 0, 0)), ("obj", 0.06, (0.15, 0, 0))]:
        V, F = _icosphere(r, c)
        _write_obj(tmp_path / f"{name}.obj", V, F)

    subprocess.run(
        [os.path.join(BUILD, "preprocess_mesh"),
         "--hand", str(tmp_path / "hand.obj"), "--obj", str(tmp_path / "obj.obj"),
         "--outhand", str(tmp_path / "h.npz"), "--outobj", str(tmp_path / "o.npz"),
         "--normalize", str(tmp_path / "n.npz"), "--seed", "7"],
        check=True, capture_output=True,
    )

    norm = np.load(tmp_path / "n.npz")
    scale = float(norm["scale"][0])
    offset = norm["offset"]
    h = np.load(tmp_path / "h.npz")
    assert sorted(h.keys()) == sorted([
        "pos", "neg", "lab_pos", "lab_neg", "pos_other", "neg_other",
        "lab_pos_other", "lab_neg_other"])

    allp = np.concatenate([h["pos"], h["neg"]])
    p_orig = allp[:, :3] / scale - offset
    d_true = np.linalg.norm(p_orig, axis=1) - 0.1
    d_file = allp[:, 3] / scale
    err = np.abs(d_file - d_true)
    assert err.mean() < 2e-3, err.mean()
    # signs agree except right at the surface
    wrong = np.sign(d_file) != np.sign(d_true)
    assert np.abs(d_true[wrong]).max() < 5e-3 if wrong.any() else True

    other = np.concatenate([h["pos_other"], h["neg_other"]])[:, 0] / scale
    d_true_o = np.linalg.norm(p_orig - np.array([0.15, 0, 0]), axis=1) - 0.06
    assert np.abs(other - d_true_o).mean() < 2e-3


@pytest.mark.skipif(not os.path.isfile(os.path.join(BUILD, "libmarching_cubes.so")),
                    reason="native marching cubes not built")
def test_native_marching_cubes_matches_numpy():
    import alignsdf_tpu.geom.marching_cubes as M

    n = 48
    g = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    vol = (np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - 0.6).astype(np.float32)

    v_n, f_n = M.marching_cubes_native(vol, 0.0, (2 / (n - 1),) * 3)
    saved = M._native_mc
    try:
        M._native_mc = False
        v_p, f_p = M.marching_cubes(vol, 0.0, (2 / (n - 1),) * 3)
    finally:
        M._native_mc = saved

    assert v_n.shape == v_p.shape and f_n.shape == f_p.shape
    sv_n = np.asarray(sorted(map(tuple, np.round(v_n, 5))))
    sv_p = np.asarray(sorted(map(tuple, np.round(v_p, 5))))
    np.testing.assert_allclose(sv_n, sv_p, atol=1e-4)

    with pytest.raises(ValueError):
        M.marching_cubes_native(np.ones((8, 8, 8), np.float32), 0.0, (1, 1, 1))


@pytest.mark.skipif(not os.path.isfile(os.path.join(BUILD, "libpacked_reader.so")),
                    reason="native packed reader not built")
def test_packed_dataset_matches_npz_backend(tmp_path):
    from alignsdf_tpu.config import Specs
    from alignsdf_tpu.data.dataset import SDFDataset
    from alignsdf_tpu.data.packed import PackedSDFDataset
    from alignsdf_tpu.data.synthetic import write_synthetic_dataset

    keys = [f"{i:08d}" for i in range(3)]
    base = write_synthetic_dataset(str(tmp_path), keys, n_points=800, image_hw=64)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "pack_dataset.py"),
         base, str(tmp_path / "train.pack"), "--keys", *keys],
        check=True, capture_output=True, cwd=REPO,
    )

    specs = Specs(dataset="obman", sdf_scale_factor=7.0186, samples_per_scene=64,
                  image_size=(64, 64), disable_aug=True)
    ds_npz = SDFDataset(specs, keys, data_root=base, deterministic=True)
    ds_pack = PackedSDFDataset(specs, str(tmp_path / "train.pack"), keys,
                               deterministic=True)
    a = ds_npz.__getitem__(1, seed=5)
    b = ds_pack.__getitem__(1, seed=5)
    for field in ("image", "hand_joints_3d", "obj_center", "obj_corners",
                  "cam_intr", "mano_root", "rest_obj_corners"):
        np.testing.assert_allclose(a[field], b[field], atol=1e-5, err_msg=field)
    assert a["pc_hand"].shape == b["pc_hand"].shape
    assert set(np.unique(b["cls_obj"]).astype(int).tolist()) == {-1}


@pytest.mark.skipif(not os.path.isfile(os.path.join(BUILD, "libpacked_reader.so")),
                    reason="native packed reader not built")
def test_native_batch_builder_parity(tmp_path):
    """packed_build_batch (whole-batch C++ pipeline) vs the python chain:
    deterministic fields must match SDFDataset exactly; the sampled SDF rows
    must match re-running the native sampler with the builder's tagged branch
    seeds through the normalization chain (reference utils/data.py:176-199)."""
    from alignsdf_tpu.config import Specs
    from alignsdf_tpu.data.packed import PackedSDFDataset
    from alignsdf_tpu.data.synthetic import write_synthetic_dataset

    keys = [f"{i:08d}" for i in range(4)]
    base = write_synthetic_dataset(str(tmp_path), keys, n_points=800, image_hw=96)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "pack_dataset.py"),
         base, str(tmp_path / "train.pack"), "--keys", *keys],
        check=True, capture_output=True, cwd=REPO,
    )
    specs = Specs(dataset="obman", sdf_scale_factor=7.0186, samples_per_scene=64,
                  image_size=(96, 96), clamping_distance=0.05, disable_aug=True)
    ds = PackedSDFDataset(specs, str(tmp_path / "train.pack"), keys,
                          deterministic=True, raw_image=True)

    seeds = [11, 22, 33, 44]
    batch = ds.build_batch([0, 1, 2, 3], seeds)
    assert batch["image"].dtype == np.uint8

    per = 32
    for b in range(4):
        item = ds.__getitem__(b, seed=0)  # deterministic (aug disabled)
        # deterministic fields: exact
        raw = ds.backend.image(ds.keys[b])
        np.testing.assert_array_equal(batch["image"][b], raw)  # rot=0 -> copy
        np.testing.assert_allclose(batch["hand_joints_3d"][b],
                                   item["hand_joints_3d"], atol=1e-6)
        np.testing.assert_allclose(batch["cam_intr"][b], item["cam_intr"],
                                   atol=1e-5)
        np.testing.assert_allclose(batch["mano_root"][b], item["mano_root"],
                                   atol=1e-6)
        np.testing.assert_allclose(batch["rest_obj_corners"][b],
                                   item["rest_obj_corners"], atol=1e-6)
        np.testing.assert_allclose(batch["obj_center"][b], item["obj_center"],
                                   atol=1e-6)
        np.testing.assert_allclose(batch["obj_corners"][b], item["obj_corners"],
                                   atol=1e-6)

        # sampled rows: rebuild from the tagged branch seeds + the chain
        scale_arr, offset = ds.backend.normal_params(ds.keys[b])
        scale = float(scale_arr[0])
        root = item["mano_root"]
        k = specs.sdf_scale_factor
        rec = ds.backend._key_to_idx[ds.keys[b]]
        for hand, tag, base_row in ((True, 0x68616E64, 0), (False, 0x6F626A00, per)):
            raw_s, raw_l = ds.reader.sample_sdf(
                rec, hand, per, specs.clamping_distance, True, seeds[b] ^ tag)
            exp_xyz = ((raw_s[:, :3] / scale - offset) - root) * k / 2
            rows = slice(b * 64 + base_row, b * 64 + base_row + per)
            np.testing.assert_allclose(batch["xyz"][rows], exp_xyz, atol=1e-5)
            np.testing.assert_allclose(batch["sdf_gt_hand"][rows, 0],
                                       raw_s[:, 3] / scale * k / 2, atol=1e-6)
            np.testing.assert_allclose(batch["sdf_gt_obj"][rows, 0],
                                       raw_s[:, 4] / scale * k / 2, atol=1e-6)
            np.testing.assert_array_equal(batch["labels"][rows],
                                          raw_l.astype(np.int32))


@pytest.mark.skipif(not os.path.isfile(os.path.join(BUILD, "libpacked_reader.so")),
                    reason="native packed reader not built")
def test_native_batch_loader_roundtrip(tmp_path):
    """DataLoader consumes the native fast path; same seeds across worker
    counts -> identical batches (deterministic loader contract)."""
    from alignsdf_tpu.config import Specs
    from alignsdf_tpu.data.loader import DataLoader
    from alignsdf_tpu.data.packed import PackedSDFDataset
    from alignsdf_tpu.data.synthetic import write_synthetic_dataset

    keys = [f"{i:08d}" for i in range(8)]
    base = write_synthetic_dataset(str(tmp_path), keys, n_points=400, image_hw=64)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "pack_dataset.py"),
         base, str(tmp_path / "t.pack"), "--keys", *keys],
        check=True, capture_output=True, cwd=REPO,
    )
    specs = Specs(dataset="obman", sdf_scale_factor=7.0186, samples_per_scene=32,
                  image_size=(64, 64), clamping_distance=0.05)
    ds = PackedSDFDataset(specs, str(tmp_path / "t.pack"), keys,
                          raw_image=True)

    def run(workers):
        loader = DataLoader(ds, batch_size=4, num_workers=workers, shuffle=True,
                            seed=7)
        loader.set_epoch(3)
        return list(loader)

    a, b = run(1), run(3)
    assert len(a) == len(b) == 2
    for batch_a, batch_b in zip(a, b):
        assert batch_a["image"].dtype == np.uint8
        for key in batch_a:
            np.testing.assert_array_equal(batch_a[key], batch_b[key])
