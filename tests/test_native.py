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
