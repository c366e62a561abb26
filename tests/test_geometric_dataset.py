"""Geometric proof-dataset invariants (data/synthetic.write_geometric_dataset):
frame conventions that the overfit proof and the reference-protocol chamfer
depend on.  Guards the round-4 frame bug where GT eval meshes were written in
work-frame meters while the reconstruction exports (like the reference's,
reconstruct.py:93 -> utils/mesh.py:126 with scale=None) live in the
half-scaled decoder frame."""

import os
import pickle

import numpy as np

from alignsdf_tpu.data.synthetic import (
    geometric_scene_params,
    write_geometric_dataset,
)

SSF = 7.018621123357809


def test_frames_and_reproducibility(tmp_path):
    keys = ["a", "b"]
    base = write_geometric_dataset(str(tmp_path), keys, n_points=600,
                                   image_hw=64, sdf_scale_factor=SSF)
    flip = np.diag([1.0, -1.0, -1.0]).astype(np.float32)

    for key in keys:
        scene = geometric_scene_params(key)

        # GT eval meshes live in the half-scaled DECODER frame: mapping back
        # through root + scale must land on the analytic sphere
        from alignsdf_tpu.geom.meshlib import load_mesh

        mesh = load_mesh(os.path.join(base, "mesh_hand", key + ".obj"))
        v_work = mesh.vertices * (2.0 / SSF) + scene["root"]
        r = np.linalg.norm(v_work - scene["root"], axis=1)
        np.testing.assert_allclose(r, float(scene["hand_radius"]), atol=1e-4)

        # meta joints: work frame = flip @ stored; root consistent
        with open(os.path.join(base, "meta", key + ".pkl"), "rb") as f:
            meta = pickle.load(f)
        root_w = flip @ np.asarray(meta["coords_3d"], np.float32)[0]
        np.testing.assert_allclose(root_w, scene["root"], atol=1e-5)

        # SDF samples: stored coords are work-frame (norm scale=1, offset=0)
        # and the sdf column is the exact sphere distance
        with np.load(os.path.join(base, "sdf_hand", key + ".npz")) as z:
            pos = z["pos"]
        d = np.linalg.norm(pos[:, :3] - scene["root"], axis=1) - float(
            scene["hand_radius"])
        np.testing.assert_allclose(pos[:, 3], d, atol=1e-5)

    # scene params are process-stable (crc32, not the salted builtin hash):
    # pinned values guard cross-process reproducibility
    s = geometric_scene_params("a")
    np.testing.assert_allclose(
        s["root"], [-0.022646, -0.029419, 0.549685], atol=1e-5)
