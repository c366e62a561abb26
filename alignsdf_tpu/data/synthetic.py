"""Synthetic data generation: training batches and on-disk reference-format
datasets for tests/smoke runs (no ObMan/DexYCB download in this environment)."""

from __future__ import annotations

import os
import pickle
import zlib
from typing import Dict, List

import numpy as np

from alignsdf_tpu.config import Specs


def synthetic_train_batch(specs: Specs, batch_size: int = 2,
                          seed: int = 0) -> Dict[str, np.ndarray]:
    """A random batch with the exact shapes/layout of data.dataset.to_train_batch."""
    rng = np.random.RandomState(seed)
    n = specs.samples_per_scene
    h, w = specs.image_size
    total = batch_size * n
    cam = np.tile(
        np.concatenate(
            [np.array([[480.0, 0, 128], [0, 480.0, 128], [0, 0, 1]], np.float32),
             np.zeros((3, 1), np.float32)], axis=1,
        )[None], (batch_size, 1, 1),
    )
    return {
        "image": rng.rand(batch_size, h, w, 3).astype(np.float32),
        "xyz": (rng.randn(total, 3) * 0.3).astype(np.float32),
        "sdf_gt_hand": (rng.randn(total, 1) * 0.03).astype(np.float32),
        "sdf_gt_obj": (rng.randn(total, 1) * 0.03).astype(np.float32),
        "labels": rng.randint(-1, specs.network_specs.num_class, total).astype(np.int32),
        "cam_intr": cam,
        "mano_root": (rng.randn(batch_size, 3) * 0.05
                      + np.array([0, 0, 0.6], np.float32)).astype(np.float32),
        "rest_obj_corners": (rng.randn(batch_size, 8, 3) * 0.05).astype(np.float32),
        "hand_joints_3d": (rng.randn(batch_size, 21, 3) * 0.05
                           + np.array([0, 0, 0.6], np.float32)).astype(np.float32),
        "obj_center": (rng.rand(batch_size, 3) * 64).astype(np.float32),
        "obj_corners": (rng.randn(batch_size, 8, 3) * 0.05).astype(np.float32),
    }


def geometric_scene_params(key: str, seed: int = 0) -> Dict[str, np.ndarray]:
    """Deterministic per-scene geometry for the geometric dataset: hand and
    object spheres in the WORK frame (camera frame after the ObMan extrinsic
    flip — the frame meta joints land in after `cam_extr @ coords_3d`).

    crc32, not hash(): Python's hash() is salted per process, which would
    make the dataset irreproducible across runs."""
    rng = np.random.RandomState(
        (zlib.crc32(key.encode()) ^ seed) & 0x7FFFFFFF)
    root = np.array([0.0, 0.0, 0.55], np.float32) + rng.uniform(
        -0.04, 0.04, 3).astype(np.float32)
    direction = rng.randn(3).astype(np.float32)
    direction /= np.linalg.norm(direction)
    obj_center = root + direction * rng.uniform(0.08, 0.11)
    return {
        "root": root,
        "hand_radius": np.float32(0.06),
        "obj_center": obj_center.astype(np.float32),
        "obj_radius": np.float32(0.04),
    }


def _icosphere(center, radius: float, subdiv: int = 3):
    """Octahedron-subdivision sphere mesh (verts, faces)."""
    verts = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                      [0, 0, 1], [0, 0, -1]], np.float64)
    faces = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                      [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int64)
    for _ in range(subdiv):
        edge_mid: Dict[tuple, int] = {}
        new_faces = []
        verts_list = list(verts)

        def mid(a, b):
            k = (min(a, b), max(a, b))
            if k not in edge_mid:
                m = verts_list[a] + verts_list[b]
                m /= np.linalg.norm(m)
                edge_mid[k] = len(verts_list)
                verts_list.append(m)
            return edge_mid[k]

        for f in faces:
            a, b, c = int(f[0]), int(f[1]), int(f[2])
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces, np.int64)
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True)
    return (verts * radius + np.asarray(center)).astype(np.float32), faces


def geometric_part_label(pts: np.ndarray, hand_center: np.ndarray) -> np.ndarray:
    """Analytic hand-part label (0..5) of a point: the azimuthal sextant of
    its direction from the hand-sphere center, in the frame of ``pts``.

    Mirrors the reference label semantics (PreprocessMesh.cpp:269-280 stores
    the part label of the nearest hand-surface point in lab_* column 0): for
    a sphere the nearest surface point lies along the ray from the center,
    so the sextant of the direction IS the nearest-surface-point's label —
    exact for both the hand's own samples and the obj file's lab_*_other.
    This makes the classifier path provable: accuracy of re-queried labels
    at reconstructed-mesh vertices vs this function must be >> 1/6 chance."""
    d = np.asarray(pts, np.float64) - np.asarray(hand_center, np.float64)
    az = np.arctan2(d[:, 1], d[:, 0])  # [-pi, pi]
    lab = np.floor((az + np.pi) / (np.pi / 3.0)).astype(np.int64)
    return np.clip(lab, 0, 5).astype(np.uint8)


_MANO_CACHE: Dict[str, object] = {}


def _mano_joints(pose_coeffs: np.ndarray) -> np.ndarray:
    """(1, 3+ncomps) pose -> (21, 3) joints centered at the root, via the
    real MANO layer on the CPU backend (flagship convention: ncomps 15,
    center_idx 0 — models/manobranch.py)."""
    import jax

    from alignsdf_tpu.mano.layer import load_mano_model, mano_forward

    if "model" not in _MANO_CACHE:
        _MANO_CACHE["model"] = load_mano_model(side="right", ncomps=15)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else _nullcontext()
    with ctx:
        out = mano_forward(_MANO_CACHE["model"],
                           jax.numpy.asarray(pose_coeffs), center_idx=0)
        return np.asarray(out.joints[0], np.float32)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def write_geometric_dataset(root: str, keys: List[str],
                            dataset: str = "obman", n_points: int = 8000,
                            seed: int = 0, image_hw: int = 256,
                            split: str = "train",
                            sdf_scale_factor: float = 7.018621123357809,
                            ) -> str:
    """A dataset with ANALYTICALLY KNOWN geometry in the reference layout:
    per scene, the hand is a sphere at the MANO root and the object a sphere
    at a nearby offset; SDF samples carry the exact sphere signed distances
    (both 'self' and 'other' columns), meta joints/corners/centers are
    consistent with the spheres, and GT meshes land in mesh_hand/mesh_obj.

    Training on this set and reconstructing it measures whether the COMPOSED
    system optimizes to correct geometry (the reference's de-facto oracle:
    eval metrics after training, SURVEY §4) — chamfer to the analytic
    spheres must approach the voxel floor.

    norm npz is written with scale=1/offset=0, so npz coordinates ARE work-
    frame coordinates through the loader chain (x/scale - offset).
    Returns the '<root>/<dataset>/<split>' data_source path.
    """
    import cv2

    from alignsdf_tpu.geom.meshlib import TriMesh

    flip = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    base = os.path.join(root, dataset, split)
    for sub in ("rgb", "norm", "meta", "sdf_hand", "sdf_obj", "mesh_hand",
                "mesh_obj"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)

    corner_offsets = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float32)

    for key in keys:
        scene = geometric_scene_params(key, seed)
        rng = np.random.RandomState(
            (zlib.crc32(key.encode()) ^ seed ^ 0x5A17) & 0x7FFFFFFF)
        img = (rng.rand(image_hw, image_hw, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(base, "rgb", key + ".jpg"), img[:, :, ::-1])
        np.savez(os.path.join(base, "norm", key + ".npz"),
                 scale=np.array([1.0], np.float32),
                 offset=np.zeros(3, np.float32))

        centers = {"sdf_hand": (scene["root"], float(scene["hand_radius"]),
                                scene["obj_center"], float(scene["obj_radius"])),
                   "sdf_obj": (scene["obj_center"], float(scene["obj_radius"]),
                               scene["root"], float(scene["hand_radius"]))}
        half = n_points // 2
        for sub, (c, r, c_other, r_other) in centers.items():
            # 85% near-surface shell + 15% uniform box (denser uniform tail
            # than the reference's 94%/6%, PreprocessMesh.cpp:726 — the tiny
            # scene count needs more off-surface coverage per scene)
            n_near = int(n_points * 0.85)
            u = rng.randn(n_points, 3)
            u /= np.linalg.norm(u, axis=1, keepdims=True)
            radii = r + rng.randn(n_points) * 0.02
            pts = c + u * np.maximum(radii, 0.005)[:, None]
            pts[n_near:] = c + rng.uniform(-0.18, 0.18, (n_points - n_near, 3))
            sdf = (np.linalg.norm(pts - c, axis=1) - r).astype(np.float32)
            sdf_other = (np.linalg.norm(pts - c_other, axis=1)
                         - r_other).astype(np.float32)
            # hand-part labels relative to the HAND center in both files
            # (scene["root"]): the hand file's own labels and the obj file's
            # nearest-hand labels coincide for spheres (geometric_part_label)
            part = geometric_part_label(pts, scene["root"])
            pos = sdf >= 0
            blocks = {}
            for name, m in (("pos", pos), ("neg", ~pos)):
                take = np.where(m)[0][:half]
                if len(take) == 0:
                    raise ValueError(
                        f"{key}/{sub}: no {name} samples — degenerate scene "
                        "(np.resize on an empty take would silently emit "
                        "wrong-sign zeros)")
                # pad by repetition if one side is short
                if len(take) < half:
                    take = np.concatenate(
                        [take, np.resize(take, half - len(take))])
                blocks[name] = np.concatenate(
                    [pts[take], sdf[take, None]], axis=1).astype(np.float32)
                blocks[name + "_other"] = sdf_other[take, None].astype(
                    np.float32)
                lab = np.zeros((half, 4), np.uint8)
                lab[:, 0] = part[take]
                blocks["lab_" + name] = lab
                blocks["lab_" + name + "_other"] = lab.copy()
            np.savez(os.path.join(base, sub, key + ".npz"), **blocks)

        # meta in the stored (pre-flip) frame: work = flip @ stored.
        # GT joints come from a real MANO forward pass (small random PCA
        # pose, zero shape) so the MANO branch can actually FIT them — the
        # joint error of an overfit run then converges instead of flooring
        # at the distance to unrealizable targets
        pose = np.zeros((1, 18), np.float32)
        pose[0, 3:] = rng.randn(15).astype(np.float32) * 0.3
        joints_w = scene["root"] + _mano_joints(pose)
        obj_pts_w = np.concatenate(
            [scene["obj_center"][None],
             scene["obj_center"] + corner_offsets * scene["obj_radius"]])
        rest_w = np.concatenate(
            [np.zeros((1, 3), np.float32),
             corner_offsets * scene["obj_radius"]])
        meta = {
            "coords_3d": (flip @ joints_w.T).T.astype(np.float32),
            "obj_corners_3d": (flip @ obj_pts_w.T).T.astype(np.float32),
            "obj_rest_corners_3d": (flip @ rest_w.T).T.astype(np.float32),
            "hand_pose": np.zeros(45, np.float32),
            "affine_transform": np.eye(4, dtype=np.float32),
            "cam_intr": np.array([[480.0, 0, 128], [0, 480.0, 128],
                                  [0, 0, 1]], np.float32),
            "camMat": np.array([[480.0, 0, 128], [0, 480.0, 128], [0, 0, 1]],
                               np.float32),
            "handJoints3D": (flip @ joints_w[0]).astype(np.float32),
        }
        with open(os.path.join(base, "meta", key + ".pkl"), "wb") as f:
            pickle.dump(meta, f)

        # GT meshes live in the HALF-SCALED DECODER frame, like the reference
        # datasets' eval meshes: the reference exports reconstructions with
        # scale=None/offset=None (reconstruct.py:93 -> utils/mesh.py:126) and
        # chamfers them directly against mesh_hand/mesh_obj (evaluate.py:53)
        for sub, (c, r) in (("mesh_hand", (scene["root"],
                                           float(scene["hand_radius"]))),
                            ("mesh_obj", (scene["obj_center"],
                                          float(scene["obj_radius"])))):
            v, fcs = _icosphere(c, r)
            v_dec = (v - scene["root"]) * (sdf_scale_factor / 2.0)
            TriMesh(v_dec, fcs).export(os.path.join(base, sub, key + ".obj"))

    return base


def write_synthetic_dataset(root: str, keys: List[str], dataset: str = "obman",
                            n_points: int = 4000, seed: int = 0,
                            image_hw: int = 256, split: str = "train") -> str:
    """Create an on-disk dataset in the reference npz/pkl/jpg layout
    (schemas: sdf npz keys per reference scripts/sample_points/src/
    PreprocessMesh.cpp:218-287; meta pkl per reference utils/sdf_utils.py:65-85).

    Returns the '<root>/<dataset>/<split>' data_source path.
    """
    import cv2

    rng = np.random.RandomState(seed)
    base = os.path.join(root, dataset, split)
    for sub in ("rgb", "norm", "meta", "sdf_hand", "sdf_obj", "mesh_hand",
                "mesh_obj", "mesh_obj_rest"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)

    for key in keys:
        img = (rng.rand(image_hw, image_hw, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(base, "rgb", key + ".jpg"), img[:, :, ::-1])

        scale = np.float32(rng.uniform(4.0, 6.0))
        offset = rng.randn(3).astype(np.float32) * 0.1
        np.savez(os.path.join(base, "norm", key + ".npz"),
                 scale=np.array([scale], np.float32), offset=offset)

        half = n_points // 2

        def sdf_block(sign):
            xyz = rng.randn(half, 3).astype(np.float32) * 0.4
            sdf = (np.abs(rng.randn(half, 1)) * 0.2 * sign).astype(np.float32)
            return np.concatenate([xyz, sdf], axis=1)

        for sub in ("sdf_hand", "sdf_obj"):
            pos, neg = sdf_block(1.0), sdf_block(-1.0)
            np.savez(
                os.path.join(base, sub, key + ".npz"),
                pos=pos, neg=neg,
                pos_other=(rng.randn(half, 1) * 0.2).astype(np.float32),
                neg_other=(rng.randn(half, 1) * 0.2).astype(np.float32),
                lab_pos=rng.randint(0, 4, (half, 4)).astype(np.uint8),
                lab_neg=rng.randint(0, 4, (half, 4)).astype(np.uint8),
                lab_pos_other=rng.randint(0, 4, (half, 4)).astype(np.uint8),
                lab_neg_other=rng.randint(0, 4, (half, 4)).astype(np.uint8),
            )

        joints = rng.randn(21, 3).astype(np.float32) * 0.05 + np.array(
            [0, 0.0, -0.6], np.float32
        )
        corners = rng.randn(9, 3).astype(np.float32) * 0.05 + np.array(
            [0, 0.0, -0.6], np.float32
        )
        meta = {
            "coords_3d": joints,
            "obj_corners_3d": corners,
            "obj_rest_corners_3d": rng.randn(9, 3).astype(np.float32) * 0.05,
            "hand_pose": rng.randn(45).astype(np.float32) * 0.1,
            "affine_transform": np.eye(4, dtype=np.float32),
            "cam_intr": np.array([[480.0, 0, 128], [0, 480.0, 128], [0, 0, 1]],
                                  np.float32),
            # ho3d-task meta keys (reference utils/sdf_utils.py:104-106):
            # ho3d pkls carry the intrinsics as 'camMat' and the root joint
            # inside 'handJoints3D'.  Written unconditionally so the same
            # synthetic dataset exercises any task's unpack path.
            "camMat": np.array([[614.6, 0, 320.0], [0, 614.1, 240.0],
                                [0, 0, 1]], np.float32),
            "handJoints3D": joints[0],
        }
        with open(os.path.join(base, "meta", key + ".pkl"), "wb") as f:
            pickle.dump(meta, f)

    return base
