"""Synthetic data generation: training batches and on-disk reference-format
datasets for tests/smoke runs (no ObMan/DexYCB download in this environment)."""

from __future__ import annotations

import os
import pickle
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
