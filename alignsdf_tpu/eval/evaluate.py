"""Evaluation driver: chamfer + MANO joint/vert errors + object pose errors
(reference evaluate.py:19-326 parity; multiprocessing Queue replaced by a
process pool).

Metrics (protocols from BASELINE.md):
  * hand/object chamfer: symmetric mean-squared-NN over 30k surface samples,
    cm^2, mean + median (reference deep_sdf/metrics/chamfer.py:183-231)
  * hand joint/vert error: root-relative mean L2, mm (reference evaluate.py:67-89)
  * object center/corner error: L2 vs GT, mm (reference evaluate.py:90-107)
"""

from __future__ import annotations

import json
import os
import pickle
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, List, Optional

import numpy as np

from alignsdf_tpu.eval.chamfer import compute_chamfer


def _mano_errors(pred_mano_json: str, gt_meta_pkl: str, cam_extr: np.ndarray):
    """Root-relative joint/vert L2 in mm (reference evaluate.py:67-89)."""
    with open(pred_mano_json) as f:
        pred = json.load(f)
    with open(gt_meta_pkl, "rb") as f:
        gt = pickle.load(f)

    pred_joints = np.asarray(pred["joints"], np.float64)
    gt_joints = (cam_extr @ np.asarray(gt["coords_3d"], np.float64)[:, :3].T).T

    pred_joints = pred_joints - pred_joints[0:1]
    gt_joints = gt_joints - gt_joints[0:1]
    joint_err = float(np.linalg.norm(pred_joints - gt_joints, axis=1).mean() * 1000.0)

    vert_err = None
    if "verts_3d" in gt and "vertices" in pred:
        pred_verts = np.asarray(pred["vertices"], np.float64)
        gt_verts = (cam_extr @ np.asarray(gt["verts_3d"], np.float64)[:, :3].T).T
        pred_verts = pred_verts - np.asarray(pred["joints"], np.float64)[0:1]
        gt_verts = gt_verts - (cam_extr @ np.asarray(gt["coords_3d"], np.float64)[0:1, :3].T).T
        vert_err = float(np.linalg.norm(pred_verts - gt_verts, axis=1).mean() * 1000.0)
    return joint_err, vert_err


def _obj_errors(pred_obj_json: str, gt_meta_pkl: str, cam_extr: np.ndarray):
    """Object center/corner L2 in mm (reference evaluate.py:91-105):
    center = predicted obj_trans translation vs the GT affine translation
    relative to the hand root; corners = predicted corners vs GT rows 1:."""
    with open(pred_obj_json) as f:
        pred = json.load(f)
    with open(gt_meta_pkl, "rb") as f:
        gt = pickle.load(f)
    pred_center = np.asarray(pred["obj_trans"], np.float64)[:3, 3]
    gt_center = cam_extr @ (
        np.asarray(gt["affine_transform"], np.float64)[:3, 3]
        - np.asarray(gt["coords_3d"], np.float64)[0, :3]
    )
    center_err = float(np.linalg.norm(gt_center - pred_center) * 1000.0)
    pred_corners = np.asarray(pred["obj_corners"], np.float64)
    gt_corners = (
        cam_extr @ np.asarray(gt["obj_corners_3d"], np.float64)[1:, :3].T
    ).T
    corner_err = float(
        np.linalg.norm(gt_corners - pred_corners, axis=1).mean() * 1000.0
    )
    return center_err, corner_err


def _eval_one(args):
    key, cfg = args
    out: Dict[str, Optional[float]] = {"key": key}
    cam_extr = (
        np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
        if "obman" in cfg["task"] else np.eye(3)
    )
    mesh_dir = cfg["mesh_dir"]
    gt_root = cfg["gt_root"]

    hand_pred = os.path.join(mesh_dir, key + "_hand.ply")
    hand_gt = os.path.join(gt_root, "mesh_hand", key + ".obj")
    if os.path.isfile(hand_pred) and os.path.isfile(hand_gt):
        try:
            out["chamfer_hand"] = compute_chamfer(
                hand_gt, hand_pred, optim=cfg["optim"], rot=cfg["rot"]
            )
        except Exception:
            out["chamfer_hand"] = None

    obj_pred = os.path.join(mesh_dir, key + "_obj.ply")
    obj_gt = os.path.join(gt_root, "mesh_obj", key + ".obj")
    if os.path.isfile(obj_pred) and os.path.isfile(obj_gt):
        try:
            out["chamfer_obj"] = compute_chamfer(
                obj_gt, obj_pred, optim=cfg["optim"], rot=cfg["rot"]
            )
        except Exception:
            out["chamfer_obj"] = None

    meta = os.path.join(gt_root, "meta", key + ".pkl")
    mano_json = os.path.join(cfg["output_dir"], "pred_mano", key + ".json")
    if cfg["mano"] and os.path.isfile(mano_json) and os.path.isfile(meta):
        out["joint_err"], out["vert_err"] = _mano_errors(mano_json, meta, cam_extr)

    obj_json = os.path.join(cfg["output_dir"], "object", key + ".json")
    if cfg["obj"] and os.path.isfile(obj_json) and os.path.isfile(meta):
        out["obj_center_err"], out["obj_corner_err"] = _obj_errors(obj_json, meta, cam_extr)
    return out


def evaluate(
    output_dir: str,
    task: str,
    keys: List[str],
    data_root: Optional[str] = None,
    mano: bool = False,
    obj: bool = False,
    optim: bool = False,
    rot: bool = False,
    workers: int = 10,
) -> Dict[str, float]:
    """Evaluate all reconstructed meshes; writes a summary txt and returns the
    aggregate dict (reference evaluate.py:230-326)."""
    cfg = {
        "task": task,
        "mesh_dir": os.path.join(output_dir, "meshes"),
        "gt_root": data_root or os.path.join("data", task, "test"),
        "output_dir": output_dir,
        "mano": mano,
        "obj": obj,
        "optim": optim,
        "rot": rot,
    }
    jobs = [(k, cfg) for k in keys]
    if workers > 1:
        with ProcessPoolExecutor(max_workers=workers) as pool:
            results = list(pool.map(_eval_one, jobs))
    else:
        results = [_eval_one(j) for j in jobs]

    summary: Dict[str, float] = {}

    def agg(field: str, scale: float = 1.0):
        vals = [r[field] for r in results if r.get(field) is not None]
        if vals:
            summary[f"{field}_mean"] = float(np.mean(vals)) * scale
            summary[f"{field}_median"] = float(np.median(vals)) * scale
            summary[f"{field}_count"] = len(vals)

    for field in ("chamfer_hand", "chamfer_obj", "joint_err", "vert_err",
                  "obj_center_err", "obj_corner_err"):
        agg(field)

    with open(os.path.join(output_dir, f"chamfer_{task}.txt"), "w") as f:
        for k, v in sorted(summary.items()):
            f.write(f"{k}: {v}\n")
    with open(os.path.join(output_dir, f"eval_{task}.json"), "w") as f:
        json.dump({"summary": summary, "per_sample": results}, f, indent=1)
    return summary
