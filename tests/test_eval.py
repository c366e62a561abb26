"""Golden tests: eval stack (procrustes/ICP/chamfer, error formulas) vs the
PyTorch reference's deep_sdf.metrics and evaluate.py formulas."""

import json
import os
import pickle

import numpy as np
import pytest

from tests import oracle

from alignsdf_tpu.eval import chamfer as our_chamfer
from alignsdf_tpu.eval import icp as our_icp_mod
from alignsdf_tpu.eval.evaluate import _mano_errors, _obj_errors
from alignsdf_tpu.geom.meshlib import TriMesh


def _ref_metrics():
    oracle.setup_reference()
    # reference icp_trans_scale.py uses the removed np.float alias at runtime
    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001
    import deep_sdf.metrics.chamfer as ref_chamfer
    import deep_sdf.metrics.icp_trans_scale as ref_icp

    return ref_chamfer, ref_icp


def _clouds(seed=0, n=800):
    """Two clouds related by scale+translation+noise (ICP has work to do)."""
    rng = np.random.RandomState(seed)
    tgt = rng.randn(n, 3)
    tgt /= np.linalg.norm(tgt, axis=1, keepdims=True)
    tgt *= 0.08 + 0.01 * rng.rand(n, 1)
    src = tgt * 1.17 + np.array([0.02, -0.035, 0.05]) + rng.randn(n, 3) * 1e-3
    return src, tgt


def test_procrustes_matches_reference():
    ref_chamfer, _ = _ref_metrics()
    src, tgt = _clouds(1)
    m_ref, t_ref, c_ref = ref_chamfer.procrustes(src, tgt)
    m, t, c = our_chamfer.procrustes(src, tgt)
    np.testing.assert_allclose(m, m_ref, atol=1e-10)
    np.testing.assert_allclose(t, t_ref, atol=1e-10)
    assert abs(c - c_ref) < 1e-12

    m_ref, t_ref, c_ref = ref_chamfer.procrustes(src, tgt, reflection=False)
    m, t, c = our_chamfer.procrustes(src, tgt, reflection=False)
    np.testing.assert_allclose(m, m_ref, atol=1e-10)


def test_procrustes_without_rot_matches_reference():
    ref_chamfer, _ = _ref_metrics()
    src, tgt = _clouds(2)
    m_ref, t_ref, c_ref = ref_chamfer.procrustes_without_rot(src, tgt)
    m, t, c = our_chamfer.procrustes_without_rot(src, tgt)
    np.testing.assert_allclose(m, m_ref, atol=1e-9)
    np.testing.assert_allclose(t, t_ref, atol=1e-9)
    assert abs(c - c_ref) < 1e-12


@pytest.mark.parametrize("rot", [False, True])
def test_symmetric_icp_matches_reference(rot):
    ref_chamfer, _ = _ref_metrics()
    src, tgt = _clouds(3)
    a_ref, b_ref, c_ref = ref_chamfer.icp(src, tgt, rot=rot)
    a, b, c = our_chamfer.icp(src, tgt, rot=rot)
    np.testing.assert_allclose(a, a_ref, atol=1e-8)
    np.testing.assert_allclose(b, b_ref, atol=1e-8)
    assert abs(c - c_ref) < 1e-10


def test_icp_trans_scale_matches_reference(monkeypatch):
    ref_chamfer, ref_icp = _ref_metrics()
    src, tgt = _clouds(4)

    class FakeMesh:
        def __init__(self, v):
            self.vertices = v
            self.faces = np.zeros((1, 3), np.int64)

    # feed both implementations identical surface samples
    import trimesh

    clouds = {}
    src_mesh, tgt_mesh = FakeMesh(src), FakeMesh(tgt)
    clouds[id(src_mesh)] = src
    clouds[id(tgt_mesh)] = tgt
    trimesh.sample.sample_surface = lambda m, n: (clouds[id(m)], None)

    solver_ref = ref_icp.ICP_T_S(src_mesh, tgt_mesh)
    solver_ref.sample_mesh(len(src), "both")
    solver_ref.run_icp_f(max_iter=100)
    trans_ref, scale_ref = solver_ref.get_trans_scale()

    ours_src = TriMesh(src, np.zeros((1, 3), np.int64))
    ours_tgt = TriMesh(tgt, np.zeros((1, 3), np.int64))
    monkeypatch.setattr(our_icp_mod, "sample_surface",
                        lambda m, n, rng: np.asarray(m.vertices))
    solver = our_icp_mod.ICPTransScale(ours_src, ours_tgt)
    solver.sample_mesh(len(src), "both")
    solver.run_icp_f(max_iter=100)
    trans, scale = solver.get_trans_scale()

    np.testing.assert_allclose(np.asarray(scale), np.asarray(scale_ref), atol=1e-8)
    np.testing.assert_allclose(np.asarray(trans), np.asarray(trans_ref), atol=1e-8)
    np.testing.assert_allclose(
        solver.points_source * solver.scale + solver.trans,
        solver_ref.points_source * solver_ref.scale + solver_ref.trans,
        atol=1e-8,
    )


@pytest.mark.parametrize("optim,rot", [(False, False), (True, False), (True, True)])
def test_compute_chamfer_matches_reference(monkeypatch, optim, rot):
    ref_chamfer, ref_icp = _ref_metrics()
    src, tgt = _clouds(5, n=600)

    class FakeMesh:
        def __init__(self, v):
            self.vertices = v
            self.faces = np.zeros((1, 3), np.int64)

    import trimesh

    meshes = {"pred.ply": FakeMesh(src), "gt.obj": FakeMesh(tgt)}
    # copies: the reference scales the sampled clouds in place (`*= 100.`)
    trimesh.load = lambda p, process=False: meshes[p]
    trimesh.sample.sample_surface = lambda m, n: (
        np.array(m.vertices, np.float64), None)

    def _trimesh_registration_icp(a, b, initial=None, threshold=1e-5,
                                  max_iterations=20, **kwargs):
        """trimesh.registration.icp semantics, built on the *reference's*
        procrustes so the oracle path stays reference-only code."""
        from scipy.spatial import cKDTree
        a = np.asanyarray(a, np.float64)
        b = np.asanyarray(b, np.float64)
        total = np.identity(4) if initial is None else initial
        a = ref_chamfer.transform_points(a, total)
        btree = cKDTree(b)
        old_cost = np.inf
        transformed, cost = a, old_cost
        for _ in range(max_iterations):
            _, idx = btree.query(a, 1)
            matrix, transformed, cost = ref_chamfer.procrustes(a, b[idx])
            a = transformed
            total = np.dot(matrix, total)
            if old_cost - cost < threshold:
                break
            old_cost = cost
        return total, transformed, cost

    trimesh.registration.icp = _trimesh_registration_icp
    ref_val = ref_chamfer.compute_trimesh_chamfer("gt.obj", "pred.ply",
                                                  optim=optim, rot=rot)

    monkeypatch.setattr(our_chamfer, "load_mesh",
                        lambda p: TriMesh(np.asarray(meshes[p].vertices),
                                          np.zeros((1, 3), np.int64)))
    monkeypatch.setattr(our_chamfer, "sample_surface",
                        lambda m, n, rng: np.array(m.vertices, np.float64))
    monkeypatch.setattr(our_icp_mod, "sample_surface",
                        lambda m, n, rng: np.array(m.vertices, np.float64))
    our_val = our_chamfer.compute_chamfer("gt.obj", "pred.ply",
                                          optim=optim, rot=rot)
    assert abs(our_val - ref_val) < 1e-6, (our_val, ref_val)


def test_evaluate_driver_modes(tmp_path):
    """End-to-end evaluate() in every mode on tiny synthetic workspaces:
    mesh selection (reference evaluate.py:48-60), key discovery, summary
    files, and best/worst artifact copies."""
    from alignsdf_tpu.eval.evaluate import evaluate

    rng = np.random.RandomState(1)

    def ball(c, r):
        v = rng.randn(30, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        f = np.array([[i, (i + 1) % 30, (i + 2) % 30] for i in range(28)],
                     np.int64)
        return TriMesh(v * r + np.asarray(c), f)

    out = str(tmp_path / "Eval_obman")
    gt = str(tmp_path / "gt")
    for d in ("meshes", "pred_mano", "object"):
        os.makedirs(os.path.join(out, d))
    for d in ("mesh_hand", "mesh_obj", "meta", "rgb"):
        os.makedirs(os.path.join(gt, d))

    keys = ["00000001", "00000002"]
    for key in keys:
        ball([0, 0, 0.1], 0.08).export(os.path.join(out, "meshes", key + "_hand.ply"))
        ball([0, 0, 0.1], 0.081).export(os.path.join(gt, "mesh_hand", key + ".obj"))
        ball([0.1, 0, 0.1], 0.05).export(os.path.join(out, "meshes", key + "_obj.ply"))
        ball([0.1, 0, 0.1], 0.052).export(os.path.join(gt, "mesh_obj", key + ".obj"))
        ball([0, 0, 0.1], 0.079).export(os.path.join(out, "pred_mano", key + ".ply"))
        ball([0, 0, 0.1], 0.08).export(os.path.join(out, "pred_mano", key + "_hand.ply"))
        meta = {
            "coords_3d": rng.randn(21, 3) * 0.05,
            "verts_3d": rng.randn(778, 3) * 0.05,
            "affine_transform": np.vstack([
                np.hstack([np.eye(3), rng.randn(3, 1) * 0.1]), [[0, 0, 0, 1]]]),
            "obj_corners_3d": rng.randn(9, 3) * 0.08,
        }
        with open(os.path.join(gt, "meta", key + ".pkl"), "wb") as f:
            pickle.dump(meta, f)
        with open(os.path.join(out, "pred_mano", key + ".json"), "w") as f:
            json.dump({"joints": (rng.randn(21, 3) * 0.05).tolist(),
                       "vertices": (rng.randn(778, 3) * 0.05).tolist()}, f)
        with open(os.path.join(out, "object", key + ".json"), "w") as f:
            json.dump({
                "obj_corners": (rng.randn(8, 3) * 0.08).tolist(),
                "obj_trans": np.vstack([
                    np.hstack([np.eye(3), rng.randn(3, 1) * 0.1]),
                    [[0, 0, 0, 1]]]).tolist()}, f)

    # default hand mode, keys discovered from the workspace
    s = evaluate(out, "obman", keys=None, data_root=gt, workers=1)
    assert s["chamfer_count"] == 2 and s["failure_count"] == 0
    assert os.path.isfile(os.path.join(out, "chamfer_hand.txt"))
    assert os.listdir(os.path.join(out, "worst_hand"))  # extremes copied

    # mano mode evaluates the MANO mesh + errors
    s = evaluate(out, "obman", keys=keys, data_root=gt, mano=True, workers=1)
    assert s["joint_err_count"] == 2 and "vert_err_mean" in s
    assert os.path.isfile(os.path.join(out, "chamfer_mano.txt"))

    # obj mode: object chamfer + center/corner errors
    s = evaluate(out, "obman", keys=keys, data_root=gt, obj=True, optim=True,
                 workers=1)
    assert s["obj_center_err_count"] == 2 and s["chamfer_count"] == 2
    assert os.path.isfile(os.path.join(out, "chamfer_obj.txt"))

    # fit mode: SDF hand mesh vs MANO hand mesh
    s = evaluate(out, "obman", keys=keys, data_root=gt, fit=True, workers=1)
    assert s["chamfer_count"] == 2
    assert os.path.isfile(os.path.join(out, "fit.txt"))


def test_error_formulas_match_reference(tmp_path):
    """MANO joint/vert + object center/corner errors vs the reference's
    formulas (evaluate.py:67-107), computed inline on the same fixtures."""
    rng = np.random.RandomState(6)
    cam_extr = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])

    gt = {
        "coords_3d": rng.randn(21, 3) * 0.05,
        "verts_3d": rng.randn(778, 3) * 0.05,
        "affine_transform": np.vstack([
            np.hstack([np.eye(3), rng.randn(3, 1) * 0.1]), [[0, 0, 0, 1]]]),
        "obj_corners_3d": rng.randn(9, 3) * 0.08,
    }
    pred = {
        "joints": (rng.randn(21, 3) * 0.05).tolist(),
        "vertices": (rng.randn(778, 3) * 0.05).tolist(),
    }
    obj_trans = np.vstack([np.hstack([np.eye(3), rng.randn(3, 1) * 0.1]),
                           [[0, 0, 0, 1]]])
    pred_obj = {
        "obj_corners": (rng.randn(8, 3) * 0.08).tolist(),
        "obj_trans": obj_trans.tolist(),
    }

    meta = tmp_path / "m.pkl"
    with open(meta, "wb") as f:
        pickle.dump(gt, f)
    mano_json = tmp_path / "m.json"
    with open(mano_json, "w") as f:
        json.dump(pred, f)
    obj_json = tmp_path / "o.json"
    with open(obj_json, "w") as f:
        json.dump(pred_obj, f)

    joint_err, vert_err = _mano_errors(str(mano_json), str(meta), cam_extr)

    # reference evaluate.py:71-86 inline
    pred_joints = np.array(pred["joints"])
    pred_verts = np.array(pred["vertices"])
    gt_joints = cam_extr.dot(gt["coords_3d"].transpose(1, 0)).transpose(1, 0)
    gt_verts = cam_extr.dot(gt["verts_3d"].transpose(1, 0)).transpose(1, 0)
    pred_verts = pred_verts - pred_joints[0]
    pred_joints = pred_joints - pred_joints[0]
    gt_verts = gt_verts - gt_joints[0]
    gt_joints = gt_joints - gt_joints[0]
    ref_joint = np.mean(np.linalg.norm(gt_joints - pred_joints, axis=1)) * 1000
    ref_vert = np.mean(np.linalg.norm(gt_verts - pred_verts, axis=1)) * 1000
    assert abs(joint_err - ref_joint) < 1e-9
    assert abs(vert_err - ref_vert) < 1e-9

    center_err, corner_err = _obj_errors(str(obj_json), str(meta), cam_extr)

    # reference evaluate.py:92-105 inline
    pred_obj_center = np.array(pred_obj["obj_trans"])[:3, 3]
    pred_obj_corners = np.array(pred_obj["obj_corners"])
    gt_obj_center = cam_extr.dot(
        gt["affine_transform"][:3, 3] - gt["coords_3d"][0, :])
    gt_obj_corners = cam_extr.dot(
        gt["obj_corners_3d"][1:, :].transpose(1, 0)).transpose(1, 0)
    ref_center = np.linalg.norm(gt_obj_center - pred_obj_center) * 1000
    ref_corner = np.mean(
        np.linalg.norm(gt_obj_corners - pred_obj_corners, axis=1)) * 1000
    assert abs(center_err - ref_center) < 1e-9
    assert abs(corner_err - ref_corner) < 1e-9
