"""Mesh-level end-to-end bit-match: the reference's full ``reconstruct()``
(reference reconstruct.py:33-95 -> utils/mesh.py:17-195,331-398) vs our
``cli/reconstruct`` on the SAME converted weights and synthetic image —
comparing the final PLY vertices, i.e. the composed pipeline
grid fields -> marching cubes -> largest connected component (-> ICP).

Both pipelines share the marching-cubes / component-split / surface-sampler
implementations (oracle.install_mesh_stubs backs the absent skimage/trimesh/
sklearn with alignsdf_tpu.geom + scipy), so what this verifies is exactly the
SURVEY §7 milestone composition the field-level tests could not."""

import json
import os
import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import oracle
from test_full_model import _specs_dict

torch = pytest.importorskip("torch")

CUBE = 24


@pytest.fixture(scope="module")
def pipelines(tmp_path_factory, request):
    request.addfinalizer(oracle.uninstall_torch_div_compat)
    from alignsdf_tpu.config import specs_from_dict, specs_to_dict
    from alignsdf_tpu.data.synthetic import write_synthetic_dataset
    from alignsdf_tpu.models.alignsdf import build_model
    from alignsdf_tpu.models.torch_import import convert_alignsdf
    from alignsdf_tpu.training import checkpoints as ckpt
    from alignsdf_tpu.training.train_state import make_optimizer
    from alignsdf_tpu.training.train_step import init_train_state

    tmp = tmp_path_factory.mktemp("e2e_mesh")
    data_root = tmp / "data"
    specs_dict = _specs_dict(
        ManoBranch=True, EncodeStyle="hand", PointFeatSize=6,
        ImageSize=[64, 64], LatentSize=64, DataSource=str(data_root),
    )
    oracle.install_mesh_stubs()
    specs = specs_from_dict(specs_dict)

    # synthetic obman test set (1 image) + GT hand mesh for the ICP leg
    base = write_synthetic_dataset(str(data_root), ["m0"], n_points=64,
                                   image_hw=64, split="test")
    with open(os.path.join(base, "meta", "m0.pkl"), "rb") as f:
        meta = pickle.load(f)
    root = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32) @ \
        np.asarray(meta["coords_3d"], np.float32)[0]
    from alignsdf_tpu.geom.meshlib import TriMesh

    r = 0.35
    v = np.array([[r, 0, 0], [-r, 0, 0], [0, r, 0], [0, -r, 0],
                  [0, 0, r], [0, 0, -r]], np.float32) + root
    fcs = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                    [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int64)
    TriMesh(v, fcs).export(os.path.join(base, "mesh_hand", "m0.obj"))
    TriMesh(v, fcs).export(os.path.join(base, "mesh_obj", "m0.obj"))

    split_json = tmp / "split.json"
    with open(split_json, "w") as f:
        json.dump({"filenames": ["m0.jpg"]}, f)

    # Random-init decoders usually emit single-sign (or barely-crossing) SDF
    # fields, and the data-dependent refined cube amplifies fp noise on such
    # fields into different pass-2 grids.  Center each branch's field by
    # shifting the final-layer bias so ~half the volume is inside — a robust,
    # deterministic iso-surface for the composition under test.
    from alignsdf_tpu.data.dataset import ImagesDataset
    from alignsdf_tpu.inference.grid import make_grid_evaluator
    from alignsdf_tpu.models.alignsdf import full_variables

    sample = ImagesDataset(["m0.jpg"], specs, "obman", data_root=base)[0]
    torch.manual_seed(0)
    ref_model = oracle.reference_full_model(specs_dict)

    # Damp the decoder's xyz-frequency (emb columns are the last 6 inputs of
    # layer 0 and the latent_in re-injection): a random-init decoder's
    # iso-surface is otherwise a many-component sponge whose largest-CC pick
    # is unstable under cross-framework fp noise; damped, both branches give
    # one smooth blob.
    with torch.no_grad():
        for pre in ("linh", "lino"):
            getattr(ref_model.decoder, pre + "0").weight_v[:, -6:] *= 0.1
            getattr(ref_model.decoder, pre + "2").weight_v[:, -6:] *= 0.1

    def probe_fields():
        model_p = build_model(specs)
        params_p, stats_p = convert_alignsdf(ref_model.state_dict(), specs,
                                             (2, 2, 2, 2))
        variables_p = full_variables(model_p, params_p, stats_p)
        latent, mano_results, _ = model_p.apply(
            variables_p, jnp.asarray(sample["image"])[None],
            jnp.asarray(sample["cam_intr"])[None],
            jnp.asarray(sample["mano_root"]).reshape(1, -1),
            jnp.asarray(sample["rest_obj_corners"])[None],
            method=model_p.encode_scene)

        def decode_fn(ctx, inputs, _m=model_p):
            return _m.apply({"params": ctx["params"]}, inputs,
                            method=_m.decode_points)

        ev = make_grid_evaluator(decode_fn, specs, 16, chunk=1024,
                                 two_pass=False)
        r = ev({"params": params_p, "latent": latent,
                "rot_center": mano_results["rot_center"],
                "global_trans": mano_results["global_trans"]})
        return np.asarray(r.sdf_hand), np.asarray(r.sdf_obj)

    h, o = probe_fields()
    with torch.no_grad():
        last = len(specs.network_specs.dims)  # final layer index
        getattr(ref_model.decoder, f"linh{last}").bias -= float(
            np.arctanh(np.clip(np.median(h), -0.9, 0.9)))
        getattr(ref_model.decoder, f"lino{last}").bias -= float(
            np.arctanh(np.clip(np.median(o), -0.9, 0.9)))
    h, o = probe_fields()
    assert h.min() < 0 < h.max() and o.min() < 0 < o.max()

    # --- reference pipeline, cwd with the relative paths it hard-codes
    import reconstruct as ref_reconstruct

    ref_cwd = tmp / "refcwd"
    os.makedirs(ref_cwd)
    os.symlink("/root/reference/mano", ref_cwd / "mano")
    os.symlink(data_root, ref_cwd / "data")

    class _Wrap(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.module = m

    ref_out = tmp / "ref_out"

    def run_reference(eval_mode):
        cwd = os.getcwd()
        os.chdir(ref_cwd)
        oracle.reset_mesh_sampling_rng(0)
        try:
            ref_reconstruct.reconstruct(
                _Wrap(ref_model), specs_dict, str(split_json), str(ref_out),
                0, 1, task="obman", device="cpu", cube_dim=CUBE,
                eval_mode=eval_mode)
        finally:
            os.chdir(cwd)

    # --- our pipeline: converted weights -> checkpoint -> cli/reconstruct
    model = build_model(specs)
    params, stats = convert_alignsdf(ref_model.state_dict(), specs,
                                     (2, 2, 2, 2))
    optimizer = make_optimizer(specs)
    state = init_train_state(model, specs, jax.random.PRNGKey(0), optimizer)
    state = state.replace(params=params, batch_stats=stats)
    exp_dir = tmp / "exp"
    os.makedirs(exp_dir)
    with open(exp_dir / "specs.json", "w") as f:
        json.dump(specs_to_dict(specs), f)
    ckpt.save_checkpoint(str(exp_dir), state, 1, "latest")

    from alignsdf_tpu.cli.reconstruct import main as reconstruct_main

    def run_ours(eval_mode):
        args = ["-e", str(exp_dir), "-t", "obman", "-s", str(split_json),
                "--cube_dim", str(CUBE), "--data_root", base]
        if eval_mode:
            args.append("--eval_mode")
        reconstruct_main(args)

    ours_meshes = exp_dir / "Eval_obman" / "meshes"
    return run_reference, run_ours, ref_out / "meshes", ours_meshes


def _read_ply_verts(path):
    from alignsdf_tpu.geom.meshlib import read_ply

    m = read_ply(str(path))
    return m.vertices, m.faces


def _assert_vertex_agreement(ov, rv, voxel=0.11, label=""):
    """Vertex-level agreement of the composed meshes.

    The two frameworks' f32 fields agree to ~1e-6; grid cells whose SDF value
    sits inside that band can flip sign, locally adding/removing marching-
    cubes cells (~1% of vertices on the noisy random-init field used here).
    So: >=95% of vertices must coincide to 1e-3, every vertex must have a
    counterpart within 1.5 voxels, and the counts must agree within 3%."""
    from scipy.spatial import cKDTree

    assert rv.shape[0] > 0 and ov.shape[0] > 0
    assert abs(rv.shape[0] - ov.shape[0]) <= max(0.03 * rv.shape[0], 4), (
        label, rv.shape, ov.shape)
    d_ro = cKDTree(ov).query(rv)[0]
    d_or = cKDTree(rv).query(ov)[0]
    for d in (d_ro, d_or):
        assert np.quantile(d, 0.95) < 1e-3, (label, np.quantile(d, 0.95))
        assert d.max() < 1.5 * voxel, (label, d.max())


def test_final_meshes_vertex_match(pipelines):
    """No-ICP leg: the composed grid->MC->largest-CC output on both hand and
    obj meshes."""
    run_reference, run_ours, ref_meshes, our_meshes = pipelines
    run_reference(eval_mode=False)
    run_ours(eval_mode=False)
    for part in ("hand", "obj"):
        rv, _ = _read_ply_verts(ref_meshes / f"m0_{part}.ply")
        ov, _ = _read_ply_verts(our_meshes / f"m0_{part}.ply")
        _assert_vertex_agreement(ov, rv, label=part)


def test_final_meshes_match_with_icp(pipelines):
    """ICP (eval_mode) leg: trans+scale ICP against the GT mesh composed on
    top; sampling streams aligned via the shared sampler stub."""
    run_reference, run_ours, ref_meshes, our_meshes = pipelines
    run_reference(eval_mode=True)
    run_ours(eval_mode=True)
    rv, _ = _read_ply_verts(ref_meshes / "m0_hand.ply")
    ov, _ = _read_ply_verts(our_meshes / "m0_hand.ply")
    _assert_vertex_agreement(ov, rv, label="hand-icp")
