"""North-star parity: the sharded grid evaluator's SDF fields match the
reference's chunked decode path (reference utils/mesh.py:23-63 +
utils/utils.py:561-572) on the same converted weights."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alignsdf_tpu.config import specs_from_dict
from alignsdf_tpu.inference.grid import make_grid_evaluator
from alignsdf_tpu.models.alignsdf import build_model, full_variables
from alignsdf_tpu.models.torch_import import convert_alignsdf
from alignsdf_tpu.ops.decoder_kernel import make_pallas_decode_fn
from alignsdf_tpu.parallel.mesh import make_mesh

import oracle
from test_full_model import _specs_dict

torch = pytest.importorskip("torch")

N = 16  # tiny grid keeps the torch side fast; the math is N-independent


def _reference_grid(ref_model, specs_dict, latent_t, mano_results_t, obj_results_t):
    """Evaluate the reference decoder over the N^3 grid exactly like
    utils/mesh.py:27-63 (single pass)."""
    oracle.setup_reference()
    from utils.utils import kinematic_embedding, get_nerf_embedder

    overall = torch.arange(0, N ** 3, 1).long()
    samples = torch.zeros(N ** 3, 3)
    voxel = 2.0 / (N - 1)
    samples[:, 2] = overall % N
    samples[:, 1] = (overall // N) % N
    samples[:, 0] = ((overall // N) // N) % N
    samples = samples * voxel - 1.0

    pfs = specs_dict["PointFeatSize"]
    with torch.no_grad():
        pts = samples
        if pfs > 3:
            if specs_dict["EncodeStyle"] != "nerf" and mano_results_t is not None:
                pts = kinematic_embedding(
                    pts.clone(), mano_results_t, pts.shape[0], pfs,
                    specs_dict["SdfScaleFactor"], obj_results_t,
                    specs_dict["EncodeStyle"],
                )
            else:
                embed, _ = get_nerf_embedder((pfs - 3) // 6)
                pts = embed(pts)
        latent_rep = latent_t.expand(pts.shape[0], -1)
        inputs = torch.cat([latent_rep, pts], 1)
        sdf_h, sdf_o, _ = ref_model.decoder(inputs)
    return (
        sdf_h[:, 0].reshape(N, N, N).numpy(),
        sdf_o[:, 0].reshape(N, N, N).numpy(),
    )


@pytest.mark.parametrize("use_pallas", [False, True])
def test_grid_fields_match_reference(use_pallas):
    specs_dict = _specs_dict(
        ManoBranch=True, ObjectPoseBranch=True, EncodeStyle="both",
        PointFeatSize=9, SamplesPerScene=8,
    )
    torch.manual_seed(4)
    ref_model = oracle.reference_full_model(specs_dict)
    specs = specs_from_dict(specs_dict)
    model = build_model(specs)
    params, stats = convert_alignsdf(ref_model.state_dict(), specs, (2, 2, 2, 2))
    variables = full_variables(model, params, stats)

    # encode one image on both sides
    rng = np.random.RandomState(4)
    img = rng.rand(1, 256, 256, 3).astype(np.float32)
    cam = np.concatenate(
        [np.array([[480.0, 0, 128], [0, 480.0, 128], [0, 0, 1]], np.float32),
         np.zeros((3, 1), np.float32)], axis=1)[None]
    mano_root = np.array([[0, 0, 0.6]], np.float32)
    corners = (rng.randn(1, 8, 3) * 0.05).astype(np.float32)

    latent, mano_results, obj_results = model.apply(
        variables, jnp.asarray(img), jnp.asarray(cam), jnp.asarray(mano_root),
        jnp.asarray(corners), method=model.encode_scene)

    # reference side uses the converted-to-torch equivalents of the same
    # encode outputs (already golden-tested) to isolate the grid math
    mano_t = {
        "global_trans": torch.from_numpy(np.asarray(mano_results["global_trans"])),
        "rot_center": torch.from_numpy(np.asarray(mano_results["rot_center"])),
        "center3d": torch.from_numpy(np.asarray(mano_results["center3d"])),
    }
    obj_t = {"obj_trans": torch.from_numpy(np.asarray(obj_results["obj_trans"]))}
    latent_t = torch.from_numpy(np.asarray(latent))

    ref_h, ref_o = _reference_grid(ref_model, specs_dict, latent_t, mano_t, obj_t)

    if use_pallas:
        decode_fn = make_pallas_decode_fn(specs, block=128, interpret=True)
    else:
        def decode_fn(ctx, inputs):
            return model.apply({"params": ctx["params"]}, inputs,
                               method=model.decode_points)

    mesh = make_mesh(8)
    evaluate = make_grid_evaluator(decode_fn, specs, N, chunk=N ** 3 // 8,
                                   mesh=mesh, two_pass=False)
    ctx = {
        "params": params,
        "decoder_params": params["decoder"],
        "latent": latent,
        "rot_center": mano_results["rot_center"],
        "global_trans": mano_results["global_trans"],
        "obj_trans": obj_results["obj_trans"],
    }
    result = evaluate(ctx)
    np.testing.assert_allclose(np.asarray(result.sdf_hand), ref_h, atol=2e-5)
    np.testing.assert_allclose(np.asarray(result.sdf_obj), ref_o, atol=2e-5)


def test_pixel_align_grid_matches_reference():
    """PixelAlign grid reconstruction: per-point projection + bicubic latent
    sampling inside the sharded evaluator vs the reference mesh path
    (utils/mesh.py:47-55 -> utils/utils.py:561-572, which projects the
    embedded vector's first three columns)."""
    specs_dict = _specs_dict(
        ManoBranch=True, PixelAlign=True, ObjectPoseBranch=False,
        PointFeatSize=6, EncodeStyle="hand", SamplesPerScene=8,
    )
    torch.manual_seed(5)
    ref_model = oracle.reference_full_model(specs_dict)
    specs = specs_from_dict(specs_dict)
    model = build_model(specs)
    params, stats = convert_alignsdf(ref_model.state_dict(), specs, (2, 2, 2, 2))
    variables = full_variables(model, params, stats)

    rng = np.random.RandomState(5)
    img = rng.rand(1, 256, 256, 3).astype(np.float32)
    cam = np.concatenate(
        [np.array([[480.0, 0, 128], [0, 480.0, 128], [0, 0, 1]], np.float32),
         np.zeros((3, 1), np.float32)], axis=1)[None]
    mano_root = np.array([[0, 0, 0.6]], np.float32)
    corners = (rng.randn(1, 8, 3) * 0.05).astype(np.float32)

    latent, mano_results, _ = model.apply(
        variables, jnp.asarray(img), jnp.asarray(cam), jnp.asarray(mano_root),
        jnp.asarray(corners), method=model.encode_scene)
    assert latent.ndim == 4  # HeadNet spatial map (NHWC)

    # --- reference grid loop with the pixel-align decode
    oracle.setup_reference()
    from utils.utils import kinematic_embedding, pixel_alignment as ref_pa

    overall = torch.arange(0, N ** 3, 1).long()
    samples = torch.zeros(N ** 3, 3)
    voxel = 2.0 / (N - 1)
    samples[:, 2] = overall % N
    samples[:, 1] = (overall // N) % N
    samples[:, 0] = ((overall // N) // N) % N
    samples = samples * voxel - 1.0

    mano_t = {
        "global_trans": torch.from_numpy(np.asarray(mano_results["global_trans"])),
        "rot_center": torch.from_numpy(np.asarray(mano_results["rot_center"])),
        "joints": torch.from_numpy(np.asarray(mano_results["joints"])),
    }
    latent_t = torch.from_numpy(
        np.asarray(latent.transpose(0, 3, 1, 2)))  # NCHW
    cam_t = torch.from_numpy(cam.copy())
    factor = specs_dict["SdfScaleFactor"]
    with torch.no_grad():
        pts = kinematic_embedding(samples.clone(), mano_t, samples.shape[0],
                                  6, factor, None, "hand")
        lat = ref_pa(latent_t, pts[:, :3], cam_t, mano_t, 256, factor)
        sdf_h, sdf_o, _ = ref_model.decoder(torch.cat([lat, pts], 1))
    ref_h = sdf_h[:, 0].reshape(N, N, N).numpy()
    ref_o = sdf_o[:, 0].reshape(N, N, N).numpy()

    # --- our sharded evaluator
    def decode_fn(ctx, inputs):
        return model.apply({"params": ctx["params"]}, inputs,
                           method=model.decode_points)

    mesh = make_mesh(8)
    # reference-compat mode: reproduce the reference mesh path's
    # embedded-column projection bit-for-bit (its train/inference
    # inconsistency — inference/grid.py docstring)
    evaluate = make_grid_evaluator(decode_fn, specs, N, chunk=N ** 3 // 8,
                                   mesh=mesh, two_pass=False,
                                   pixel_ref_projection=True)
    ctx = {
        "params": params,
        "decoder_params": params["decoder"],
        "latent": jnp.asarray(latent.transpose(0, 3, 1, 2)),
        "cam_intr": jnp.asarray(cam),
        "pred_root": mano_results["joints"][:, 0:1],
        "rot_center": mano_results["rot_center"],
        "global_trans": mano_results["global_trans"],
    }
    result = evaluate(ctx)
    np.testing.assert_allclose(np.asarray(result.sdf_hand), ref_h, atol=5e-5)
    np.testing.assert_allclose(np.asarray(result.sdf_obj), ref_o, atol=5e-5)

    # --- fused pixel-align kernel (in-kernel projection + bicubic-as-matmul
    # latent sampling, ops/decoder_kernel.make_fused_pixel_grid_decode_fn)
    from alignsdf_tpu.ops.decoder_kernel import make_fused_pixel_grid_decode_fn

    gd = make_fused_pixel_grid_decode_fn(specs, N, block=128, interpret=True,
                                         ref_projection=True)
    assert gd is not None
    ev_fused = make_grid_evaluator(decode_fn, specs, N, chunk=N ** 3 // 8,
                                   mesh=mesh, two_pass=False,
                                   grid_decode_fn=gd,
                                   pixel_ref_projection=True)
    rf = ev_fused(ctx)
    np.testing.assert_allclose(np.asarray(rf.sdf_hand), ref_h, atol=5e-5)

    # --- DEFAULT (train-consistent) mode: raw-xyz projection, golden vs the
    # reference's own TRAIN-path math (utils/utils.py:536-549 applied to the
    # raw grid coords) on both the XLA path and the fused kernel
    with torch.no_grad():
        lat_raw = ref_pa(latent_t, samples.clone(), cam_t, mano_t, 256,
                         factor)
        sdf_h_raw, sdf_o_raw, _ = ref_model.decoder(
            torch.cat([lat_raw, pts], 1))
    raw_h = sdf_h_raw[:, 0].reshape(N, N, N).numpy()
    raw_o = sdf_o_raw[:, 0].reshape(N, N, N).numpy()
    # the shifted and raw projections must actually differ on this scene,
    # else the mode distinction above is vacuous
    assert np.abs(raw_h - ref_h).max() > 1e-3

    ev_raw = make_grid_evaluator(decode_fn, specs, N, chunk=N ** 3 // 8,
                                 mesh=mesh, two_pass=False)
    rr = ev_raw(ctx)
    np.testing.assert_allclose(np.asarray(rr.sdf_hand), raw_h, atol=5e-5)
    np.testing.assert_allclose(np.asarray(rr.sdf_obj), raw_o, atol=5e-5)

    gd_raw = make_fused_pixel_grid_decode_fn(specs, N, block=128,
                                             interpret=True)
    ev_fused_raw = make_grid_evaluator(decode_fn, specs, N,
                                       chunk=N ** 3 // 8, mesh=mesh,
                                       two_pass=False, grid_decode_fn=gd_raw)
    rfr = ev_fused_raw(ctx)
    np.testing.assert_allclose(np.asarray(rfr.sdf_hand), raw_h, atol=5e-5)
    np.testing.assert_allclose(np.asarray(rf.sdf_obj), ref_o, atol=5e-5)
