"""Loss parity: our compute_losses on the converted model vs the reference's
inline loss block (reference train.py:511-581) evaluated with torch on the
same weights and batch."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alignsdf_tpu.config import specs_from_dict
from alignsdf_tpu.models.alignsdf import build_model, full_variables
from alignsdf_tpu.models.torch_import import convert_alignsdf
from alignsdf_tpu.training.losses import compute_losses
from alignsdf_tpu.training.train_step import build_batch_masks

import oracle
from test_full_model import _specs_dict

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("epoch", [1, 2000])
def test_losses_match_reference_formulas(epoch):
    specs_dict = _specs_dict(
        ManoBranch=True, ObjectPoseBranch=True, EncodeStyle="both",
        PointFeatSize=9, PenetrationLoss=True, ContactLoss=True,
        SamplesPerScene=16, AdditionalLossStart=1201,
    )
    torch.manual_seed(0)
    ref_model = oracle.reference_full_model(specs_dict)
    specs = specs_from_dict(specs_dict)

    batch_size, n = 2, 16
    rng = np.random.RandomState(0)
    img = rng.rand(batch_size, 256, 256, 3).astype(np.float32)
    # per-scene [hand-half | obj-half] layout (reference train.py:468)
    xyz = (rng.randn(batch_size * n, 3) * 0.5).astype(np.float32)
    sdf_gt_hand = (rng.randn(batch_size * n, 1) * 0.03).astype(np.float32)
    sdf_gt_obj = (rng.randn(batch_size * n, 1) * 0.03).astype(np.float32)
    cam = np.tile(np.concatenate(
        [np.array([[480.0, 0, 128], [0, 480.0, 128], [0, 0, 1]], np.float32),
         np.zeros((3, 1), np.float32)], axis=1)[None], (batch_size, 1, 1))
    mano_root = (rng.randn(batch_size, 3) * 0.05 + np.array([0, 0, 0.6])).astype(np.float32)
    rest_corners = (rng.randn(batch_size, 8, 3) * 0.05).astype(np.float32)
    joints_gt = (rng.randn(batch_size, 21, 3) * 0.05 + np.array([0, 0, 0.6])).astype(np.float32)
    obj_center_gt = (rng.rand(batch_size, 3) * 64).astype(np.float32)
    obj_corners_gt = (rng.randn(batch_size, 8, 3) * 0.05).astype(np.float32)

    # ---- reference side (torch, train mode semantics but eval-mode modules
    # to avoid dropout randomness)
    with torch.no_grad():
        ref_model.train(False)
        # .training=False changes obj_corners (+center3d); match by comparing
        # against our train=False call, and gate losses manually below.
        t_hand, t_obj, _, t_mano, t_objres = ref_model(
            torch.from_numpy(img.transpose(0, 3, 1, 2).copy()),
            torch.from_numpy(xyz.copy()),
            {"cam_intr": torch.from_numpy(cam.copy()),
             "mano_root": torch.from_numpy(mano_root.copy()),
             "rest_obj_corners": torch.from_numpy(rest_corners.copy()),
             "epoch": epoch},
        )
        minT, maxT = -0.05, 0.05
        sg_h = torch.clamp(torch.from_numpy(sdf_gt_hand), minT, maxT)
        sg_o = torch.clamp(torch.from_numpy(sdf_gt_obj), minT, maxT)
        p_h = torch.clamp(t_hand, minT, maxT)
        p_o = torch.clamp(t_obj, minT, maxT)

        half = n // 2
        if epoch < specs.additional_loss_start:
            per_scene_h = torch.cat([torch.ones(batch_size, half),
                                     torch.zeros(batch_size, n - half)], 1)
            per_scene_o = 1 - per_scene_h
            mask_h = per_scene_h.reshape(-1, 1)
            mask_o = per_scene_o.reshape(-1, 1)
        else:
            mask_h = torch.ones(batch_size * n, 1)
            mask_o = torch.ones(batch_size * n, 1)

        l1 = torch.nn.L1Loss(reduction="sum")
        l2 = torch.nn.MSELoss()
        sf = specs.sdf_scale_factor
        ref = {
            "hand_sdf": float(specs.hand_sdf_weight * l1(p_h * mask_h, sg_h * mask_h) / mask_h.sum()),
            "obj_sdf": float(specs.obj_sdf_weight * l1(p_o * mask_o, sg_o * mask_o) / mask_o.sum()),
            "joint": float(specs.joint_weight * l2(t_mano["joints"], torch.from_numpy(joints_gt))),
            "pose": float(specs.pose_reg_weight * l2(t_mano["pose"], torch.zeros_like(t_mano["pose"]))),
            "shape": float(specs.shape_reg_weight * l2(t_mano["shape"], torch.zeros_like(t_mano["shape"]))),
            "obj_center": float(specs.obj_center_weight * l2(t_objres["obj_center"], torch.from_numpy(obj_center_gt))),
            "obj_corner": float(specs.obj_corner_weight * l2(t_objres["obj_corners"], torch.from_numpy(obj_corners_gt))),
        }
        scaled_h = p_h * 2.0 / sf
        scaled_o = p_o * 2.0 / sf
        if epoch >= specs.additional_loss_start:
            ref["penetration"] = float(torch.clamp(-(scaled_h + scaled_o), min=0).mean()
                                       * specs.penetration_loss_weight)
            alpha = 1.0 / specs.contact_loss_sigma ** 2
            ref["contact"] = float(torch.clamp(alpha * (scaled_h ** 2 + scaled_o ** 2), max=1).mean()
                                   * specs.contact_loss_weight)
        else:
            ref["penetration"] = 0.0
            ref["contact"] = 0.0

    # ---- our side
    model = build_model(specs)
    params, stats = convert_alignsdf(ref_model.state_dict(), specs, (2, 2, 2, 2))
    variables = full_variables(model, params, stats)
    outputs = model.apply(
        variables, jnp.asarray(img), jnp.asarray(xyz),
        {"cam_intr": jnp.asarray(cam), "mano_root": jnp.asarray(mano_root),
         "rest_obj_corners": jnp.asarray(rest_corners)},
        train=False,
    )
    # our clamp happens inside compute_losses; the reference clamps pred
    # before the pen/contact rescale too (train.py:519-523,562-568)
    additional_active = jnp.asarray(float(epoch >= specs.additional_loss_start))
    mask_hand, mask_obj = build_batch_masks(specs, batch_size, additional_active)
    sdf_hand, sdf_obj, pred_class, mano_results, obj_results = outputs
    clamped = (jnp.clip(sdf_hand, -0.05, 0.05), jnp.clip(sdf_obj, -0.05, 0.05),
               pred_class, mano_results, obj_results)
    batch = {
        "sdf_gt_hand": jnp.asarray(sdf_gt_hand),
        "sdf_gt_obj": jnp.asarray(sdf_gt_obj),
        "labels": jnp.zeros(batch_size * n, jnp.int32),
        "mask_hand": mask_hand,
        "mask_obj": mask_obj,
        "hand_joints_3d": jnp.asarray(joints_gt),
        "obj_center": jnp.asarray(obj_center_gt),
        "obj_corners": jnp.asarray(obj_corners_gt),
    }
    ours = compute_losses(specs, clamped, batch, additional_active)

    for key, ref_val in ref.items():
        got = float(ours[key]) if key in ours else 0.0
        np.testing.assert_allclose(got, ref_val, rtol=1e-4, atol=1e-7, err_msg=key)
