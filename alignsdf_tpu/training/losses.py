"""Training losses, formula-matched to the reference inner loop
(reference train.py:511-581).

All losses are computed from static-shape arrays and per-point masks (the
epoch-dependent masking from reference train.py:471-487 is expressed as mask
arrays built by the caller, so the jitted step stays shape-stable across the
AdditionalLossStart boundary).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from alignsdf_tpu.config import Specs


def clamped_l1_sdf(pred: jax.Array, target: jax.Array, mask: jax.Array,
                   clamp: float, weight: float) -> jax.Array:
    """weight * L1_sum(clamp(pred)*mask, clamp(target)*mask) / mask.sum()
    (reference train.py:513-534; both sides clamped to +/-clamp)."""
    pred = jnp.clip(pred, -clamp, clamp)
    target = jnp.clip(target, -clamp, clamp)
    return weight * jnp.sum(jnp.abs(pred * mask - target * mask)) / jnp.sum(mask)


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(pred - target))


def cross_entropy_ignore(logits: jax.Array, labels: jax.Array,
                         ignore_index: int = -1) -> jax.Array:
    """torch CrossEntropyLoss(ignore_index=-1) semantics: mean over non-ignored
    rows (reference train.py:395,554-558)."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / denom


def penetration_loss(scaled_hand: jax.Array, scaled_obj: jax.Array,
                     weight: float) -> jax.Array:
    """max(-(h+o), 0).mean() * w on metre-scale SDFs (reference train.py:570-571)."""
    return jnp.mean(jnp.maximum(-(scaled_hand + scaled_obj), 0.0)) * weight


def contact_loss(scaled_hand: jax.Array, scaled_obj: jax.Array,
                 sigma: float, weight: float) -> jax.Array:
    """min(alpha*(h^2+o^2), 1).mean() * w, alpha = 1/sigma^2
    (reference train.py:575-577)."""
    alpha = 1.0 / sigma ** 2
    return jnp.mean(jnp.minimum(alpha * (scaled_hand ** 2 + scaled_obj ** 2), 1.0)) * weight


def compute_losses(
    specs: Specs,
    outputs,
    batch: Dict[str, jax.Array],
    additional_active: jax.Array,
) -> Dict[str, jax.Array]:
    """Assemble the total training loss.

    Args:
      outputs: (sdf_hand, sdf_obj, pred_class, mano_results, obj_results)
        from AlignSDF.__call__.
      batch: dict with sdf_gt_hand / sdf_gt_obj (B*N, 1), labels (B*N,),
        mask_hand / mask_obj (B*N, 1), hand_joints_3d, obj_center, obj_corners.
      additional_active: scalar bool array — epoch >= AdditionalLossStart
        (drives classifier/penetration/contact gating, reference
        train.py:554-579; the sdf masks already encode their own gating).
    """
    sdf_hand, sdf_obj, pred_class, mano_results, obj_results = outputs
    clamp = specs.clamping_distance
    losses: Dict[str, jax.Array] = {}
    total = 0.0

    # flatten the per-point columns: (M, 1) arrays tile-pad to 128 lanes on
    # TPU (99% wasted VPU work per elementwise pass); 1-D arrays pack densely
    sdf_hand = sdf_hand.reshape(-1)
    sdf_obj = sdf_obj.reshape(-1)
    gt_hand = batch["sdf_gt_hand"].reshape(-1)
    gt_obj = batch["sdf_gt_obj"].reshape(-1)
    mask_hand = batch["mask_hand"].reshape(-1)
    mask_obj = batch["mask_obj"].reshape(-1)

    if specs.hand_branch:
        losses["hand_sdf"] = clamped_l1_sdf(
            sdf_hand, gt_hand, mask_hand, clamp,
            specs.hand_sdf_weight,
        )
        total = total + losses["hand_sdf"]
    if specs.obj_branch:
        losses["obj_sdf"] = clamped_l1_sdf(
            sdf_obj, gt_obj, mask_obj, clamp,
            specs.obj_sdf_weight,
        )
        total = total + losses["obj_sdf"]

    if specs.mano_branch:
        losses["joint"] = specs.joint_weight * mse(
            mano_results["joints"], batch["hand_joints_3d"]
        )
        losses["pose"] = specs.pose_reg_weight * mse(
            mano_results["pose"], jnp.zeros_like(mano_results["pose"])
        )
        losses["shape"] = specs.shape_reg_weight * mse(
            mano_results["shape"], jnp.zeros_like(mano_results["shape"])
        )
        total = total + losses["joint"] + losses["pose"] + losses["shape"]

    if specs.use_obj_pose:
        losses["obj_center"] = specs.obj_center_weight * mse(
            obj_results["obj_center"], batch["obj_center"]
        )
        losses["obj_corner"] = specs.obj_corner_weight * mse(
            obj_results["obj_corners"], batch["obj_corners"]
        )
        total = total + losses["obj_center"] + losses["obj_corner"]

    if specs.classifier_branch:
        ce = cross_entropy_ignore(pred_class, batch["labels"])
        losses["cls"] = ce * specs.classifier_weight * additional_active
        total = total + losses["cls"]

    if specs.penetration_loss or specs.contact_loss:
        # back to metre scale (reference train.py:562-568; pairs with the /2
        # in the data pipeline, reference utils/data.py:198-199)
        scaled_hand = sdf_hand * 2.0 / specs.sdf_scale_factor
        scaled_obj = sdf_obj * 2.0 / specs.sdf_scale_factor
        if specs.penetration_loss:
            losses["penetration"] = (
                penetration_loss(scaled_hand, scaled_obj, specs.penetration_loss_weight)
                * additional_active
            )
            total = total + losses["penetration"]
        if specs.contact_loss:
            losses["contact"] = (
                contact_loss(scaled_hand, scaled_obj, specs.contact_loss_sigma,
                             specs.contact_loss_weight)
                * additional_active
            )
            total = total + losses["contact"]

    losses["total"] = total
    return losses
