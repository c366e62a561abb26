"""Differentiable MANO hand layer, TPU-native (pure function over a pytree).

Functionally equivalent to the reference layer (reference
manopth/manolayer.py:109-271) but redesigned for XLA:

  * model constants live in a ``ManoModel`` NamedTuple (a pytree) loaded once
    from the converted ``.npz`` asset — no torch buffers, no chumpy;
  * the 3-level kinematic chain is evaluated as three batched (B, 5, 4, 4)
    matmuls, never a per-joint Python loop over fingers;
  * LBS is one einsum; everything traces to a handful of MXU contractions;
  * static output shapes: verts (B, 778, 3), joints (B, 21, 3),
    full_pose (B, 45), global_transforms (B, 16, 4, 4), center (B, 1, 3).

Numeric conventions copied exactly (order of blend-shape application,
fingertip vertex ids, 21-joint reorder, centering at ``center_idx``).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from alignsdf_tpu.ops.rotations import (
    batch_rodrigues,
    posemap_axisang,
    project_rotations,
    rot6d_to_matrix,
    robust_rot6d_to_matrix,
    with_zeros,
)

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")

# Finger chain joint ids per articulation level (reference manopth/manolayer.py:196-198)
_LEV1 = np.array([1, 4, 7, 10, 13])
_LEV2 = np.array([2, 5, 8, 11, 14])
_LEV3 = np.array([3, 6, 9, 12, 15])
# root+lev1+lev2+lev3 concat order -> MANO joint order (reference :227)
_REORDER16 = np.array([0, 1, 6, 11, 2, 7, 12, 3, 8, 13, 4, 9, 14, 5, 10, 15])
# 16 joints + 5 fingertips -> 21-joint visualization order (reference :259)
_REORDER21 = np.array([0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20])
_TIPS_RIGHT = np.array([745, 317, 444, 556, 673])  # reference :250
_TIPS_LEFT = np.array([745, 317, 445, 556, 673])  # reference :252


class ManoModel(NamedTuple):
    """Constant MANO tensors (float32) — a pytree usable under jit."""

    v_template: jax.Array       # (778, 3)
    shapedirs: jax.Array        # (778, 3, 10)
    posedirs: jax.Array         # (778, 3, 135)
    joint_regressor: jax.Array  # (16, 778)
    weights: jax.Array          # (778, 16)
    hands_components: jax.Array # (45, 45) PCA basis
    hands_mean: jax.Array       # (45,)
    betas_default: jax.Array    # (10,)
    tips_idx: jax.Array         # (5,) fingertip vertex ids
    faces: np.ndarray           # (1538, 3) int32 — static metadata


class ManoOutput(NamedTuple):
    verts: jax.Array             # (B, 778, 3)
    joints: jax.Array            # (B, 21, 3)
    full_pose: jax.Array         # (B, 45) axis-angle articulation
    global_transforms: jax.Array # (B, 16, 4, 4) per-joint global rigid transforms
    center: jax.Array            # (B, 1, 3) the subtracted center joint (zeros if not centered)


def load_mano_model(
    side: str = "right",
    ncomps: int = 15,
    flat_hand_mean: bool = False,
    asset_dir: Optional[str] = None,
) -> ManoModel:
    """Load the converted npz asset into a ``ManoModel``.

    ``ncomps`` selects the leading PCA components (reference
    manopth/manolayer.py:96-98); ``flat_hand_mean=False`` adds the dataset
    mean pose (reference :89-92). AlignSDF uses ncomps=15, flat_hand_mean=False
    (reference networks/manobranch.py:103-110).
    """
    path = os.path.join(
        asset_dir or _ASSET_DIR, "MANO_RIGHT.npz" if side == "right" else "MANO_LEFT.npz"
    )
    raw = np.load(path)
    hands_mean = (
        np.zeros_like(raw["hands_mean"]) if flat_hand_mean else raw["hands_mean"]
    ).astype(np.float32)
    # host numpy leaves (NOT device arrays): the model pytree gets closed
    # into TrainState.consts, and jitted steps with buffer donation would
    # consume shared device buffers — numpy leaves are copied per dispatch
    return ManoModel(
        v_template=np.asarray(raw["v_template"], np.float32),
        shapedirs=np.asarray(raw["shapedirs"], np.float32),
        posedirs=np.asarray(raw["posedirs"], np.float32),
        joint_regressor=np.asarray(raw["J_regressor"], np.float32),
        weights=np.asarray(raw["weights"], np.float32),
        hands_components=np.asarray(raw["hands_components"][:ncomps], np.float32),
        hands_mean=np.asarray(hands_mean, np.float32),
        betas_default=np.asarray(raw["betas"][:10], np.float32),
        tips_idx=np.asarray(_TIPS_RIGHT if side == "right" else _TIPS_LEFT),
        faces=np.asarray(raw["faces"], np.int32),
    )


def mano_forward(
    model: ManoModel,
    pose_coeffs: jax.Array,
    betas: Optional[jax.Array] = None,
    trans: Optional[jax.Array] = None,
    *,
    use_pca: bool = True,
    center_idx: Optional[int] = 0,
    root_palm: bool = False,
    joint_rot_mode: str = "axisang",
    root_rot_mode: str = "axisang",
    robust_rot: bool = False,
) -> ManoOutput:
    """MANO kinematics + LBS skinning.

    Args:
      pose_coeffs: (B, 3+ncomps) [global axis-angle | PCA coeffs] when
        ``use_pca`` (reference manopth/manolayer.py:128-142); (B, 48) full
        axis-angle when ``not use_pca`` and axisang mode; (B, 16, 3, 3)
        rotation matrices in rotmat mode (reference :156-167);
        (B, 6+ncomps) when ``root_rot_mode == 'rot6d'``.
      betas: (B, 10) shape coefficients, or None for the model default.
      trans: optional (B, 3) translation; when given, centering is skipped
        (reference :261-269).
    """
    batch = pose_coeffs.shape[0]
    rot_dim = 3 if root_rot_mode == "axisang" else 6

    if use_pca or joint_rot_mode == "axisang":
        if use_pca:
            hand_coeffs = pose_coeffs[:, rot_dim:]
            full_hand_pose = hand_coeffs @ model.hands_components
        else:
            full_hand_pose = pose_coeffs[:, rot_dim:]
        # NOTE: the mean pose drives the kinematics but is NOT included in the
        # returned articulation pose (reference manopth/manolayer.py:139-142,271).
        articulation = model.hands_mean[None] + full_hand_pose  # (B, 45)

        if root_rot_mode == "axisang":
            full_pose = jnp.concatenate([pose_coeffs[:, :3], articulation], axis=1)
            pose_map, rot_map = posemap_axisang(full_pose)
            root_rot = rot_map[:, :9].reshape(batch, 3, 3)
            rot_map = rot_map[:, 9:]
            pose_map = pose_map[:, 9:]
        else:
            pose_map, rot_map = posemap_axisang(articulation)
            root6d = pose_coeffs[:, :6]
            root_rot = (
                robust_rot6d_to_matrix(root6d) if robust_rot else rot6d_to_matrix(root6d)
            )
    else:
        pose_rots = project_rotations(pose_coeffs)  # (B, 16, 3, 3)
        rot_map = pose_rots[:, 1:].reshape(batch, -1)
        eye = jnp.tile(jnp.eye(3, dtype=rot_map.dtype).reshape(1, 9), (batch, 15))
        pose_map = rot_map - eye
        root_rot = pose_rots[:, 0]
        full_hand_pose = rot_map  # flattened rotmats in this mode

    if betas is None:
        betas_b = jnp.broadcast_to(model.betas_default[None], (batch, 10))
    else:
        betas_b = betas

    # Shape blendshapes + joint regression (reference manopth/manolayer.py:170-183)
    v_shaped = (
        jnp.einsum("vcs,bs->bvc", model.shapedirs, betas_b) + model.v_template[None]
    )
    joints16 = jnp.einsum("jv,bvc->bjc", model.joint_regressor, v_shaped)

    # Pose blendshapes (reference :186-187)
    v_posed = v_shaped + jnp.einsum("vcp,bp->bvc", model.posedirs, pose_map)

    # --- Kinematic chain: root + 3 articulation levels x 5 fingers (ref :190-229)
    root_j = joints16[:, 0:1]  # (B, 1, 3)
    root_tf = with_zeros(
        jnp.concatenate([root_rot, root_j.reshape(batch, 3, 1)], axis=2)
    )  # (B, 4, 4)

    all_rots = rot_map.reshape(batch, 15, 3, 3)
    lev1_rots = all_rots[:, _LEV1 - 1]
    lev2_rots = all_rots[:, _LEV2 - 1]
    lev3_rots = all_rots[:, _LEV3 - 1]
    lev1_j, lev2_j, lev3_j = joints16[:, _LEV1], joints16[:, _LEV2], joints16[:, _LEV3]

    def _rel(rots: jax.Array, offs: jax.Array) -> jax.Array:
        return with_zeros(jnp.concatenate([rots, offs[..., None]], axis=-1))

    lev1_tf = root_tf[:, None] @ _rel(lev1_rots, lev1_j - root_j)  # (B, 5, 4, 4)
    lev2_tf = lev1_tf @ _rel(lev2_rots, lev2_j - lev1_j)
    lev3_tf = lev2_tf @ _rel(lev3_rots, lev3_j - lev2_j)

    results = jnp.concatenate(
        [root_tf[:, None], lev1_tf, lev2_tf, lev3_tf], axis=1
    )[:, _REORDER16]  # (B, 16, 4, 4)

    # --- LBS (reference :231-245): subtract transformed rest joint, blend, skin.
    joint_offsets = results[:, :, :3, :3] @ joints16[..., None]  # (B, 16, 3, 1)
    rel_results = results.at[:, :, :3, 3].add(-joint_offsets[..., 0])
    # Per-vertex blended transforms: T[b,v] = sum_j w[v,j] * rel_results[b,j]
    blended = jnp.einsum("vj,bjxy->bvxy", model.weights, rel_results)  # (B, 778, 4, 4)
    v_homo = jnp.concatenate(
        [v_posed, jnp.ones((batch, v_posed.shape[1], 1), v_posed.dtype)], axis=2
    )
    verts = jnp.einsum("bvxy,bvy->bvx", blended, v_homo)[..., :3]

    jtr = results[:, :, :3, 3]  # (B, 16, 3)
    tips = verts[:, model.tips_idx]  # (B, 5, 3)
    if root_palm:
        palm = (verts[:, 95] + verts[:, 22])[:, None] / 2
        jtr = jnp.concatenate([palm, jtr[:, 1:]], axis=1)
    jtr = jnp.concatenate([jtr, tips], axis=1)[:, _REORDER21]  # (B, 21, 3)

    center = jnp.zeros((batch, 1, 3), verts.dtype)
    if trans is not None:
        jtr = jtr + trans[:, None]
        verts = verts + trans[:, None]
    elif center_idx is not None:
        center = jtr[:, center_idx][:, None]
        jtr = jtr - center
        verts = verts - center

    return ManoOutput(
        verts=verts,
        joints=jtr,
        full_pose=full_hand_pose,
        global_transforms=results,
        center=center,
    )


mano_forward_jit = partial(jax.jit, static_argnames=(
    "use_pca", "center_idx", "root_palm", "joint_rot_mode", "root_rot_mode", "robust_rot",
))(mano_forward)
