"""MANO regression branch (flax linen) — image feature -> hand pose/shape.

Parity with reference networks/manobranch.py:25-155:
  * base MLP 512 -> 512 -> ReLU (base_neurons [512, 512, 512])
  * pose head -> ncomps+3 PCA coeffs; shape head -> 10 betas
  * optional AbsoluteBranch (scale/trans -> root depth via recover_3d_proj)
  * optional RotationBranch (axis-angle -> object rotation matrix)
  * differentiable MANO layer (alignsdf_tpu.mano.layer)

Returns the same result dict the reference builds (verts/joints in camera
frame, center3d, global_trans, rot_center, ...), as a plain dict of arrays.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from alignsdf_tpu.mano.layer import ManoModel, mano_forward
from alignsdf_tpu.models.layers import TorchLinear
from alignsdf_tpu.ops.geometry import recover_3d_proj
from alignsdf_tpu.ops.rotations import batch_rodrigues


class _MLPHead(nn.Module):
    """Linear(512->256) + ReLU + Linear(256->out): AbsoluteBranch /
    RotationBranch topology (reference networks/manobranch.py:25-55)."""

    out_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.relu(TorchLinear(256, name="hidden0")(x))
        return TorchLinear(self.out_dim, name="final")(x)


class ManoBranch(nn.Module):
    """Image feature (B, 512) -> MANO results dict."""

    mano_model: ManoModel
    ncomps: int = 15
    base_neurons: Tuple[int, ...] = (512, 512, 512)
    use_shape: bool = True
    use_pca: bool = True
    absolute_depth: bool = False
    object_pose: bool = False
    use_obj_rot: bool = False

    @nn.compact
    def __call__(
        self, inp: jax.Array, cond_input: Dict[str, jax.Array]
    ) -> Dict[str, Any]:
        # MANO constants live in the 'consts' collection so they are fed to the
        # compiled program as arguments, not baked in as literals (large inline
        # constants make axon-TPU compiles and dispatches pathologically slow).
        mano_model = self.variable(
            "consts", "mano_model", lambda: self.mano_model
        ).value
        x = inp
        for i, width in enumerate(self.base_neurons[1:]):
            x = nn.relu(TorchLinear(width, name=f"base{i}")(x))
        base_features = x

        pose_size = self.ncomps + 3 if self.use_pca else 16 * 9
        pose = TorchLinear(pose_size, name="pose_reg")(base_features)

        shape = (
            TorchLinear(10, name="shape_reg")(base_features) if self.use_shape else None
        )

        obj_rot = None
        if self.object_pose and self.use_obj_rot:
            rot_vec = _MLPHead(3, name="object_rot_branch")(inp)
            obj_rot = batch_rodrigues(rot_vec)

        mano_pose = pose.reshape(pose.shape[0], 16, 3, 3) if not self.use_pca else pose

        out = mano_forward(
            mano_model,
            mano_pose,
            betas=shape,
            use_pca=self.use_pca,
            center_idx=0,
            root_palm=False,
        )

        if self.absolute_depth:
            scaletrans = _MLPHead(3, name="trans_branch")(inp)
            trans = scaletrans[:, 1:]
            scale = scaletrans[:, 0:1]
            cam_joints, center3d = recover_3d_proj(
                out.joints, cond_input["cam_intr"], scale * 1e-4, trans * 100.0
            )
            cam_verts = center3d + out.verts
        else:
            center3d = cond_input["mano_root"].reshape(out.verts.shape[0], 1, 3)
            cam_joints = center3d + out.joints
            cam_verts = center3d + out.verts

        return {
            "verts": cam_verts,
            "joints": cam_joints,
            "shape": shape,
            "pcas": mano_pose,
            "pose": out.full_pose,
            "center3d": center3d,
            "global_trans": out.global_transforms,
            "rot_center": out.center,
            "obj_rot": obj_rot,
        }
