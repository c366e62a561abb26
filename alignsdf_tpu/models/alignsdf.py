"""Top-level AlignSDF model: encoder + MANO branch + object pose + SDF decoder.

Parity with reference networks/model.py:353-414 (ModelOneEncoderOneDecoder).
One flax module so a single params pytree holds the whole system; the forward
is pure and fully jittable (all branch switches are Python-static config).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from alignsdf_tpu.config import Specs
from alignsdf_tpu.mano.layer import ManoModel, load_mano_model
from alignsdf_tpu.models.decoder import make_decoder
from alignsdf_tpu.models.manobranch import ManoBranch
from alignsdf_tpu.models.resnet import make_encoder
from alignsdf_tpu.ops.embeddings import kinematic_embedding, nerf_embed_for_point_feat
from alignsdf_tpu.ops.geometry import get_obj_trans, pixel_alignment, soft_argmax


_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_image_on_device(image: jax.Array) -> jax.Array:
    """uint8 NHWC -> ImageNet-normalized float32 (same math as
    data.img_utils.normalize_image / reference utils/data.py:67-71, fused into
    the device program so the host ships uint8).  Float inputs pass through
    (already normalized on host)."""
    if image.dtype != jnp.uint8:
        return image
    mean = jnp.asarray(_IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(_IMAGENET_STD, jnp.float32)
    return (image.astype(jnp.float32) / 255.0 - mean) / std


class AlignSDF(nn.Module):
    """The full single-image hand+object SDF reconstruction model."""

    specs: Specs
    mano_model: Optional[ManoModel] = None

    @property
    def _point_encoder(self) -> bool:
        return self.specs.backbone in ("pointnet", "resnet_pointnet")

    def setup(self):
        specs = self.specs
        dtype = jnp.dtype(specs.compute_dtype)
        self.encoder = make_encoder(
            specs.backbone,
            latent_size=specs.latent_size,
            mano_features=specs.mano_branch,
            use_headnet=specs.use_headnet,
            use_pixel_align=specs.pixel_align,
            remat=specs.remat,
            dtype=dtype,
        )
        if specs.mano_branch:
            assert self.mano_model is not None, "mano_branch needs a ManoModel"
            self.mano_decoder = ManoBranch(
                mano_model=self.mano_model,
                ncomps=specs.pose_feat_size,
                absolute_depth=specs.use_depth,
                object_pose=specs.use_obj_pose,
                use_obj_rot=specs.use_obj_rot,
            )
        self.decoder = make_decoder(
            specs.model_type,
            specs.latent_size,
            specs.point_feat_size,
            specs.encode_style,
            specs.network_specs,
            specs.classifier_branch,
            dtype=dtype,
        )
        if specs.use_obj_pose:
            # 1x1 conv: 256ch -> 64 depth-bins heatmap (reference networks/model.py:376-377)
            self.volume_layer = nn.Conv(
                64, (1, 1), use_bias=True, dtype=dtype, name="volume_layer"
            )

    def __call__(
        self,
        image: jax.Array,                      # (B, H, W, 3) normalized NHWC
        xyz: jax.Array,                        # (B*N, 3) half-scaled query points
        cond_input: Dict[str, jax.Array],      # cam_intr / mano_root / rest_obj_corners
        *,
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
    ):
        decoder_inputs, mano_results, obj_results = self.decoder_inputs(
            image, xyz, cond_input, train=train)
        sdf_hand, sdf_obj, pred_class = self.decoder(
            decoder_inputs, train=train, dropout_rng=dropout_rng
        )
        return sdf_hand, sdf_obj, pred_class, mano_results, obj_results

    def _scene_parts(
        self,
        image: jax.Array,
        xyz: jax.Array,
        cond_input: Dict[str, jax.Array],
        train: bool,
    ):
        """Shared front half of decoder_inputs / decoder_inputs_factored:
        encoder, MANO branch, object pose, point embedding.  Returns
        (sdf_feat, aux_feat, xyz_embed, mano_results, obj_results)."""
        specs = self.specs
        if self._point_encoder:
            # point-cloud backbones condition on the per-scene query cloud
            # itself (Occupancy-Networks-style self-conditioning)
            pts = xyz.reshape(image.shape[0], -1, 3)
            sdf_feat, mano_feat, aux_feat = self.encoder(pts, train=train)
        else:
            sdf_feat, mano_feat, aux_feat = self.encoder(
                normalize_image_on_device(image), train=train)

        mano_results = None
        if specs.mano_branch:
            mano_results = self.mano_decoder(mano_feat, cond_input)

        obj_results = None
        if specs.use_obj_pose and mano_results is not None:
            heatmaps = self.volume_layer(aux_feat)            # (B, 64, 64, 64) NHWC
            heatmaps = heatmaps.transpose(0, 3, 1, 2)          # -> NCHW depth-first
            obj_center_2d = soft_argmax(heatmaps.astype(jnp.float32))
            obj_trans, obj_center = get_obj_trans(
                obj_center_2d,
                mano_results["center3d"],
                cond_input["cam_intr"],
                mano_results["obj_rot"] if specs.use_obj_rot else None,
            )
            # transform rest-pose corners (reference networks/model.py:391-397)
            corners = cond_input["rest_obj_corners"]           # (B, 8, 3)
            obj_corners = (
                jnp.einsum("bij,bnj->bni", obj_trans[:, :3, :3], corners)
                + obj_trans[:, None, :3, 3]
            )
            if not train:
                obj_corners = obj_corners + mano_results["center3d"]
            obj_results = {
                "obj_center": obj_center,
                "obj_corners": obj_corners,
                "obj_trans": obj_trans,
            }

        if specs.point_feat_size > 3:
            if mano_results is not None and specs.encode_style != "nerf":
                xyz_embed = kinematic_embedding(
                    xyz,
                    xyz.shape[0] // image.shape[0],
                    specs.point_feat_size,
                    specs.sdf_scale_factor,
                    specs.encode_style,
                    rot_center=mano_results["rot_center"],
                    global_trans=mano_results["global_trans"],
                    obj_trans=obj_results["obj_trans"] if obj_results else None,
                )
            else:
                xyz_embed = nerf_embed_for_point_feat(xyz, specs.point_feat_size)
        else:
            xyz_embed = xyz
        return sdf_feat, aux_feat, xyz_embed, mano_results, obj_results

    def decoder_inputs(
        self,
        image: jax.Array,
        xyz: jax.Array,
        cond_input: Dict[str, jax.Array],
        *,
        train: bool = False,
    ):
        """Everything up to (but excluding) the SDF decoder: encoder, MANO,
        object pose, latent gather, point embedding.  Split out so the train
        step can swap the decoder for the fused Pallas forward+backward kernel
        (ops/decoder_train_kernel) while this part stays on XLA."""
        specs = self.specs
        sdf_feat, aux_feat, xyz_embed, mano_results, obj_results = (
            self._scene_parts(image, xyz, cond_input, train))
        if specs.pixel_align:
            latent = pixel_alignment(
                aux_feat.transpose(0, 3, 1, 2).astype(jnp.float32),  # NCHW
                xyz,
                cond_input["cam_intr"],
                mano_results["joints"][:, 0:1],
                specs.image_size[0],
                specs.sdf_scale_factor,
            )
        else:
            n = xyz.shape[0] // sdf_feat.shape[0]
            latent = jnp.repeat(sdf_feat, n, axis=0)
        decoder_inputs = jnp.concatenate([latent, xyz_embed], axis=1)
        return decoder_inputs, mano_results, obj_results

    def decoder_inputs_factored(
        self,
        image: jax.Array,
        xyz: jax.Array,
        cond_input: Dict[str, jax.Array],
        *,
        train: bool = False,
    ):
        """Like decoder_inputs but WITHOUT materializing per-point
        [latent, embed] rows: returns (sdf_feat (B, latent), xyz_embed
        (M, pfs), mano_results, obj_results).  Broadcast-latent configs only;
        the scene-factored train kernel (ops/decoder_train_kernel.
        make_fused_train_decoder_factored) folds the latent into per-scene
        biases instead."""
        if self.specs.pixel_align:
            raise ValueError("pixel_align latents are per-point; use "
                             "decoder_inputs")
        sdf_feat, _, xyz_embed, mano_results, obj_results = (
            self._scene_parts(image, xyz, cond_input, train))
        return sdf_feat, xyz_embed, mano_results, obj_results

    def decoder_inputs_pixel(
        self,
        image: jax.Array,
        xyz: jax.Array,
        cond_input: Dict[str, jax.Array],
        *,
        train: bool = False,
    ):
        """Like decoder_inputs for pixel-aligned configs but WITHOUT running
        the bicubic sampling: returns (aux_feat (B, Hf, Wf, C) NHWC, xyz_embed
        (M, pfs), mano_results, obj_results).  The fused pixel train kernel
        (ops/decoder_train_pixel.make_fused_train_decoder_pixel) samples the
        feature map in-kernel instead of materializing per-point latents."""
        if not self.specs.pixel_align:
            raise ValueError("decoder_inputs_pixel is for pixel_align configs")
        _, aux_feat, xyz_embed, mano_results, obj_results = (
            self._scene_parts(image, xyz, cond_input, train))
        return aux_feat, xyz_embed, mano_results, obj_results

    def encode_scene(self, image, cam_intr, mano_root, rest_obj_corners,
                     points=None):
        """Image -> (latent, mano_results, obj_results) for grid reconstruction
        (reference utils/utils.py:575-625 decode_model_output, minus file IO).
        Point-cloud backbones condition on ``points`` (B, T, 3) instead of the
        image."""
        specs = self.specs
        if self._point_encoder:
            if points is None:
                raise ValueError(
                    "pointnet backbones need an observed point cloud "
                    "(sample['points']) to encode the scene")
            sdf_feat, mano_feat, aux_feat = self.encoder(points, train=False)
        else:
            sdf_feat, mano_feat, aux_feat = self.encoder(
                normalize_image_on_device(image), train=False)

        cond_input = {"cam_intr": cam_intr, "mano_root": mano_root,
                      "rest_obj_corners": rest_obj_corners}
        mano_results = None
        if specs.mano_branch:
            mano_results = self.mano_decoder(mano_feat, cond_input)

        obj_results = None
        if specs.use_obj_pose and mano_results is not None:
            heatmaps = self.volume_layer(aux_feat).transpose(0, 3, 1, 2)
            obj_center_2d = soft_argmax(heatmaps.astype(jnp.float32))
            obj_trans, obj_center = get_obj_trans(
                obj_center_2d, mano_results["center3d"], cond_input["cam_intr"],
                mano_results["obj_rot"] if specs.use_obj_rot else None,
            )
            corners = cond_input["rest_obj_corners"]
            obj_corners = (
                jnp.einsum("bij,bnj->bni", obj_trans[:, :3, :3], corners)
                + obj_trans[:, None, :3, 3]
            ) + mano_results["center3d"]
            obj_results = {"obj_center": obj_center, "obj_corners": obj_corners,
                           "obj_trans": obj_trans}

        latent = aux_feat if specs.pixel_align else sdf_feat
        # grid reconstruction consumes f32 latents regardless of compute dtype
        return latent.astype(jnp.float32), mano_results, obj_results

    def decode_points(self, decoder_inputs, *, train: bool = False,
                      dropout_rng=None):
        """Run only the SDF decoder on pre-assembled [latent, embed] rows."""
        return self.decoder(decoder_inputs, train=train, dropout_rng=dropout_rng)


def build_model(specs: Specs) -> AlignSDF:
    mano_model = load_mano_model(side="right", ncomps=specs.pose_feat_size) if specs.mano_branch else None
    return AlignSDF(specs=specs, mano_model=mano_model)


def model_consts(model: AlignSDF) -> dict:
    """The 'consts' variable collection for a model built by build_model —
    lets converted-checkpoint loads skip a full init() (the collection layout
    mirrors the module tree)."""
    if model.mano_model is None:
        return {}
    return {"mano_decoder": {"mano_model": model.mano_model}}


def full_variables(model: AlignSDF, params, batch_stats) -> dict:
    variables = {"params": params, "batch_stats": batch_stats}
    consts = model_consts(model)
    if consts:
        variables["consts"] = consts
    return variables
