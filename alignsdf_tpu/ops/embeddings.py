"""Point embeddings: pose-aligned (kinematic) transforms and NeRF positional
encoding — the core AlignSDF idea of decoding SDFs in canonical frames.

Parity targets:
  - kinematic_embedding: reference utils/utils.py:376-430
  - NeRF PE (Embedder/get_nerf_embedder): reference utils/utils.py:433-463,521-533

TPU-first choices: the 4x4 inverses of the (rigid) MANO global transforms use
the closed-form [R^T | -R^T t] inverse instead of a generic LU solve, and the
per-point transform application is a single einsum over (B, N, 16, 4, 4) —
no reshape/transposedance, no dynamic shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from alignsdf_tpu.ops.rotations import rigid_inverse


def nerf_embed(xyz: jax.Array, num_freqs: int, include_input: bool = True) -> jax.Array:
    """NeRF positional encoding: (..., 3) -> (..., 3 + 6*num_freqs).

    Log-sampled frequency bands 2^0 .. 2^(num_freqs-1); per frequency the
    reference appends [sin(f*x), cos(f*x)] interleaved per band
    (reference utils/utils.py:438-463).  Output column order matches exactly:
    [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...].
    """
    parts = [xyz] if include_input else []
    for level in range(num_freqs):
        freq = 2.0 ** level
        parts.append(jnp.sin(xyz * freq))
        parts.append(jnp.cos(xyz * freq))
    return jnp.concatenate(parts, axis=-1)


def nerf_embed_for_point_feat(xyz: jax.Array, point_feat_size: int) -> jax.Array:
    """Reference convention: multires = (point_feat_size - 3) // 6
    (reference networks/model.py:408-409)."""
    return nerf_embed(xyz, (point_feat_size - 3) // 6)


def kinematic_embedding(
    xyz: jax.Array,
    num_points_per_scene: int,
    point_feat_size: int,
    scale_factor: float,
    encode_style: str,
    rot_center: Optional[jax.Array] = None,
    global_trans: Optional[jax.Array] = None,
    obj_trans: Optional[jax.Array] = None,
) -> jax.Array:
    """Transform SDF query points into hand- and/or object-canonical frames.

    Args:
      xyz: (B*N, 3) query points in the half-scaled wrist frame.
      encode_style: 'hand' | 'obj' | 'both'.
      rot_center: (B, 1, 3) MANO center joint (for 'hand'/'both').
      global_trans: (B, 16, 4, 4) MANO per-joint global transforms.
      obj_trans: (B, 4, 4) object transform (for 'obj'/'both').

    Point-feature layouts (reference utils/utils.py:399-428):
      hand, size 6:  [xyz, inv(global_trans[0]) @ xyz]
      hand, size 51: [xyz, inv(global_trans[j]) @ xyz for all 16 joints]
      obj,  size 6:  [xyz, inv(obj_trans) @ xyz]
      both, size 9:  [xyz, inv(global_trans[0]) @ xyz, inv(obj_trans) @ xyz]

    All canonical coordinates are mapped back to the half-scaled frame
    (x * scale_factor / 2), exactly like the reference.
    """
    xyz = xyz.reshape(-1, num_points_per_scene, 3)
    batch = xyz.shape[0]
    wrist_xyz = xyz * 2.0 / scale_factor  # undo the half-scale: metric wrist frame

    hand_embedding = None
    if encode_style in ("hand", "both"):
        assert rot_center is not None and global_trans is not None
        mano_xyz = wrist_xyz + rot_center  # (B, N, 3) in mano (pre-centering) frame
        inv_tf = rigid_inverse(global_trans)  # (B, 16, 4, 4)

        if (point_feat_size == 6 and encode_style == "hand") or (
            point_feat_size == 9 and encode_style == "both"
        ):
            inv_tf = inv_tf[:, :1]  # wrist transform only

        # p_canonical[b,n,j] = R_j^T (p - t_j): homogeneous w stays exactly 1,
        # so the reference's divide-by-w is a no-op we can skip.
        local = jnp.einsum("bjxy,bny->bnjx", inv_tf[..., :3, :3], mano_xyz) + inv_tf[
            :, None, :, :3, 3
        ]
        hand_embedding = jnp.concatenate(
            [mano_xyz[:, :, None, :], local], axis=2
        ).reshape(batch, num_points_per_scene, -1)
        hand_embedding = hand_embedding * (scale_factor / 2.0)

    obj_embedding = None
    if encode_style in ("obj", "both"):
        assert obj_trans is not None
        inv_obj = rigid_inverse(obj_trans)  # (B, 4, 4)
        local = jnp.einsum("bxy,bny->bnx", inv_obj[:, :3, :3], wrist_xyz) + inv_obj[
            :, None, :3, 3
        ]
        obj_embedding = local * (scale_factor / 2.0)  # (B, N, 3)

    if encode_style == "hand":
        out = hand_embedding
    elif encode_style == "obj":
        out = jnp.concatenate([xyz, obj_embedding], axis=2)
    else:  # both
        out = jnp.concatenate([hand_embedding, obj_embedding], axis=2)

    return out.reshape(-1, point_feat_size)
