"""Camera / pose geometry ops (JAX), numerically matched to the reference.

  - soft_argmax over a (64, H, W) heatmap volume: reference utils/utils.py:466-487
  - get_obj_trans (2.5-D center -> camera-frame 4x4): reference utils/utils.py:490-518
  - recover_3d_proj (weak-persp. root depth):        reference networks/manobranch.py:9-22
  - pixel_alignment (bicubic feature sampling):      reference utils/utils.py:536-558

All are batched, static-shape, jit-friendly.  The ``.cuda()``-pinned
``arange(64)`` in the reference soft-argmax is just an index ramp here.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def soft_argmax(heatmaps: jax.Array) -> jax.Array:
    """(B, D, H, W) heatmap volume -> (B, 1, 3) expected (x, y, z) in voxel units.

    Softmax over the flattened volume, then per-axis expectation
    (reference utils/utils.py:466-487; D = H = W = 64 in AlignSDF).
    """
    b, d, h, w = heatmaps.shape
    probs = jax.nn.softmax(heatmaps.reshape(b, 1, d * h * w), axis=2)
    probs = probs.reshape(b, 1, d, h, w)

    accu_x = probs.sum(axis=(2, 3)) * jnp.arange(w, dtype=heatmaps.dtype)[None, None]
    accu_y = probs.sum(axis=(2, 4)) * jnp.arange(h, dtype=heatmaps.dtype)[None, None]
    accu_z = probs.sum(axis=(3, 4)) * jnp.arange(d, dtype=heatmaps.dtype)[None, None]

    coord = jnp.stack(
        [accu_x.sum(axis=2), accu_y.sum(axis=2), accu_z.sum(axis=2)], axis=2
    )  # (B, 1, 3)
    return coord


def get_obj_trans(
    obj_center: jax.Array,
    center3d: jax.Array,
    cam_intr: jax.Array,
    obj_rot: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Back-project the soft-argmax object center to a hand-root-relative 4x4.

    Args:
      obj_center: (B, 1, 3) heatmap-space coords (x, y in 64-res pixels, z bin).
      center3d: (B, 1, 3) predicted/GT MANO root in camera frame.
      cam_intr: (B, 3, 3+) intrinsics.
      obj_rot: optional (B, 3, 3) predicted object rotation.

    Returns (obj_trans (B, 4, 4), cam_obj_center (B, 3)).
    Mirrors reference utils/utils.py:490-518: x/y upsampled x4 to image pixels,
    z mapped to root_z +/- 0.28 m.
    """
    batch = obj_center.shape[0]
    xy = obj_center[:, 0, :2] * 4.0
    z = (obj_center[:, 0, 2] / 64.0 * 2.0 - 1.0) * 0.28 + center3d[:, 0, 2]

    fx, fy = cam_intr[:, 0, 0], cam_intr[:, 1, 1]
    cx, cy = cam_intr[:, 0, 2], cam_intr[:, 1, 2]

    cam_x = (xy[:, 0] - cx) / fx * z
    cam_y = (xy[:, 1] - cy) / fy * z
    cam_obj_center = jnp.stack([cam_x, cam_y, z], axis=1)  # (B, 3)
    obj_t = cam_obj_center - center3d[:, 0, :]

    rot = obj_rot if obj_rot is not None else jnp.broadcast_to(
        jnp.eye(3, dtype=obj_t.dtype), (batch, 3, 3)
    )
    top = jnp.concatenate([rot, obj_t[:, :, None]], axis=2)  # (B, 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], obj_t.dtype), (batch, 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=1), cam_obj_center


def recover_3d_proj(
    objpoints3d: jax.Array,
    camintr: jax.Array,
    est_scale: jax.Array,
    est_trans: jax.Array,
    off_z: float = 0.4,
    input_res: tuple[int, int] = (256, 256),
) -> tuple[jax.Array, jax.Array]:
    """Weak-perspective scale/trans -> absolute camera-frame points
    (reference networks/manobranch.py:9-22)."""
    batch = objpoints3d.shape[0]
    focal = camintr[:, 0:1, 0]  # (B, 1)
    est_scale = est_scale.reshape(batch, 1)
    est_trans = est_trans.reshape(batch, 2)
    est_z0 = focal * est_scale + off_z
    cam_centers = camintr[:, :2, 2]
    img_centers = jnp.broadcast_to(
        jnp.array(input_res, camintr.dtype) / 2.0, (batch, 2)
    )
    est_xy0 = (est_trans + img_centers - cam_centers) * est_z0 / focal
    est_c3d = jnp.concatenate([est_xy0, est_z0], axis=-1)[:, None]  # (B, 1, 3)
    return est_c3d + objpoints3d, est_c3d


def _cubic_weights(t: jax.Array) -> tuple[jax.Array, ...]:
    """Keys cubic convolution weights with A=-0.75 (torch's bicubic kernel)."""
    a = -0.75
    # distances of the 4 taps (floor-1 .. floor+2) from the sample point
    s0 = 1.0 + t   # distance to tap -1  (in [1, 2])
    s1 = t         # distance to tap  0  (in [0, 1])
    s2 = 1.0 - t   # distance to tap +1
    s3 = 2.0 - t   # distance to tap +2

    def w_near(s):
        return ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0

    def w_far(s):
        return (((s - 5.0) * s + 8.0) * s - 4.0) * a

    return w_far(s0), w_near(s1), w_near(s2), w_far(s3)


def _keys_cubic_all(t: jax.Array) -> jax.Array:
    """Keys cubic kernel (A=-0.75, torch bicubic) at arbitrary tap distance;
    support (-2, 2).  Evaluating it for EVERY column index yields exactly the
    4 classic tap weights (same closed forms as _cubic_weights) with
    out-of-image taps contributing zero — padding_mode='zeros' for free."""
    a = -0.75
    s = jnp.abs(t)
    near = ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0
    far = (((s - 5.0) * s + 8.0) * s - 4.0) * a
    return jnp.where(s <= 1.0, near, jnp.where(s < 2.0, far, 0.0))


def grid_sample_bicubic(feat: jax.Array, uv: jax.Array) -> jax.Array:
    """Bicubic sampling of (B, C, H, W) features at (B, N, 2) normalized coords.

    Matches ``F.grid_sample(feat, grid, mode='bicubic', align_corners=True,
    padding_mode='zeros')`` as used by the reference (utils/utils.py:550):
    align_corners maps u=-1 -> col 0 and u=+1 -> col W-1; out-of-bounds taps
    contribute zero.

    TPU-first formulation: gathers are slow on TPU, so the sample is computed
    as a dense matmul — per point, a separable (H*W,) weight row built from
    the Keys cubic evaluated at every row/column distance (only the 4 taps
    per axis are nonzero), contracted against the flattened feature map on
    the MXU.  Chunked over the point axis to bound the weight tensor
    (~130 MB per chunk).  85 -> ~10 ms on the pixel-align train step at
    batch 64 x 2000 points (BASELINE.md).
    """
    b, c, h, w = feat.shape
    n = uv.shape[1]

    x = (uv[..., 0] + 1.0) * 0.5 * (w - 1)  # (B, N) pixel coords
    y = (uv[..., 1] + 1.0) * 0.5 * (h - 1)
    # NaN/inf coords (behind-camera projections) must not poison the weights;
    # callers mask these points out afterwards (pixel_alignment's in_img)
    x = jnp.where(jnp.isfinite(x), x, -10.0)
    y = jnp.where(jnp.isfinite(y), y, -10.0)

    feat_flat = feat.reshape(b, c, h * w).astype(jnp.float32)
    cx = jnp.arange(w, dtype=jnp.float32)
    cy = jnp.arange(h, dtype=jnp.float32)

    # chunk so the (B, chunk, H*W) weight tensor stays ~128 MB
    chunk = max(1, (1 << 25) // max(b * h * w, 1))
    chunk = min(chunk, n)
    n_pad = -(-n // chunk) * chunk
    xs = jnp.pad(x, ((0, 0), (0, n_pad - n)))
    ys = jnp.pad(y, ((0, 0), (0, n_pad - n)))
    xs = xs.reshape(b, n_pad // chunk, chunk).transpose(1, 0, 2)
    ys = ys.reshape(b, n_pad // chunk, chunk).transpose(1, 0, 2)

    # remat: without it the per-chunk (B, chunk, H*W) weight tensors are saved
    # as scan residuals for the einsum VJP, re-materializing the full
    # B*N*H*W bound this chunking exists to avoid; recomputing wxy from
    # (xc, yc) in backward is a handful of VPU ops
    @jax.checkpoint
    def one_chunk(args):
        xc, yc = args                                    # (B, chunk)
        kx = _keys_cubic_all(cx[None, None, :] - xc[..., None])  # (B, k, W)
        ky = _keys_cubic_all(cy[None, None, :] - yc[..., None])  # (B, k, H)
        wxy = (ky[:, :, :, None] * kx[:, :, None, :]).reshape(
            b, xc.shape[1], h * w)
        return jnp.einsum("bnq,bcq->bnc", wxy, feat_flat,
                          preferred_element_type=jnp.float32)

    out = jax.lax.map(one_chunk, (xs, ys))               # (n_chunks, B, k, C)
    out = out.transpose(1, 0, 2, 3).reshape(b, n_pad, c)[:, :n]
    return out.astype(feat.dtype)  # (B, N, C)


def pixel_alignment(
    img_feat: jax.Array,
    xyz: jax.Array,
    cam_intr: jax.Array,
    pred_root: jax.Array,
    image_size: int,
    scale_factor: float,
) -> jax.Array:
    """Project SDF query points into the image and bicubically sample per-point
    features; out-of-image points fall back to the global mean feature
    (reference utils/utils.py:536-558).

    Args:
      img_feat: (B, C, Hf, Wf) spatial feature map (HeadNet output).
      xyz: (B*N, 3) query points in the half-scaled SDF frame.
      cam_intr: (B, 3, 3+).
      pred_root: (B, 1, 3) predicted MANO root joint (camera frame).
    Returns (B*N, C) per-point features.
    """
    batch = img_feat.shape[0]
    xyz = xyz.reshape(batch, -1, 3)
    n = xyz.shape[1]
    xyz_cam = xyz * 2.0 / scale_factor + pred_root

    xy_hom = jnp.einsum("bij,bnj->bni", cam_intr[:, :3, :3], xyz_cam)
    xy_img = xy_hom[..., :2] / xy_hom[..., 2:3]
    uv = xy_img / image_size * 2.0 - 1.0  # (B, N, 2)

    sampled = grid_sample_bicubic(img_feat, uv)  # (B, N, C)

    in_img = (
        (uv[..., 0] >= -1.0)
        & (uv[..., 0] <= 1.0)
        & (uv[..., 1] >= -1.0)
        & (uv[..., 1] <= 1.0)
    )
    mean_feat = img_feat.mean(axis=(2, 3))  # (B, C)
    out = jnp.where(in_img[..., None], sampled, mean_feat[:, None, :])
    return out.reshape(batch * n, -1)
