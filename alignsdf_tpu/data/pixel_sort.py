"""Host-side point ordering for the banded pixel-align train kernel.

The fused pixel TRAIN kernel can contract only a band of feature-map rows per
block (ops/decoder_train_pixel, ``band``/``presorted``) — but that needs each
kernel block's points to be row-coherent.  Sorting on DEVICE costs more than
the banding saves (TPU gathers on narrow rows, BASELINE.md r5), so the order
is fixed HERE, on the host, inside the loader workers where it overlaps the
device step.

Ordering contract (consumed by ``make_fused_train_decoder_pixel(band=...,
presorted=True)``):

* each scene's points are sorted ascending by the point's approximate
  projected feature row — the WHOLE scene, not per half: kernel blocks then
  cover narrow row quantiles (a 400-point block of a 2000-point scene spans
  ~20% of the scene's row distribution; per-half sorting would double that
  and overflow the band);
* points projecting outside the image go to the END of the scene (they
  carry zero bicubic taps, so they never constrain a block's band);
* every per-point column (xyz, sdf targets, labels) is permuted
  identically, and the [hand-half | obj-half] positional layout is replaced
  by an explicit ``point_is_hand`` (B*N,) f32 column that
  training/train_step.build_batch_masks consumes instead of the positional
  masks (reference train.py:467-487) — all losses are sums over
  identically-permuted per-point arrays, so nothing else changes.

The row key uses the GROUND-TRUTH mano root (the predicted root is not known
host-side); the kernel recomputes exact per-block bounds from the actual
predicted projection at runtime and falls back to the full contraction when
a block's true span exceeds the band — a stale approximation here can only
cost speed, never correctness.  Reference projection: utils/utils.py:536-549.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def pixel_row_order(xyz: np.ndarray, cam_intr: np.ndarray, root: np.ndarray,
                    image_size: float, sdf_scale_factor: float,
                    feat_rows: int = 64) -> np.ndarray:
    """Whole-scene ordering of one scene's points by approximate feature row.

    xyz (N, 3) decoder-frame points, cam_intr (3, 3+), root (3,).  Returns
    perm (N,) int such that xyz[perm] is ascending in projected row with
    out-of-image points last.
    """
    cam = np.asarray(cam_intr, np.float32)[:3, :3]
    xyz_cam = xyz.astype(np.float32) * (2.0 / sdf_scale_factor) + \
        np.asarray(root, np.float32).reshape(1, 3)
    hom = xyz_cam @ cam.T
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = hom[:, 0] / hom[:, 2]
        yi = hom[:, 1] / hom[:, 2]
    # sort with a BOUNDARY MARGIN: the runtime projection (predicted root,
    # TPU one-pass-bf16 matmul) classifies near-boundary points slightly
    # differently than this host approximation; a point exiled to the
    # out-of-image tail here but in-image at runtime would sit at an
    # arbitrary row inside a tail block and blow its band.  Points within
    # the margin sort by their CLAMPED row instead (harmless if they turn
    # out out-of-image: zero taps)
    eps = 4.0
    sortable = ((xi >= -eps) & (xi <= image_size + eps) & (yi >= -eps)
                & (yi <= image_size + eps)
                & np.isfinite(xi) & np.isfinite(yi))
    yp = np.clip(yi * ((feat_rows - 1) / image_size), 0.0, feat_rows - 1.0)
    key = np.where(sortable, yp, np.float32(1e9))
    return np.argsort(key, kind="stable")


def pixel_row_sort_batch(batch: Dict[str, np.ndarray], image_size: float,
                         sdf_scale_factor: float,
                         feat_rows: int = 64) -> Dict[str, np.ndarray]:
    """Reorder a stacked train batch's per-point arrays per scene.

    batch: the final train batch (xyz (B*N, 3), sdf_gt_hand/sdf_gt_obj
    (B*N, 1), labels (B*N,), cam_intr (B, 3, 3+), mano_root (B, 3), ...).
    Returns a new dict with the per-point arrays permuted per scene and a
    ``point_is_hand`` (B*N,) f32 column recording which points came from
    the hand half; all other keys pass through untouched.
    """
    xyz = np.asarray(batch["xyz"])
    b = np.asarray(batch["cam_intr"]).shape[0]
    m = xyz.shape[0]
    n = m // b
    half = n // 2
    perm = np.empty((m,), np.int64)
    cam = np.asarray(batch["cam_intr"])
    root = np.asarray(batch["mano_root"])
    for s in range(b):
        p = pixel_row_order(xyz[s * n:(s + 1) * n], cam[s], root[s],
                            image_size, sdf_scale_factor, feat_rows)
        perm[s * n:(s + 1) * n] = s * n + p

    is_hand = np.tile(
        np.concatenate([np.ones(half, np.float32),
                        np.zeros(n - half, np.float32)]), b)
    out = dict(batch)
    for key in ("xyz", "sdf_gt_hand", "sdf_gt_obj", "labels"):
        if key in out:
            arr = np.asarray(out[key])
            if arr.shape[:1] == (m,):
                out[key] = arr[perm]
    out["point_is_hand"] = is_hand[perm]
    return out
