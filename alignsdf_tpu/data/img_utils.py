"""Image loading and augmentation (numpy/cv2) — reference utils/img_utils.py parity."""

from __future__ import annotations

import math
import random
from typing import List, Optional, Tuple

import cv2
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_img(path: str, order: str = "RGB") -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
    if not isinstance(img, np.ndarray):
        raise IOError(f"Fail to read {path}")
    if order == "RGB":
        img = img[:, :, ::-1].copy()
    return img.astype(np.uint8)


def normalize_image(img: np.ndarray) -> np.ndarray:
    """uint8 HWC -> float32 HWC normalized with ImageNet stats (reference
    utils/data.py:67-71 transform chain; NHWC kept for the TPU encoder)."""
    return (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def get_aug_config(dataset: str, enable_flip: bool = False,
                   rng: Optional[random.Random] = None,
                   np_rng: Optional[np.random.RandomState] = None):
    """Random augmentation parameters (reference utils/img_utils.py:106-130)."""
    rng = rng or random
    np_rng = np_rng or np.random
    if "obman" in dataset:
        scale_factor, rot_factor, color_factor = 0.25, 45, 0.3
        scale = np.clip(np_rng.randn(), -1.0, 1.0) * scale_factor + 1.0
    else:
        scale_factor, rot_factor, color_factor = 0.25, 15, 0.2
        scale = np.clip(np_rng.randn(), -1.0, 0.0) * scale_factor + 1.0
    rot = np.clip(np_rng.randn(), -2.0, 2.0) * rot_factor if rng.random() <= 0.6 else 0
    do_flip = bool(enable_flip and rng.random() <= 0.5)
    c_up, c_low = 1.0 + color_factor, 1.0 - color_factor
    color_scale = [rng.uniform(c_low, c_up) for _ in range(3)]
    do_occlusion = rng.random() <= 0.5
    return scale, rot, do_flip, color_scale, do_occlusion


def rotate_2d(pt: np.ndarray, rot_rad: float) -> np.ndarray:
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return np.array([pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs], np.float32)


def gen_trans_from_patch_cv(c_x, c_y, src_width, src_height, dst_width, dst_height,
                            scale, rot, inv=False) -> np.ndarray:
    """Affine patch transform (reference utils/img_utils.py:176-207)."""
    src_w = src_width * scale
    src_h = src_height * scale
    src_center = np.array([c_x, c_y], np.float32)
    rot_rad = np.pi * rot / 180
    src_downdir = rotate_2d(np.array([0, src_h * 0.5], np.float32), rot_rad)
    src_rightdir = rotate_2d(np.array([src_w * 0.5, 0], np.float32), rot_rad)

    dst_center = np.array([dst_width * 0.5, dst_height * 0.5], np.float32)
    dst_downdir = np.array([0, dst_height * 0.5], np.float32)
    dst_rightdir = np.array([dst_width * 0.5, 0], np.float32)

    src = np.stack([src_center, src_center + src_downdir, src_center + src_rightdir])
    dst = np.stack([dst_center, dst_center + dst_downdir, dst_center + dst_rightdir])

    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


def generate_patch_image(cvimg: np.ndarray, bbox: List[float], input_shape,
                         do_flip: bool, scale: float, rot: float,
                         do_occlusion: bool,
                         rng: Optional[random.Random] = None,
                         np_rng: Optional[np.random.RandomState] = None):
    """Crop/warp the image to the model input patch, with optional synthetic
    occlusion and horizontal flip (reference utils/img_utils.py:133-173)."""
    rng = rng or random
    np_rng = np_rng or np.random
    img = cvimg.copy()
    img_height, img_width, _ = img.shape

    if do_occlusion:
        while True:
            area = (rng.random() * 0.7) * bbox[2] * bbox[3]
            ratio = rng.random() * (1 / 0.3 - 0.3) + 0.3
            synth_h = math.sqrt(area * ratio)
            synth_w = math.sqrt(area / ratio)
            synth_xmin = rng.random() * (bbox[2] - synth_w - 1) + bbox[0]
            synth_ymin = rng.random() * (bbox[3] - synth_h - 1) + bbox[1]
            if (synth_xmin >= 0 and synth_ymin >= 0
                    and synth_xmin + synth_w < img_width
                    and synth_ymin + synth_h < img_height):
                xmin, ymin = int(synth_xmin), int(synth_ymin)
                w, h = int(synth_w), int(synth_h)
                img[ymin:ymin + h, xmin:xmin + w, :] = np_rng.rand(h, w, 3) * 255
                break

    bb_c_x = float(bbox[0] + 0.5 * bbox[2])
    bb_c_y = float(bbox[1] + 0.5 * bbox[3])

    if do_flip:
        img = img[:, ::-1, :]
        bb_c_x = img_width - bb_c_x - 1

    trans = gen_trans_from_patch_cv(
        bb_c_x, bb_c_y, float(bbox[2]), float(bbox[3]),
        input_shape[1], input_shape[0], scale, rot, inv=False,
    )
    patch = cv2.warpAffine(
        img, trans, (int(input_shape[1]), int(input_shape[0])), flags=cv2.INTER_LINEAR
    )
    return patch, trans


def decode_seg_maps(img: np.ndarray, task: str) -> np.ndarray:
    """Segmentation image -> (H, W, 2) [visible hand, full hand] float maps
    using the ObMan palette ids (reference utils/img_utils.py:30-48,63-77)."""
    seg = np.zeros((img.shape[0], img.shape[1], 2), np.float32)
    if "obman" in task:
        ch = img[:, :, 0]
        seg[:, :, 0][ch == 100] = 1
        for pid in (100, 22, 24, 20):
            seg[:, :, 1][ch == pid] = 1
    return seg


def load_seg(path: str, task: str) -> np.ndarray:
    """Load + decode a segmentation map from disk (reference utils/img_utils.py:63-77)."""
    img = cv2.imread(path, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
    if not isinstance(img, np.ndarray):
        raise IOError(f"Fail to read {path}")
    return decode_seg_maps(img, task)
