"""ASDF-pack dataset backend: native (C++) record decode + sampling.

The production data path: one mmap'd pack file (tools/pack_dataset.py), all
per-sample hot work (filtering + split-half sampling) in
csrc/packed/packed_reader.cpp, Python only orchestrating augmentation and the
normalization chain (identical math to data.dataset.SDFDataset /
reference utils/data.py:110-206).
"""

from __future__ import annotations

import ctypes
import os
import random
from typing import Dict, List, Optional

import numpy as np

from alignsdf_tpu.config import Specs
from alignsdf_tpu.data import img_utils as I
from alignsdf_tpu.native import load_library

_OBMAN_EXTR = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]], np.float32)


class PackReader:
    """ctypes wrapper over libpacked_reader."""

    def __init__(self, path: str):
        lib = load_library("packed_reader")
        if lib is None:
            raise RuntimeError(
                "libpacked_reader.so not built; run: cmake -S csrc -B csrc/build "
                "&& cmake --build csrc/build -j"
            )
        lib.packed_open.restype = ctypes.c_void_p
        lib.packed_open.argtypes = [ctypes.c_char_p]
        lib.packed_close.argtypes = [ctypes.c_void_p]
        lib.packed_count.restype = ctypes.c_int64
        lib.packed_count.argtypes = [ctypes.c_void_p]
        lib.packed_key.restype = ctypes.c_int64
        lib.packed_key.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_char_p, ctypes.c_int64]
        lib.packed_image_len.restype = ctypes.c_int64
        lib.packed_image_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.packed_image.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.POINTER(ctypes.c_uint8)]
        lib.packed_meta.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_float)]
        lib.packed_sample_sdf.restype = ctypes.c_int
        lib.packed_sample_sdf.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int64,
            ctypes.c_float, ctypes.c_int, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        self._lib = lib
        self._h = lib.packed_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open pack file {path}")

    def __len__(self) -> int:
        return self._lib.packed_count(self._h)

    def key(self, i: int) -> str:
        buf = ctypes.create_string_buffer(256)
        self._lib.packed_key(self._h, i, buf, 256)
        return buf.value.decode()

    def image(self, i: int) -> np.ndarray:
        n = self._lib.packed_image_len(self._h, i)
        out = np.empty(n, np.uint8)
        self._lib.packed_image(self._h, i,
                               out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        hw = int(round((n // 3) ** 0.5))  # square RGB images
        return out.reshape(hw, hw, 3)

    def meta(self, i: int):
        out = np.empty(4 + 61 * 3, np.float32)
        self._lib.packed_meta(self._h, i,
                              out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        scale = out[0]
        offset = out[1:4].copy()
        block = out[4:].reshape(61, 3)
        return scale, offset, block

    def sample_sdf(self, i: int, hand: bool, subsample: int, clamp: float,
                   filter_dist: bool, seed: int):
        samples = np.empty((subsample, 5), np.float32)
        labels = np.empty(subsample, np.float32)
        rc = self._lib.packed_sample_sdf(
            self._h, i, int(hand), subsample, clamp, int(filter_dist),
            seed & 0xFFFFFFFFFFFFFFFF,
            samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise RuntimeError(f"packed_sample_sdf failed for record {i}")
        return samples, labels

    def close(self) -> None:
        if self._h:
            self._lib.packed_close(self._h)
            self._h = None


class PackedSDFDataset:
    """Same sample math as data.dataset.SDFDataset over a pack file."""

    def __init__(self, specs: Specs, pack_path: str,
                 keys: Optional[List[str]] = None, deterministic: bool = False):
        self.specs = specs
        self.reader = PackReader(pack_path)
        self.deterministic = deterministic
        all_keys = [self.reader.key(i) for i in range(len(self.reader))]
        self.key_to_idx = {k: i for i, k in enumerate(all_keys)}
        self.keys = keys if keys is not None else all_keys

    def __len__(self) -> int:
        return len(self.keys)

    def __getitem__(self, idx: int, seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        specs = self.specs
        key = self.keys[idx]
        rec = self.key_to_idx[key]
        rng = random.Random(seed) if seed is not None else random
        np_rng = np.random.RandomState(seed) if seed is not None else np.random
        draw_seed = (np_rng.randint(0, 2 ** 31) if seed is not None
                     else np.random.randint(0, 2 ** 31))

        cam_extr = _OBMAN_EXTR if "obman" in specs.dataset else np.eye(3, dtype=np.float32)

        scale, offset, block = self.reader.meta(rec)
        joints = (cam_extr @ block[:21].T).T.astype(np.float32)
        obj_corners = (cam_extr @ block[21:30].T).T.astype(np.float32)
        rest_corners = (cam_extr @ block[30:39].T).T.astype(np.float32)
        cam_intr = np.zeros((3, 4), np.float32)
        if specs.dataset == "obman":
            cam_intr[:3, :3] = np.array([[480.0, 0, 128], [0, 480.0, 128], [0, 0, 1]], np.float32)
        else:
            cam_intr[:3, :3] = block[58:61]

        img = self.reader.image(rec)

        if self.deterministic or specs.disable_aug:
            rot, do_occlusion = 0.0, False
        else:
            _, rot, _, _, do_occlusion = I.get_aug_config(
                specs.dataset, enable_flip=False, rng=rng, np_rng=np_rng)
        rot_aug_mat = np.array(
            [[np.cos(np.deg2rad(-rot)), -np.sin(np.deg2rad(-rot)), 0],
             [np.sin(np.deg2rad(-rot)), np.cos(np.deg2rad(-rot)), 0],
             [0, 0, 1]], np.float32)

        image_size = specs.image_size
        crop_box = [(img.shape[1] - image_size[1]) // 2,
                    (img.shape[0] - image_size[0]) // 2,
                    image_size[1], image_size[0]]
        cam_intr[0, 2] = cam_intr[0, 2] / img.shape[1] * image_size[1]
        cam_intr[1, 2] = cam_intr[1, 2] / img.shape[0] * image_size[0]
        # occlusion off by default (reference utils/data.py:142 passes False)
        patch, _ = I.generate_patch_image(
            img, crop_box, image_size, False, 1.0, rot,
            do_occlusion and specs.occlusion_aug
            and not (self.deterministic or specs.disable_aug),
            rng=rng, np_rng=np_rng)
        encoder_input = I.normalize_image(patch)

        num_sample = (specs.samples_per_scene // 2
                      if specs.hand_branch and specs.obj_branch
                      else specs.samples_per_scene)

        if specs.hand_branch:
            hand_samples, hand_labels = self.reader.sample_sdf(
                rec, True, num_sample, specs.clamping_distance, True, draw_seed)
        else:
            hand_samples = np.zeros((num_sample, 5), np.float32)
            hand_labels = -np.ones(num_sample, np.float32)
        if specs.obj_branch:
            obj_samples, obj_labels = self.reader.sample_sdf(
                rec, False, num_sample, specs.clamping_distance, True, draw_seed + 1)
        else:
            obj_samples = np.zeros((num_sample, 5), np.float32)
            obj_labels = -np.ones(num_sample, np.float32)

        # normalization chain (reference utils/data.py:176-199)
        for samples in (hand_samples, obj_samples):
            samples[:, 0:3] = samples[:, 0:3] / scale - offset
            samples[:, 0:3] = (rot_aug_mat @ samples[:, 0:3].T).T
        joints[:, 0:3] = (rot_aug_mat @ joints[:, 0:3].T).T
        obj_corners[:, 0:3] = (rot_aug_mat @ obj_corners[:, 0:3].T).T

        mano_root = joints[0].copy()
        for arr in (hand_samples, obj_samples):
            arr[:, 0:3] = (arr[:, 0:3] - mano_root) * specs.sdf_scale_factor
            arr[:, 3:] = arr[:, 3:] / scale * specs.sdf_scale_factor
            arr[:, 0:5] /= 2.0

        return {
            "image": encoder_input,
            "pc_hand": hand_samples,
            "cls_hand": hand_labels,
            "pc_obj": obj_samples,
            "cls_obj": obj_labels,
            "hand_joints_3d": joints,
            "obj_corners": obj_corners[1:, :] - obj_corners[[0], :],
            "obj_center": obj_corners[0, :],
            "cam_intr": cam_intr,
            "mano_root": mano_root,
            "rest_obj_corners": rest_corners[1:, :],
            "key": key,
        }
