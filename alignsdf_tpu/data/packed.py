"""ASDF-pack dataset backend: native (C++) record decode + sampling.

The production data path: one mmap'd pack file (tools/pack_dataset.py), all
per-sample hot work (filtering + split-half sampling) in
csrc/packed/packed_reader.cpp, Python only orchestrating augmentation and the
normalization chain (identical math to data.dataset.SDFDataset /
reference utils/data.py:110-206).
"""

from __future__ import annotations

import ctypes
from typing import List, Optional

import numpy as np

from alignsdf_tpu.config import Specs
from alignsdf_tpu.data.dataset import SDFDataset
from alignsdf_tpu.native import load_library


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
        f32p = ctypes.POINTER(ctypes.c_float)
        self._has_batch = hasattr(lib, "packed_build_batch")
        if self._has_batch:
            lib.packed_build_batch.restype = ctypes.c_int
            lib.packed_build_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_float,
                ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                f32p, f32p, f32p, f32p, f32p, f32p, f32p, f32p, f32p, f32p,
                ctypes.c_int,
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

    def build_batch(self, indices: np.ndarray, seeds: np.ndarray,
                    specs: Specs, deterministic: bool = False,
                    num_threads: int = 0):
        """Whole-batch native pipeline (augment + sample + normalize +
        to_train_batch layout) in one GIL-free call.  Returns the train-batch
        dict of data.dataset.to_train_batch with a uint8 image tensor."""
        if not self._has_batch:
            raise RuntimeError("libpacked_reader.so too old: rebuild csrc")
        batch = len(indices)
        n = specs.samples_per_scene
        size = specs.image_size[0]
        f32p = ctypes.POINTER(ctypes.c_float)

        idx = np.ascontiguousarray(indices, np.int64)
        sds = np.ascontiguousarray(seeds, np.uint64)
        images = np.empty((batch, size, size, 3), np.uint8)
        xyz = np.empty((batch * n, 3), np.float32)
        sdf_hand = np.empty((batch * n, 1), np.float32)
        sdf_obj = np.empty((batch * n, 1), np.float32)
        labels = np.empty(batch * n, np.float32)
        cam_intr = np.empty((batch, 3, 4), np.float32)
        mano_root = np.empty((batch, 3), np.float32)
        rest_corners = np.empty((batch, 8, 3), np.float32)
        joints = np.empty((batch, 21, 3), np.float32)
        obj_center = np.empty((batch, 3), np.float32)
        obj_corners = np.empty((batch, 8, 3), np.float32)

        def fp(a):
            return a.ctypes.data_as(f32p)

        rot_factor = 45.0 if "obman" in specs.dataset else 15.0
        rc = self._lib.packed_build_batch(
            self._h, batch,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            sds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            n, int(specs.hand_branch), int(specs.obj_branch),
            specs.clamping_distance or 0.0, specs.sdf_scale_factor,
            int(deterministic or specs.disable_aug),
            int(specs.occlusion_aug), size, rot_factor,
            int("obman" in specs.dataset),
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            fp(xyz), fp(sdf_hand), fp(sdf_obj), fp(labels), fp(cam_intr),
            fp(mano_root), fp(rest_corners), fp(joints), fp(obj_center),
            fp(obj_corners), num_threads,
        )
        if rc != 0:
            raise RuntimeError("packed_build_batch failed")
        return {
            "image": images,
            "xyz": xyz,
            "sdf_gt_hand": sdf_hand,
            "sdf_gt_obj": sdf_obj,
            "labels": labels.astype(np.int32),
            "cam_intr": cam_intr,
            "mano_root": mano_root,
            "rest_obj_corners": rest_corners,
            "hand_joints_3d": joints,
            "obj_center": obj_center,
            "obj_corners": obj_corners,
        }

    def close(self) -> None:
        if self._h:
            self._lib.packed_close(self._h)
            self._h = None


class PackedSDFDataset(SDFDataset):
    """SDFDataset over an ASDF-pack file (PackedBackend): identical sample
    math, native record decode + split-half sampling."""

    def __init__(self, specs: Specs, pack_path: str,
                 keys: Optional[List[str]] = None, deterministic: bool = False,
                 raw_image: bool = False):
        from alignsdf_tpu.data.backends import PackedBackend

        backend = PackedBackend(pack_path, specs.dataset)
        super().__init__(
            specs,
            keys if keys is not None else backend.keys(),
            deterministic=deterministic,
            backend=backend,
            raw_image=raw_image,
        )
        self.reader = backend.reader
