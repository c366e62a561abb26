"""Pluggable record backends for the train dataset.

One sample-math implementation (data.dataset.SDFDataset) over three storage
formats, mirroring the reference's lmdb/per-file switch
(reference utils/data.py:62-101,118-129):

  * NpzBackend    — reference per-file layout (rgb/ norm/ meta/ sdf_hand/
                    sdf_obj/ dirs of jpg/npz/pkl),
  * LmdbBackend   — the reference's five-LMDB format
                    (reference tools/create_lmdb.py:21-310),
  * PackedBackend — this framework's single mmap'd ASDF-pack file with the
                    per-sample hot path (filter + split-half sampling) in
                    native code (csrc/packed/packed_reader.cpp).

Each backend returns raw reference-frame records; augmentation and the
normalization chain live in the dataset.  ``sample_sdf`` returns rows in the
global column convention [xyz, sdf_hand, sdf_obj] with hand-part labels.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from alignsdf_tpu.data import img_utils as I
from alignsdf_tpu.data import sdf_samples as S


class NpzBackend:
    """Reference per-file npz/pkl/jpg layout (reference utils/data.py:93-101)."""

    def __init__(self, data_source: str, dataset: str, image_source: str = "rgb"):
        self.data_source = data_source
        self.dataset = dataset
        self.image_source = os.path.join(data_source, image_source)

    def keys(self) -> Optional[List[str]]:
        return None  # keys come from the split file

    def normal_params(self, key: str) -> Tuple[np.ndarray, np.ndarray]:
        return S.unpack_normal_params(self.data_source, key)

    def meta_params(self, key: str) -> Dict[str, np.ndarray]:
        return S.unpack_meta_params(self.data_source, key, self.dataset)

    def image(self, key: str) -> np.ndarray:
        return I.load_img(os.path.join(self.image_source, key + ".jpg"))

    def sample_sdf(self, key: str, hand: bool, subsample: int,
                   clamp: Optional[float], filter_dist: bool,
                   rng: np.random.Generator,
                   uniforms=None) -> Tuple[np.ndarray, np.ndarray]:
        return S.unpack_sdf_samples(
            self.data_source, key, subsample, hand=hand, clamp=clamp,
            filter_dist=filter_dist, rng=rng, uniforms=uniforms,
        )


class LmdbBackend:
    """Reference LMDB format (reference utils/data.py:62-91,118-129)."""

    def __init__(self, data_source: str, dataset: str,
                 hand_branch: bool = True, obj_branch: bool = True):
        from alignsdf_tpu.data.lmdb_backend import LmdbStore

        self.store = LmdbStore(data_source, hand_branch, obj_branch)
        self.dataset = dataset

    def keys(self) -> Optional[List[str]]:
        meta = self.store.hand_meta or self.store.obj_meta
        return list(meta["keys"]) if meta else None

    def normal_params(self, key: str) -> Tuple[np.ndarray, np.ndarray]:
        return self.store.normal_params(key)

    def meta_params(self, key: str) -> Dict[str, np.ndarray]:
        return S.meta_from_block(self.store.meta(key), self.dataset)

    def image(self, key: str) -> np.ndarray:
        return self.store.image(key)  # raw square RGB, shape inferred

    def sample_sdf(self, key: str, hand: bool, subsample: int,
                   clamp: Optional[float], filter_dist: bool,
                   rng: np.random.Generator,
                   uniforms=None) -> Tuple[np.ndarray, np.ndarray]:
        from alignsdf_tpu.data.lmdb_backend import unpack_sdf_samples_lmdb

        return unpack_sdf_samples_lmdb(
            self.store, key, hand, subsample, clamp, filter_dist, rng=rng,
            uniforms=uniforms,
        )


class PackedBackend:
    """ASDF-pack file with native record decode + sampling."""

    def __init__(self, pack_path: str, dataset: str):
        from alignsdf_tpu.data.packed import PackReader

        self.reader = PackReader(pack_path)
        self.dataset = dataset
        self._all_keys = [self.reader.key(i) for i in range(len(self.reader))]
        self._key_to_idx = {k: i for i, k in enumerate(self._all_keys)}

    def keys(self) -> List[str]:
        return list(self._all_keys)

    def _meta(self, key: str):
        return self.reader.meta(self._key_to_idx[key])

    def normal_params(self, key: str) -> Tuple[np.ndarray, np.ndarray]:
        scale, offset, _ = self._meta(key)
        return np.asarray([scale], np.float32), offset

    def meta_params(self, key: str) -> Dict[str, np.ndarray]:
        _, _, block = self._meta(key)
        return S.meta_from_block(block, self.dataset)

    def image(self, key: str) -> np.ndarray:
        return self.reader.image(self._key_to_idx[key])

    def sample_sdf(self, key: str, hand: bool, subsample: int,
                   clamp: Optional[float], filter_dist: bool,
                   rng: np.random.Generator,
                   uniforms=None) -> Tuple[np.ndarray, np.ndarray]:
        # the native sampler draws its own uniforms from a 64-bit seed
        seed = int(rng.integers(0, 2 ** 63 - 1))
        return self.reader.sample_sdf(
            self._key_to_idx[key], hand, subsample, clamp or 0.0,
            filter_dist, seed,
        )

    def build_batch(self, keys: List[str], seeds, specs,
                    deterministic: bool = False):
        """Native whole-batch fast path (packed_build_batch); returns None
        when a feature the native pipeline lacks is requested, so the caller
        falls back to the per-item python path."""
        if not getattr(self.reader, "_has_batch", False):
            return None
        if specs.occlusion_aug and not (deterministic or specs.disable_aug):
            return None  # synthetic occlusion lives only in the python path
        recs = np.asarray([self._key_to_idx[k] for k in keys], np.int64)
        seed_arr = np.asarray(
            [s if s is not None else np.random.randint(0, 2 ** 62)
             for s in seeds], np.uint64)
        return self.reader.build_batch(recs, seed_arr, specs, deterministic)


def make_backend(specs, data_root: Optional[str] = None,
                 pack_path: Optional[str] = None):
    """Select the storage backend like the reference selects lmdb per spec
    (reference utils/data.py:118-129): an explicit pack file wins, then
    ``specs.lmdb``, then the per-file npz layout."""
    data_source = data_root or os.path.join(
        specs.data_source, specs.dataset, "train")
    if pack_path:
        return PackedBackend(pack_path, specs.dataset)
    if specs.lmdb:
        return LmdbBackend(
            data_source, specs.dataset,
            hand_branch=specs.hand_branch, obj_branch=specs.obj_branch,
        )
    return NpzBackend(data_source, specs.dataset, specs.image_source)
