"""Data subsystem: datasets, storage backends, loader.

``make_train_dataset`` is the single entry the drivers use — it selects the
storage backend the way the reference selects lmdb per spec
(reference utils/data.py:118-129, train.py:425-444).
"""

from __future__ import annotations

from typing import List, Optional


def make_train_dataset(specs, split_keys: Optional[List[str]] = None,
                       data_root: Optional[str] = None,
                       pack_path: Optional[str] = None,
                       deterministic: bool = False,
                       raw_image: bool = False):
    """Build the train dataset over the spec-selected backend.

    Priority: explicit ``pack_path`` (ASDF-pack, native decode) >
    ``specs.lmdb`` (the reference's five-LMDB format) > per-file npz layout.
    ``split_keys`` defaults to every key the backend knows (LMDB/pack only).
    """
    from alignsdf_tpu.data.backends import make_backend
    from alignsdf_tpu.data.dataset import SDFDataset

    backend = make_backend(specs, data_root=data_root, pack_path=pack_path)
    keys = split_keys if split_keys is not None else backend.keys()
    if keys is None:
        raise ValueError("split_keys required for the npz backend")
    return SDFDataset(specs, keys, deterministic=deterministic,
                      backend=backend, raw_image=raw_image)
