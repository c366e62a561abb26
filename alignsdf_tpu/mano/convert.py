"""MANO .pkl -> .npz asset conversion without chumpy.

The official MANO pickles store chumpy ``Ch`` objects, which normally require
the (unmaintained) ``chumpy`` package to unpickle.  The reference loads them
via a chumpy-based wrapper (reference: mano/webuser/smpl_handpca_wrapper_HAND_only.py:22-67).
Here we instead unpickle with a stub class hierarchy and extract the raw numpy
buffers directly, emitting a clean ``.npz`` with plain float32/int32 arrays —
the only thing the differentiable layer ever needs.

Keys written (shapes for MANO_RIGHT):
    v_template   (778, 3)    rest-pose vertices
    shapedirs    (778, 3, 10) shape blendshape basis
    posedirs     (778, 3, 135) pose blendshape basis
    J_regressor  (16, 778)   sparse matrix densified
    weights      (778, 16)   LBS skinning weights
    faces        (1538, 3)   int32 triangle list
    hands_components (45, 45) PCA pose basis
    hands_mean   (45,)       mean pose (axis-angle)
    hands_coeffs (N, 45)     PCA coefficients of the training mocap set
    kintree_table (2, 16)    parent/child joint ids
    betas        (10,)       default shape coefficients (zeros)
"""

from __future__ import annotations

import io
import pickle
from typing import Any, Dict

import numpy as np


class _ChStub:
    """Stand-in for chumpy.Ch: captures the pickled state dict."""

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        self.__dict__["_state"] = {}

    def __setstate__(self, state: Any) -> None:
        self.__dict__["_state"] = state

    def __setattr__(self, name: str, value: Any) -> None:
        self.__dict__.setdefault("_state", {})[name] = value


class _ChumpyUnpickler(pickle.Unpickler):
    def find_class(self, module: str, name: str) -> Any:
        if module.startswith("chumpy"):
            return _ChStub
        return super().find_class(module, name)


def _to_numpy(value: Any) -> Any:
    """Extract the underlying ndarray from a chumpy stub / sparse matrix.

    Handles plain ``Ch`` leaves (state key ``x``) and chumpy reordering nodes
    (state keys ``a`` + ``idxs`` + ``preferred_shape``), which is how the MANO
    pickles store ``shapedirs`` (a flat-index view selecting the first 10 of
    the 20 stored shape components).
    """
    if isinstance(value, _ChStub):
        state = value.__dict__.get("_state", {})
        if isinstance(state, dict):
            if "idxs" in state and "a" in state:
                base = np.asarray(_to_numpy(state["a"]))
                flat = base.ravel()[np.asarray(state["idxs"]).ravel()]
                shape = state.get("preferred_shape")
                return flat.reshape(shape) if shape else flat
            for key in ("x", "a", "_data"):
                if key in state:
                    return _to_numpy(state[key])
            for entry in state.values():
                if isinstance(entry, np.ndarray):
                    return entry
        raise ValueError(f"cannot extract array from chumpy stub state: {state!r}")
    if hasattr(value, "toarray"):  # scipy sparse
        return np.asarray(value.toarray())
    return value


def load_mano_pkl(path: str) -> Dict[str, np.ndarray]:
    """Load a MANO pickle into plain numpy arrays (no chumpy required)."""
    with open(path, "rb") as f:
        raw = _ChumpyUnpickler(io.BytesIO(f.read()), encoding="latin1").load()

    out: Dict[str, np.ndarray] = {}
    for key, value in raw.items():
        try:
            arr = _to_numpy(value)
        except ValueError:
            continue
        if isinstance(arr, np.ndarray):
            out[key] = arr
        else:
            out[key] = arr  # scalars / strings (e.g. bs_style)
    return out


def convert_mano_pkl(pkl_path: str, npz_path: str) -> Dict[str, np.ndarray]:
    """Convert a MANO pkl to the npz schema used by alignsdf_tpu.mano.layer."""
    raw = load_mano_pkl(pkl_path)

    data = {
        "v_template": np.asarray(raw["v_template"], np.float32),
        "shapedirs": np.asarray(raw["shapedirs"], np.float32),
        "posedirs": np.asarray(raw["posedirs"], np.float32),
        "J_regressor": np.asarray(_to_numpy(raw["J_regressor"]), np.float32),
        "weights": np.asarray(raw["weights"], np.float32),
        "faces": np.asarray(raw["f"], np.int32),
        "hands_components": np.asarray(raw["hands_components"], np.float32),
        "hands_mean": np.asarray(raw["hands_mean"], np.float32),
        "kintree_table": np.asarray(raw["kintree_table"], np.int64),
        "betas": np.zeros(int(np.asarray(raw["shapedirs"]).shape[-1]), np.float32),
    }
    if "hands_coeffs" in raw:
        data["hands_coeffs"] = np.asarray(raw["hands_coeffs"], np.float32)

    np.savez_compressed(npz_path, **data)
    return data


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("pkl", help="path to MANO_RIGHT.pkl / MANO_LEFT.pkl")
    parser.add_argument("npz", help="output npz path")
    args = parser.parse_args()
    data = convert_mano_pkl(args.pkl, args.npz)
    for key, value in sorted(data.items()):
        shape = getattr(value, "shape", None)
        print(f"{key}: {shape}")
