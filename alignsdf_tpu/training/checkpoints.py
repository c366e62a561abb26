"""Checkpoint save/restore (orbax) — reference train.py:105-130,406-420 parity.

Workspace layout mirrors the reference exactly (reference utils/misc.py:118-135):
  <experiment>/ModelParameters/<name>/      — params + batch_stats + epoch
  <experiment>/OptimizerParameters/<name>/  — opt_state + epoch
``latest`` plus numbered snapshots; host 0 writes, all hosts read.

Saves are crash-safe: each payload is written to a sibling tmp directory and
swapped in via rename (the previous checkpoint is only deleted after the new
one is fully in place — unlike an rmtree-then-save, a crash mid-save never
destroys the only resume point).

``warm_start`` implements the spec ``Resume`` external-checkpoint load
(reference train.py:406-409, ``strict=False``): parameters are merged by tree
path, keeping the initialized value for anything missing or shape-mismatched.
"""

from __future__ import annotations

import logging
import os
import shutil
from typing import Any, Dict, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from alignsdf_tpu.training.train_state import TrainState

logger = logging.getLogger(__name__)

MODEL_PARAMS_SUBDIR = "ModelParameters"
OPTIMIZER_PARAMS_SUBDIR = "OptimizerParameters"


def model_params_dir(experiment_dir: str) -> str:
    return os.path.join(experiment_dir, MODEL_PARAMS_SUBDIR)


def optimizer_params_dir(experiment_dir: str) -> str:
    return os.path.join(experiment_dir, OPTIMIZER_PARAMS_SUBDIR)


def _barrier(tag: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def _atomic_save(path: str, payload: Dict[str, Any]) -> None:
    """Write payload to ``path`` via tmp-dir + rename swap.

    Multi-process: every process must enter (orbax's save is collective —
    it runs its own cross-process barriers); the filesystem swap happens on
    process 0 only, fenced so other processes never observe a half-swapped
    checkpoint.
    """
    path = os.path.abspath(path)
    tmp = path + ".tmp"
    old = path + ".old"
    if jax.process_index() == 0:
        for stale in (tmp, old):
            if os.path.exists(stale):
                shutil.rmtree(stale)
    _barrier(f"ckpt_clean:{path}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(tmp, payload)
    ckptr.wait_until_finished()
    _barrier(f"ckpt_written:{path}")
    if jax.process_index() == 0:
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old)
    _barrier(f"ckpt_swapped:{path}")


def save_checkpoint(experiment_dir: str, state: TrainState, epoch: int,
                    name: str = "latest") -> None:
    """Save model and optimizer payloads under the reference's two-directory
    layout (reference train.py:105-130).  Call from every process."""
    _atomic_save(
        os.path.join(model_params_dir(experiment_dir), name),
        {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "epoch": int(epoch),
        },
    )
    _atomic_save(
        os.path.join(optimizer_params_dir(experiment_dir), name),
        {
            "opt_state": jax.device_get(state.opt_state),
            "epoch": int(epoch),
        },
    )


def checkpoint_exists(experiment_dir: str, name: str = "latest") -> bool:
    return os.path.isdir(os.path.join(model_params_dir(experiment_dir), name))


def restore_checkpoint(experiment_dir: str, state: TrainState,
                       name: str = "latest") -> Tuple[TrainState, int]:
    """Restore into the given state; returns (state, saved_epoch).  A missing
    optimizer payload restores model weights only (with a warning), like
    warm-starting from a weights-only snapshot."""
    ckptr = ocp.StandardCheckpointer()
    model_path = os.path.abspath(
        os.path.join(model_params_dir(experiment_dir), name))
    restored = ckptr.restore(model_path, {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "epoch": 0,
    })
    new_state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])

    opt_path = os.path.abspath(
        os.path.join(optimizer_params_dir(experiment_dir), name))
    if os.path.isdir(opt_path):
        opt = ckptr.restore(opt_path, {
            "opt_state": jax.device_get(state.opt_state),
            "epoch": 0,
        })
        new_state = new_state.replace(opt_state=opt["opt_state"])
    else:
        logger.warning("no optimizer payload at %s; keeping fresh optimizer",
                       opt_path)
    return new_state, int(restored["epoch"])


def _merge_by_path(dst, src, stats: Dict[str, int], prefix: str = ""):
    """Recursively copy src leaves into dst where path + shape match."""
    if isinstance(dst, dict):
        out = {}
        for key, val in dst.items():
            if isinstance(src, dict) and key in src:
                out[key] = _merge_by_path(val, src[key], stats,
                                          f"{prefix}/{key}")
            else:
                stats["missing"] += 1
                out[key] = val
        return out
    src_arr = np.asarray(src)
    dst_arr = np.asarray(dst)
    if src_arr.shape == dst_arr.shape:
        stats["loaded"] += 1
        return src_arr.astype(dst_arr.dtype)
    logger.warning("warm start: shape mismatch at %s (%s vs %s), keeping init",
                   prefix, src_arr.shape, dst_arr.shape)
    stats["mismatched"] += 1
    return dst


def warm_start(state: TrainState, resume_path: str) -> TrainState:
    """Spec ``Resume`` warm start (reference train.py:406-409): load an
    external checkpoint non-strictly — merge params/batch_stats by tree path,
    leave the optimizer fresh.  ``resume_path`` may be an experiment dir, a
    ModelParameters/<name> payload dir, or a ModelParameters parent."""
    path = os.path.abspath(resume_path)
    if os.path.isdir(os.path.join(path, MODEL_PARAMS_SUBDIR, "latest")):
        path = os.path.join(path, MODEL_PARAMS_SUBDIR, "latest")
    elif os.path.isdir(os.path.join(path, "latest")):
        path = os.path.join(path, "latest")

    # restore with a permissive handler: read whatever tree is stored
    restored = ocp.StandardCheckpointer().restore(path)
    stats = {"loaded": 0, "missing": 0, "mismatched": 0}
    params = _merge_by_path(jax.device_get(state.params),
                            restored.get("params", {}), stats)
    batch_stats = _merge_by_path(jax.device_get(state.batch_stats),
                                 restored.get("batch_stats", {}), stats)
    logger.info("warm start from %s: %d leaves loaded, %d missing, "
                "%d shape-mismatched", path, stats["loaded"],
                stats["missing"], stats["mismatched"])
    return state.replace(params=params, batch_stats=batch_stats)
