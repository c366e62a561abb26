"""Checkpoint save/restore (orbax) — reference train.py:105-130,406-420 parity.

Workspace layout mirrors the reference (reference utils/misc.py:118-135):
  <experiment>/ModelParameters/<name>/   — params + batch_stats
  <experiment>/OptimizerParameters/<name>/ — opt_state + epoch
``latest`` plus numbered snapshots; host 0 writes, all hosts read.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from alignsdf_tpu.training.train_state import TrainState


def _mgr(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(create=True, max_to_keep=None),
    )


def model_params_dir(experiment_dir: str) -> str:
    return os.path.join(experiment_dir, "ModelParameters")


def optimizer_params_dir(experiment_dir: str) -> str:
    return os.path.join(experiment_dir, "OptimizerParameters")


def save_checkpoint(experiment_dir: str, state: TrainState, epoch: int,
                    name: str = "latest") -> None:
    """Save params/stats and optimizer state under the reference layout."""
    if jax.process_index() != 0:
        return
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "epoch": int(epoch),
    }
    path = os.path.abspath(os.path.join(model_params_dir(experiment_dir), name))
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()


def checkpoint_exists(experiment_dir: str, name: str = "latest") -> bool:
    return os.path.isdir(os.path.join(model_params_dir(experiment_dir), name))


def restore_checkpoint(experiment_dir: str, state: TrainState,
                       name: str = "latest") -> Tuple[TrainState, int]:
    """Restore into the given (abstract or concrete) state; returns
    (state, saved_epoch)."""
    path = os.path.abspath(os.path.join(model_params_dir(experiment_dir), name))
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "epoch": 0,
    }
    restored = ckptr.restore(path, template)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    return new_state, int(restored["epoch"])
