"""Experiment-workspace path conventions — reference utils/misc.py:8-139 and
deep_sdf/workspace.py:8-169 equivalents."""

from __future__ import annotations

import os

MODEL_PARAMS_SUBDIR = "ModelParameters"
OPTIMIZER_PARAMS_SUBDIR = "OptimizerParameters"
RECONSTRUCTIONS_SUBDIR = "Reconstructions"
SPECS_FILENAME = "specs.json"
LOGS_FILENAME = "Logs.pth"


def _get(experiment_dir: str, sub: str, create: bool) -> str:
    path = os.path.join(experiment_dir, sub)
    if create:
        os.makedirs(path, exist_ok=True)
    return path


def get_model_params_dir(experiment_dir: str, create: bool = False) -> str:
    return _get(experiment_dir, MODEL_PARAMS_SUBDIR, create)


def get_optimizer_params_dir(experiment_dir: str, create: bool = False) -> str:
    return _get(experiment_dir, OPTIMIZER_PARAMS_SUBDIR, create)


def get_eval_dir(experiment_dir: str, task: str, create: bool = False) -> str:
    return _get(experiment_dir, f"Eval_{task}", create)


def get_mesh_dir(experiment_dir: str, task: str, create: bool = False) -> str:
    return _get(os.path.join(experiment_dir, f"Eval_{task}"), "meshes", create)


def is_checkpoint_exist(experiment_dir: str, name: str) -> bool:
    return os.path.isdir(os.path.join(experiment_dir, MODEL_PARAMS_SUBDIR, name))


def specs_path(experiment_dir: str) -> str:
    return os.path.join(experiment_dir, SPECS_FILENAME)
