"""Training metrics sink: JSONL (always) + TensorBoard (when available).

Reproduces the reference's observability surface (reference
train.py:400-402,600-623,632-633): per-loss scalars scaled x1000 every
``LogFrequencyStep`` steps and the learning rate once per epoch, written by
host 0 under ``<experiment>/log``.  The JSONL stream next to it is this
framework's machine-readable primary record (one object per logged step).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

# Reference scalar-tag names (reference train.py:600-623).
_TAG_MAP = {
    "sdf_hand": "Loss_hand/train",
    "sdf_obj": "Loss_obj/train",
    "vol": "Loss_volume/train",
    "joint": "Loss_joint/train",
    "vert": "Loss_vert/train",
    "shape_reg": "Loss_shape_reg/train",
    "pose_reg": "Loss_pose_reg/train",
    "obj_center": "Loss_obj_center/train",
    "obj_corner": "Loss_obj_corner/train",
    "classifier": "Loss_seg/train",
    "penetration": "Loss_penetr/train",
    "contact": "Loss_contact/train",
    "total": "Loss_total/train",
}


class MetricsLogger:
    """Writes loss scalars to ``metrics.jsonl`` and (if the tensorboard
    package is importable) to TB event files under ``<experiment>/log``."""

    def __init__(self, experiment_dir: str, enabled: bool = True):
        self.enabled = enabled
        self.jsonl_path = os.path.join(experiment_dir, "metrics.jsonl")
        self._tb = None
        if not enabled:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(os.path.join(experiment_dir, "log"))
        except Exception:  # tensorboard genuinely optional
            self._tb = None

    def log_step(self, epoch: int, step: int, losses: Dict[str, float]) -> None:
        if not self.enabled:
            return
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps({"epoch": epoch, "step": step, **losses}) + "\n")
        if self._tb is not None:
            for key, value in losses.items():
                tag = _TAG_MAP.get(key, f"Loss_{key}/train")
                # reference logs every loss x1000 (train.py:600-623)
                self._tb.add_scalar(tag, value * 1000.0, step)

    def log_epoch(self, epoch: int, lr: float, epoch_time_s: float) -> None:
        if not self.enabled:
            return
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps({"epoch": epoch, "lr": lr,
                                "epoch_time_s": round(epoch_time_s, 2)}) + "\n")
        if self._tb is not None:
            # reference train.py:632-633
            self._tb.add_scalar("LR", lr, epoch)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()
