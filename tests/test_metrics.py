"""MetricsLogger: JSONL stream + TensorBoard event files (reference
train.py:400-402,600-633 observability surface)."""

import glob
import json
import os

from alignsdf_tpu.utils.metrics import MetricsLogger


def test_metrics_logger_writes_jsonl_and_tb(tmp_path):
    exp = str(tmp_path)
    m = MetricsLogger(exp)
    m.log_step(1, 10, {"sdf_hand": 0.5, "total": 1.25})
    m.log_step(1, 20, {"sdf_hand": 0.4, "total": 1.00})
    m.log_epoch(1, 1e-4, 12.3)
    m.close()

    lines = [json.loads(l) for l in open(os.path.join(exp, "metrics.jsonl"))]
    assert lines[0] == {"epoch": 1, "step": 10, "sdf_hand": 0.5, "total": 1.25}
    assert lines[2]["lr"] == 1e-4

    # TB event files under <exp>/log (reference train.py:400-402); the
    # tensorboard package is present in this environment
    events = glob.glob(os.path.join(exp, "log", "events.out.tfevents.*"))
    assert events, "expected TensorBoard event files"


def test_metrics_logger_disabled_is_noop(tmp_path):
    m = MetricsLogger(str(tmp_path), enabled=False)
    m.log_step(1, 10, {"total": 1.0})
    m.log_epoch(1, 1e-4, 1.0)
    m.close()
    assert not os.path.exists(os.path.join(str(tmp_path), "metrics.jsonl"))
