"""Import a reference PyTorch checkpoint (latest.pth) into an alignsdf_tpu
experiment directory as an orbax checkpoint.

Lets users of the reference bring their trained models over directly:

    python tools/import_torch_checkpoint.py \
        --pth /path/to/ModelParameters/latest.pth \
        --specs /path/to/specs.json \
        --out outputs/<experiment_dir>

The checkpoint schema is the reference's {"epoch", "model_state_dict"}
(reference train.py:105-110); DDP 'module.' prefixes are handled.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_RESNET_LAYERS = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pth", required=True)
    parser.add_argument("--specs", required=True)
    parser.add_argument("--out", required=True, help="experiment dir to create")
    args = parser.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

    import torch

    from alignsdf_tpu import config as cfg
    from alignsdf_tpu.models.alignsdf import build_model
    from alignsdf_tpu.models.torch_import import convert_alignsdf
    from alignsdf_tpu.training import checkpoints as ckpt
    from alignsdf_tpu.training.train_state import make_optimizer
    from alignsdf_tpu.training.train_step import init_train_state

    with open(args.specs) as f:
        raw = json.load(f)
    specs = cfg.specs_from_dict(raw)

    data = torch.load(args.pth, map_location="cpu", weights_only=False)
    sd = data["model_state_dict"] if "model_state_dict" in data else data
    epoch = int(data.get("epoch", 0))

    params, stats = convert_alignsdf(sd, specs, _RESNET_LAYERS[specs.backbone])

    model = build_model(specs)
    optimizer = make_optimizer(specs)
    state = init_train_state(model, specs, jax.random.PRNGKey(0), optimizer)
    state = state.replace(params=params, batch_stats=stats)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "specs.json"), "w") as f:
        json.dump(cfg.specs_to_dict(specs), f, indent=2)
    ckpt.save_checkpoint(args.out, state, epoch, "latest")
    print(f"imported epoch-{epoch} checkpoint into {args.out}")


if __name__ == "__main__":
    main()
