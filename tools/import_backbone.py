"""Bootstrap a FRESH training run from ImageNet-pretrained ResNet weights.

The reference trains from torchvision-pretrained backbones by default
(reference networks/resnet.py:10-16 model-zoo load, networks/model.py:55
``use_pretrained=True``): the ResNet trunk starts from ImageNet filters while
every head (fc latent, mano_fc, HeadNet, decoders, MANO branch) initializes
fresh.  This tool reproduces that bootstrap for alignsdf_tpu:

    python tools/import_backbone.py --pth resnet18-5c106cde.pth \
        --backbone resnet18 --out outputs/imagenet_resnet18

    # then in the experiment spec (or --resume CLI override):
    #   "Resume": "outputs/imagenet_resnet18"

It converts a torchvision/model-zoo state_dict (``.pth``/``.pt`` torch save,
or an ``.npz`` with the same key names for torch-free environments) into the
encoder subtree of an orbax checkpoint under ``<out>/ModelParameters/latest``.
The train CLI's spec-``Resume`` warm start (training/checkpoints.warm_start,
reference train.py:406-409 strict=False semantics) then merges the trunk into
a fresh train state by tree path: trunk filters + BN stats load, heads keep
their fresh initialization, optimizer starts clean — exactly the reference's
``pretrained=True`` start.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_RESNET_LAYERS = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


def load_state_dict(path: str):
    """Load a torchvision-shaped backbone state_dict from .pth/.pt or .npz."""
    if path.endswith(".npz"):
        import numpy as np

        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(data, "state_dict"):
        data = data.state_dict()
    if "model_state_dict" in data:
        data = data["model_state_dict"]
    if "state_dict" in data:
        data = data["state_dict"]
    return data


def convert_backbone(sd, backbone: str):
    """state_dict -> ({"encoder": params}, {"encoder": batch_stats}) with the
    trunk only (no fc / heads — those initialize fresh, reference
    networks/model.py:54-76 replaces them after the model-zoo load)."""
    from alignsdf_tpu.models.torch_import import convert_resnet_encoder

    layers = _RESNET_LAYERS[backbone]
    params, stats = convert_resnet_encoder(
        sd, layers, has_fc=False, has_headnet=False)
    return {"encoder": params}, {"encoder": stats}


def write_warm_start(out_dir: str, params, batch_stats) -> str:
    """Write {params, batch_stats, epoch: 0} as <out>/ModelParameters/latest
    (the layout training/checkpoints.warm_start resolves)."""
    import orbax.checkpoint as ocp

    from alignsdf_tpu.training.checkpoints import MODEL_PARAMS_SUBDIR

    path = os.path.abspath(os.path.join(out_dir, MODEL_PARAMS_SUBDIR, "latest"))
    if os.path.isdir(path):
        import shutil

        shutil.rmtree(path)
    ocp.StandardCheckpointer().save(
        path, {"params": params, "batch_stats": batch_stats, "epoch": 0})
    return path


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pth", required=True,
                        help="torchvision .pth/.pt state_dict (or .npz)")
    parser.add_argument("--backbone", default="resnet18",
                        choices=sorted(_RESNET_LAYERS))
    parser.add_argument("--out", required=True,
                        help="warm-start dir to create (point spec Resume here)")
    args = parser.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    sd = load_state_dict(args.pth)
    params, stats = convert_backbone(sd, args.backbone)
    path = write_warm_start(args.out, params, stats)
    n = len(jax.tree.leaves(params)) + len(jax.tree.leaves(stats))
    print(f"wrote {n} {args.backbone} trunk leaves to {path}")
    print(f'warm-start a fresh run with spec "Resume": "{args.out}"')


if __name__ == "__main__":
    main()
