"""Convert PyTorch reference state_dicts to alignsdf_tpu flax parameter trees.

Supports the decoder MLPs, the MANO branch, HeadNet, the object-pose 1x1 conv
and the ResNet encoders — enough to load a full reference ``latest.pth``
(reference train.py:105-110 checkpoint schema) or torchvision-pretrained
backbone weights into the JAX model for bit-parity evaluation and warm starts.

Conventions:
  torch Linear weight (out, in)      -> flax kernel (in, out)        [transpose]
  torch weight-norm weight_v/weight_g -> {v: (in, out), g: (out,)}
  torch Conv2d weight (O, I, kH, kW) -> flax kernel (kH, kW, I, O)
  torch BatchNorm{weight,bias,running_mean,running_var}
        -> params {scale, bias} + batch_stats {mean, var}
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def linear_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def weight_norm_linear_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    # torch>=2 uses parametrizations; older uses weight_g/weight_v
    if f"{prefix}.weight_v" in sd:
        v = _np(sd[f"{prefix}.weight_v"])
        g = _np(sd[f"{prefix}.weight_g"])
    else:
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
    return {
        "v": v.T,
        "g": g.reshape(-1),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def layernorm_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def conv_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv_transpose_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    # torch ConvTranspose2d weight is (I, O, kH, kW); our deconv implements
    # transposed conv via lax.conv_transpose with kernel (kH, kW, I, O).
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 0, 1)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def batchnorm_params(
    sd: Mapping[str, Any], prefix: str
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    return params, stats


def _branch_params(sd: Mapping[str, Any], torch_prefix: str, flax_prefix: str,
                   n_layers: int, weight_norm: bool, norm_layers,
                   use_classifier: bool, sd_prefix: str = "") -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    # torch LayerNorm names mirror the linear prefix: lin->bn, linh->bnh, lino->bno
    ln_prefix = torch_prefix.replace("lin", "bn")
    for layer in range(n_layers):
        name = f"{sd_prefix}{torch_prefix}{layer}"
        if weight_norm and layer in norm_layers:
            tree[f"{flax_prefix}{layer}"] = weight_norm_linear_params(sd, name)
        else:
            tree[f"{flax_prefix}{layer}"] = linear_params(sd, name)
        if (not weight_norm) and layer in norm_layers and layer < n_layers - 1:
            tree[f"bn{layer}"] = layernorm_params(sd, f"{sd_prefix}{ln_prefix}{layer}")
    if use_classifier:
        tree["classifier_head"] = linear_params(sd, f"{sd_prefix}classifier_head")
    return tree


def convert_combined_decoder(sd: Mapping[str, Any], network_specs,
                             use_classifier: bool, sd_prefix: str = "") -> Dict[str, Any]:
    """Reference CombinedDecoder state_dict -> flax params for models.decoder.CombinedDecoder."""
    n_layers = len(network_specs.dims) + 1
    return {
        "trunk": _branch_params(
            sd, "lin", "lin", n_layers, network_specs.weight_norm,
            network_specs.norm_layers, use_classifier, sd_prefix,
        )
    }


def convert_separate_decoder(sd: Mapping[str, Any], network_specs,
                             use_classifier: bool, sd_prefix: str = "") -> Dict[str, Any]:
    """Reference SeparateDecoder state_dict -> flax params for models.decoder.SeparateDecoder."""
    n_layers = len(network_specs.dims) + 1
    return {
        "hand": _branch_params(
            sd, "linh", "linh", n_layers, network_specs.weight_norm,
            network_specs.norm_layers, use_classifier, sd_prefix,
        ),
        "obj": _branch_params(
            sd, "lino", "lino", n_layers, network_specs.weight_norm,
            network_specs.norm_layers, False, sd_prefix,
        ),
    }


def convert_resnet_encoder(
    sd: Mapping[str, Any],
    layers: Tuple[int, ...],
    has_fc: bool = True,
    has_headnet: bool = False,
    sd_prefix: str = "",
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Torch ResNet (+optional HeadNet aux_layer) state_dict -> (params, batch_stats).

    Name mapping: ``layerS.B.convN`` -> ``layerS_B/convN``; ``downsample.0/1``
    -> ``downsample_conv``/``downsample_bn``; ``aux_layer.deconv_layers.{3i}``
    -> ``aux_layer/deconv{i}`` (reference networks/resnet.py:99-155,
    networks/model.py:40-47).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_bn(flax_name: str, torch_name: str) -> None:
        p, s = batchnorm_params(sd, sd_prefix + torch_name)
        params[flax_name] = p
        stats[flax_name] = s

    params["conv1"] = conv_params(sd, sd_prefix + "conv1")
    put_bn("bn1", "bn1")

    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            t = f"layer{stage + 1}.{b}"
            f = f"layer{stage + 1}_{b}"
            block_params: Dict[str, Any] = {}
            block_stats: Dict[str, Any] = {}
            n_convs = 3 if f"{sd_prefix}{t}.conv3.weight" in sd else 2
            for c in range(1, n_convs + 1):
                block_params[f"conv{c}"] = conv_params(sd, f"{sd_prefix}{t}.conv{c}")
                p, s = batchnorm_params(sd, f"{sd_prefix}{t}.bn{c}")
                block_params[f"bn{c}"] = p
                block_stats[f"bn{c}"] = s
            if f"{sd_prefix}{t}.downsample.0.weight" in sd:
                block_params["downsample_conv"] = conv_params(sd, f"{sd_prefix}{t}.downsample.0")
                p, s = batchnorm_params(sd, f"{sd_prefix}{t}.downsample.1")
                block_params["downsample_bn"] = p
                block_stats["downsample_bn"] = s
            params[f] = block_params
            stats[f] = block_stats

    if has_fc and f"{sd_prefix}fc.weight" in sd:
        params["fc"] = linear_params(sd, sd_prefix + "fc")

    if has_headnet:
        head_params: Dict[str, Any] = {}
        head_stats: Dict[str, Any] = {}
        for i in range(3):
            head_params[f"deconv{i}"] = conv_transpose_params(
                sd, f"{sd_prefix}aux_layer.deconv_layers.{3 * i}"
            )
            p, s = batchnorm_params(sd, f"{sd_prefix}aux_layer.deconv_layers.{3 * i + 1}")
            head_params[f"bn{i}"] = p
            head_stats[f"bn{i}"] = s
        params["aux_layer"] = head_params
        stats["aux_layer"] = head_stats

    return params, stats


def convert_mano_branch(sd: Mapping[str, Any], sd_prefix: str = "",
                        absolute_depth: bool = False,
                        use_obj_rot: bool = False) -> Dict[str, Any]:
    """Reference ManoBranch state_dict -> flax params for models.manobranch.ManoBranch
    (reference networks/manobranch.py:58-111; Sequential indices: base_layer.0/.2
    are the two Linears, shape_reg.0 the shape head)."""
    params: Dict[str, Any] = {
        "base0": linear_params(sd, f"{sd_prefix}base_layer.0"),
        "base1": linear_params(sd, f"{sd_prefix}base_layer.2"),
        "pose_reg": linear_params(sd, f"{sd_prefix}pose_reg"),
        "shape_reg": linear_params(sd, f"{sd_prefix}shape_reg.0"),
    }
    if absolute_depth:
        params["trans_branch"] = {
            "hidden0": linear_params(sd, f"{sd_prefix}trans_branch.decoder.0"),
            "final": linear_params(sd, f"{sd_prefix}trans_branch.final_layer"),
        }
    if use_obj_rot:
        params["object_rot_branch"] = {
            "hidden0": linear_params(sd, f"{sd_prefix}object_rot_branch.decoder.0"),
            "final": linear_params(sd, f"{sd_prefix}object_rot_branch.final_layer"),
        }
    return params


def convert_alignsdf(sd: Mapping[str, Any], specs,
                     resnet_layers: Tuple[int, ...]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Full reference ModelOneEncoderOneDecoder state_dict -> (params, batch_stats)
    for models.alignsdf.AlignSDF.  Accepts checkpoints saved under DDP
    ('module.' prefix is stripped)."""
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    enc_params, enc_stats = convert_resnet_encoder(
        sd, resnet_layers,
        has_fc=not (specs.use_headnet and specs.pixel_align),
        has_headnet=specs.use_headnet,
        sd_prefix="encoder.",
    )
    params["encoder"] = enc_params
    stats["encoder"] = enc_stats

    if specs.model_type == "1encoder1decoder":
        params["decoder"] = convert_combined_decoder(
            sd, specs.network_specs, specs.classifier_branch, sd_prefix="decoder.")
    else:
        params["decoder"] = convert_separate_decoder(
            sd, specs.network_specs, specs.classifier_branch, sd_prefix="decoder.")

    if specs.mano_branch:
        params["mano_decoder"] = convert_mano_branch(
            sd, "mano_decoder.",
            absolute_depth=specs.use_depth, use_obj_rot=specs.use_obj_rot)

    if specs.use_obj_pose and "volume_layer.weight" in sd:
        params["volume_layer"] = conv_params(sd, "volume_layer")

    return params, stats
