"""DeepSDF-style hand/object SDF decoders (flax linen).

Two variants, matching the reference architectures exactly:
  * ``CombinedDecoder`` — one MLP emitting both SDFs + optional 6-class
    hand-part classifier at the penultimate layer
    (reference networks/model.py:79-188);
  * ``SeparateDecoder`` — twin MLPs with per-branch input widths selected by
    ``encode_style`` in {nerf, hand, obj, both}
    (reference networks/model.py:191-350).

Both use weight-norm linear layers (torch parameterization), ReLU, optional
per-layer dropout, latent re-injection at ``latent_in`` layers, and a final
tanh.  The forward is a pure function of (params, inputs, rng) — dropout is
driven by an explicit key.  The hot path (millions of points through 5x512
matmuls) also has a fused Pallas kernel in ops/decoder_kernel.py; this module
is the always-correct XLA reference path and the parameter container.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from alignsdf_tpu.config import NetworkSpecs
from alignsdf_tpu.models.layers import TorchLinear, TorchLayerNorm, WeightNormLinear


def _linear(use_weight_norm: bool, features: int, name: str,
            dtype: Any = jnp.float32):
    if use_weight_norm:
        return WeightNormLinear(features, name=name, dtype=dtype)
    return TorchLinear(features, name=name, dtype=dtype)


class _Branch(nn.Module):
    """One DeepSDF MLP trunk: dims in_dim -> hidden* -> out (1 or 2 sdf values).

    Layer ``latent_in`` receives [x, input] concatenated; weight-norm applies
    to layers listed in ``norm_layers``; non-weight-norm configs use LayerNorm
    there instead (reference networks/model.py:117-132,159-179).
    """

    dims: Tuple[int, ...]           # full dims list incl. input and output
    specs: NetworkSpecs
    prefix: str                     # 'lin' | 'linh' | 'lino' (torch name parity)
    classifier_at_last: bool = False
    num_class: int = 6
    dtype: Any = jnp.float32        # matmul compute dtype (params stay f32)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
    ):
        specs = self.specs
        num_layers = len(self.dims)
        x = x.astype(self.dtype)
        inputs = x
        predicted_class = None

        for layer in range(num_layers - 1):
            if self.classifier_at_last and layer == num_layers - 2:
                predicted_class = TorchLinear(
                    self.num_class, name="classifier_head", dtype=self.dtype)(x)

            if layer + 1 in specs.latent_in:
                out_dim = self.dims[layer + 1] - self.dims[0]
                assert out_dim > 0, (
                    f"latent_in layer {layer + 1}: hidden width {self.dims[layer + 1]} "
                    f"must exceed the input width {self.dims[0]} (latent+embed)"
                )
            else:
                out_dim = self.dims[layer + 1]

            if layer in specs.latent_in:
                x = jnp.concatenate([x, inputs], axis=1)

            use_wn = specs.weight_norm and layer in specs.norm_layers
            x = _linear(use_wn, out_dim, f"{self.prefix}{layer}",
                        dtype=self.dtype)(x)

            if layer == num_layers - 2 and specs.use_tanh:
                x = jnp.tanh(x)
            if layer < num_layers - 2:
                if (not specs.weight_norm) and layer in specs.norm_layers:
                    x = TorchLayerNorm(name=f"bn{layer}")(x)
                x = nn.relu(x)
                if specs.dropout and layer in specs.dropout and train:
                    assert dropout_rng is not None, "training dropout needs an rng"
                    key = jax.random.fold_in(dropout_rng, layer)
                    keep = 1.0 - specs.dropout_prob
                    # threshold raw uint16 bits instead of a f32 uniform draw:
                    # P(bits <= t) = (t+1)/65536, within 4e-6 of keep, at half
                    # the PRNG words — the masks are the train step's largest
                    # random volume (8 x (B*N, 512) per step)
                    bits = jax.random.bits(key, x.shape, jnp.uint16)
                    thresh = jnp.uint16(int(round(keep * 65536.0)) - 1)
                    x = jnp.where(bits <= thresh, x / keep, 0.0)

        x = jnp.tanh(x)  # final th (reference networks/model.py:181-182)
        # SDF values and class logits feed f32 losses / host consumers
        if predicted_class is not None:
            predicted_class = predicted_class.astype(jnp.float32)
        return x.astype(jnp.float32), predicted_class


class CombinedDecoder(nn.Module):
    """One trunk, two SDF outputs (reference networks/model.py:79-188)."""

    latent_size: int
    point_feat_size: int
    encode_style: str
    specs: NetworkSpecs
    use_classifier: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, *, train=False, dropout_rng=None):
        dims = (self.latent_size + self.point_feat_size,) + self.specs.dims + (2,)
        x, predicted_class = _Branch(
            dims=dims,
            specs=self.specs,
            prefix="lin",
            classifier_at_last=self.use_classifier,
            num_class=self.specs.num_class,
            dtype=self.dtype,
            name="trunk",
        )(inputs, train=train, dropout_rng=dropout_rng)
        return x[:, 0:1], x[:, 1:2], predicted_class


class SeparateDecoder(nn.Module):
    """Twin hand/object trunks with encode_style-dependent input slicing
    (reference networks/model.py:216-227,285-299)."""

    latent_size: int
    point_feat_size: int
    encode_style: str
    specs: NetworkSpecs
    use_classifier: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, *, train=False, dropout_rng=None):
        ls, pfs = self.latent_size, self.point_feat_size
        if self.encode_style == "nerf":
            in_hand, in_obj = ls + pfs, ls + pfs
            xh, xo = inputs, inputs
        elif self.encode_style == "hand":
            in_hand, in_obj = ls + pfs, ls + 3
            xh, xo = inputs, inputs[:, : ls + 3]
        elif self.encode_style == "obj":
            in_hand, in_obj = ls + 3, ls + pfs
            xh, xo = inputs[:, : ls + 3], inputs
        elif self.encode_style == "both":
            in_hand, in_obj = ls + pfs - 3, ls + 6
            xh = inputs[:, :-3]
            xo = jnp.concatenate([inputs[:, : ls + 3], inputs[:, -3:]], axis=1)
        else:
            raise ValueError(f"unknown encode_style {self.encode_style}")

        dims_hand = (in_hand,) + self.specs.dims + (1,)
        dims_obj = (in_obj,) + self.specs.dims + (1,)

        hand_rng = obj_rng = None
        if dropout_rng is not None:
            hand_rng, obj_rng = jax.random.split(dropout_rng)

        sdf_hand, predicted_class = _Branch(
            dims=dims_hand,
            specs=self.specs,
            prefix="linh",
            classifier_at_last=self.use_classifier,
            num_class=self.specs.num_class,
            dtype=self.dtype,
            name="hand",
        )(xh, train=train, dropout_rng=hand_rng)
        sdf_obj, _ = _Branch(
            dims=dims_obj, specs=self.specs, prefix="lino", dtype=self.dtype,
            name="obj",
        )(xo, train=train, dropout_rng=obj_rng)

        return sdf_hand, sdf_obj, predicted_class


def make_decoder(model_type: str, latent_size: int, point_feat_size: int,
                 encode_style: str, specs: NetworkSpecs, use_classifier: bool,
                 dtype: Any = jnp.float32):
    """Factory matching reference train.py:333-369."""
    cls = CombinedDecoder if model_type == "1encoder1decoder" else SeparateDecoder
    return cls(
        latent_size=latent_size,
        point_feat_size=point_feat_size,
        encode_style=encode_style,
        specs=specs,
        use_classifier=use_classifier,
        dtype=dtype,
    )
