"""Shared flax building blocks with PyTorch-matching semantics.

Every layer takes an optional ``dtype`` (the *compute* dtype): parameters are
always stored float32; when ``dtype=bfloat16`` the matmul operands are cast
down so the MXU runs bf16 with half the HBM activation traffic.  With the
default float32 the casts are no-ops and outputs are bit-identical to the
original float32 implementation (the parity tests rely on this).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_init(in_features: int) -> tuple[Callable, Callable]:
    """torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) for the weight
    and U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for the bias.  For a linear layer
    kaiming_uniform(a=sqrt(5)) reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    as well."""
    bound = 1.0 / np.sqrt(in_features) if in_features > 0 else 0.0

    def kernel_init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return kernel_init, kernel_init


class TorchLinear(nn.Module):
    """Dense layer with torch's default initialization (so randomly-initialized
    networks are distribution-matched to the reference)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        k_init, b_init = torch_linear_init(in_features)
        kernel = self.param("kernel", k_init, (in_features, self.features))
        y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", b_init, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class WeightNormLinear(nn.Module):
    """Linear layer with PyTorch ``nn.utils.weight_norm`` parameterization:
    ``W[o, :] = g[o] * v[o, :] / ||v[o, :]||`` (norm over the input axis,
    torch's default dim=0 for Linear).  Reference decoders wrap every hidden
    layer this way (reference networks/model.py:127,250,268).

    The norm/rescale runs in float32 (it is O(in*out), tiny next to the
    matmul); only the effective kernel is cast to the compute dtype.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        k_init, b_init = torch_linear_init(in_features)
        v = self.param("v", k_init, (in_features, self.features))
        # torch initializes g = ||v|| at wrap time
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(v, axis=0),
            (self.features,),
        )
        norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        kernel = v * (g[None, :] / norm)
        bias = self.param("bias", b_init, (self.features,))
        y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        return y + bias.astype(self.dtype)


class TorchLayerNorm(nn.Module):
    """LayerNorm matching torch defaults (eps=1e-5, elementwise affine).
    Statistics always in float32."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        out_dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = x.mean(axis=-1, keepdims=True)
        var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(out_dtype)
