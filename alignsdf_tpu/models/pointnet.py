"""PointNet encoders (flax) — reference networks/pointnet.py:58-157.

The reference ships these (Occupancy-Networks-style max-pool point encoders)
but never wires them in; they are provided here as first-class alternative
encoders for point-cloud-conditioned SDF decoding.  Structure matched exactly
(fc widths, pooled-feature concat pattern, ResnetBlockFC with zero-initialized
second linear and bias-free shortcut).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from alignsdf_tpu.models.layers import TorchLinear, torch_linear_init


class ResnetBlockFC(nn.Module):
    """Fully-connected residual block (reference networks/pointnet.py:14-55)."""

    size_out: int
    size_h: int | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        size_in = x.shape[-1]
        size_h = self.size_h or min(size_in, self.size_out)

        net = TorchLinear(size_h, name="fc_0")(nn.relu(x))
        # fc_1 weight is zero-initialized in the reference (:44)
        k_init, b_init = torch_linear_init(size_h)
        dx = nn.Dense(
            self.size_out,
            kernel_init=nn.initializers.zeros,
            bias_init=b_init,
            name="fc_1",
        )(nn.relu(net))

        if size_in == self.size_out:
            x_s = x
        else:
            x_s = TorchLinear(self.size_out, use_bias=False, name="shortcut")(x)
        return x_s + dx


def _pool_cat(net: jax.Array) -> jax.Array:
    pooled = jnp.max(net, axis=1, keepdims=True)
    pooled = jnp.broadcast_to(pooled, net.shape)
    return jnp.concatenate([net, pooled], axis=2)


class SimplePointnet(nn.Module):
    """reference networks/pointnet.py:58-104"""

    c_dim: int = 128
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, p: jax.Array) -> jax.Array:
        h = self.hidden_dim
        net = TorchLinear(2 * h, name="fc_pos")(p)
        net = TorchLinear(h, name="fc_0")(nn.relu(net))
        net = _pool_cat(net)
        net = TorchLinear(h, name="fc_1")(nn.relu(net))
        net = _pool_cat(net)
        net = TorchLinear(h, name="fc_2")(nn.relu(net))
        net = _pool_cat(net)
        net = TorchLinear(h, name="fc_3")(nn.relu(net))
        net = jnp.max(net, axis=1)
        return TorchLinear(self.c_dim, name="fc_c")(nn.relu(net))


class ResnetPointnet(nn.Module):
    """reference networks/pointnet.py:107-157"""

    c_dim: int = 128
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, p: jax.Array) -> jax.Array:
        h = self.hidden_dim
        net = TorchLinear(2 * h, name="fc_pos")(p)
        for i in range(4):
            net = ResnetBlockFC(h, name=f"block_{i}")(net)
            net = _pool_cat(net)
        net = ResnetBlockFC(h, name="block_4")(net)
        net = jnp.max(net, axis=1)
        return TorchLinear(self.c_dim, name="fc_c")(nn.relu(net))


class PointNetEncoder(nn.Module):
    """Drop-in scene encoder over a point cloud: same (sdf_feat, mano_feat,
    aux_feat) triple as ResNetEncoder so ``Backbone: pointnet`` /
    ``resnet_pointnet`` slot into the full model (SURVEY §2.1: the reference
    ships these encoders, networks/pointnet.py:58-157, without wiring them;
    here they are selectable through make_encoder).  Point-cloud conditioning
    has no image features, so mano/headnet/pixel-align branches are
    unavailable with these backbones (enforced in make_encoder)."""

    arch: str = "resnet_pointnet"          # 'pointnet' | 'resnet_pointnet'
    latent_size: int = 256
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, points: jax.Array, train: bool = False):
        cls = SimplePointnet if self.arch == "pointnet" else ResnetPointnet
        feat = cls(c_dim=self.latent_size, hidden_dim=self.hidden_dim,
                   name="pointnet")(points)
        return feat, None, None
