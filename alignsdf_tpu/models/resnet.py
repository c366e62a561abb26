"""ResNet image encoder + HeadNet (flax linen, NHWC, TPU-native).

Architecture parity with the reference encoder (reference networks/resnet.py:
99-255, networks/model.py:33-76): resnet18/34/50/101/152 with a three-way
output head:

  * ``sdf_feat``  — global-average-pooled layer4 -> fc(latent_size)
  * ``mano_feat`` — global-average-pooled layer4 (512*expansion)
  * ``aux_feat``  — HeadNet: 3 x (ConvTranspose2d(k4,s2,p1) + BN + ReLU)
                    upsampling 8x8x512 -> 64x64x256

TPU-first notes:
  - internal layout is NHWC (torch-format weights are converted on import);
  - BatchNorm under ``jit`` over a data-sharded mesh computes *global* batch
    statistics (GSPMD inserts the cross-replica reductions), which exactly
    reproduces the reference's SyncBatchNorm (reference train.py:350,369)
    with zero extra code;
  - running stats live in the ``batch_stats`` collection (momentum 0.1,
    matching torch), reduced across hosts at epoch end by the trainer.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with torch semantics (momentum=0.1, eps=1e-5).

    In train mode uses biased batch variance for normalization and stores
    *unbiased* variance into the running stats, exactly like torch.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        # statistics always accumulate in float32 (running stats stay f32
        # under a bfloat16 compute dtype); output in the input dtype
        out_dtype = x.dtype
        reduce_axes = tuple(range(x.ndim - 1))
        n = np.prod([x.shape[a] for a in reduce_axes])
        fast = train and out_dtype != jnp.float32
        if fast:
            # bf16 fast path: ONE read of x computes both moments (sibling
            # f32-accumulated reductions fuse into a single pass), and the
            # normalization is a single bf16 x*a+b — the two-pass f32 chain
            # below costs ~30% of the encoder step (xplane trace, BASELINE.md)
            x32 = x.astype(jnp.float32)
            s1 = jnp.sum(x32, axis=reduce_axes)
            s2 = jnp.sum(jnp.square(x32), axis=reduce_axes)
            mean = s1 / n
            var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
        elif train:
            x = x.astype(jnp.float32)
            mean = jnp.mean(x, axis=reduce_axes)
            var = jnp.mean(jnp.square(x - mean), axis=reduce_axes)
        else:
            x = x.astype(jnp.float32)
            mean, var = ra_mean.value, ra_var.value

        if train:
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        inv = jax.lax.rsqrt(var + self.epsilon)
        if fast:
            a = (inv * scale).astype(out_dtype)
            b = (bias - mean * inv * scale).astype(out_dtype)
            return x * a + b
        return ((x - mean) * inv * scale + bias).astype(out_dtype)


def _conv(features: int, kernel: int, stride: int = 1, padding: int = 0,
          name: Optional[str] = None, dtype: Any = jnp.float32) -> nn.Conv:
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        use_bias=False,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
        dtype=dtype,
        name=name,
    )


@jax.custom_vjp
def _conv_transpose_k4s2p1(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """ConvTranspose2d(k4,s2,p1) fwd as an input-dilated conv; custom VJP.

    XLA's autodiff of the lhs-dilated form materializes spatially reversed
    activation tensors and dilated gradient convs in backward (~1.5 ms/step of
    the HeadNet cost, xplane trace).  The direct derivatives are plain convs:

      y[n, 2h+a-1, 2w+b-1, o] += x[n,h,w,i] * W[a,b,i,o]
      dx[n,h,w,i]  = sum_{a,b,o} dy[n, 2h+a-1, 2w+b-1, o] * W[a,b,i,o]
                   = conv(dy, W; stride 2, pad 1) contracting o
      dW[a,b,i,o]  = sum_{n,h,w} x[n,h,w,i] * dy[n, 2h+a-1, 2w+b-1, o]
                   = conv(dy, x; rhs_dilation 2, pad 1) contracting n
    """
    flipped = kernel[::-1, ::-1]
    return jax.lax.conv_general_dilated(
        x, flipped, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_transpose_fwd(x, kernel):
    return _conv_transpose_k4s2p1(x, kernel), (x, kernel)


def _conv_transpose_bwd(res, dy):
    x, kernel = res
    # dx: cross-correlate dy with W (no flip), stride 2, pad 1; rhs spec
    # "HWOI" contracts dy's o against W's axis-3 and emits W's axis-2 (i)
    dx = jax.lax.conv_general_dilated(
        dy, kernel, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWOI", "NHWC"),
    )
    # dW: dy as lhs (batch n contracted as features, o preserved as batch),
    # x as rhs kernel dilated by the stride; f32 accumulation for the param
    # grad like XLA's own filter-grad convs
    dw = jax.lax.conv_general_dilated(
        dy, x, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        rhs_dilation=(2, 2), dimension_numbers=("CHWN", "IHWO", "HWCN"),
        preferred_element_type=jnp.float32,
    )
    return dx, dw.astype(kernel.dtype)


_conv_transpose_k4s2p1.defvjp(_conv_transpose_fwd, _conv_transpose_bwd)

# Module-level defaults (flax bakes dataclass field defaults at class
# creation, so benches toggle these instead)
CUSTOM_DECONV_GRAD = True      # TorchConvTranspose.custom_grad
# MLPerf-style space-to-depth stem: measured NEUTRAL-to-slightly-slower on
# v5e through the axon relay (31.7 vs 32.1 ms full bf16 step) — XLA's own
# handling of the 3-channel stem is already good; kept as a tested flag
STEM_SPACE_TO_DEPTH = False    # StemConv.space_to_depth


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d(k=4, s=2, p=1, bias=False) with exact torch semantics,
    implemented as an input-dilated convolution with a flipped kernel.

    Kernel stored as (kH, kW, I, O); torch weight (I, O, kH, kW) transposes to
    this in torch_import.conv_transpose_params.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    dtype: Any = jnp.float32
    phase_decomposed: bool = False  # k4/s2/p1 only: 4 phase convs, no zeros
    custom_grad: Optional[bool] = None  # None -> module default below

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        k = self.kernel_size
        fan_in = in_features * k * k
        bound = 1.0 / np.sqrt(fan_in)
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            (k, k, in_features, self.features),
        )
        if self.phase_decomposed and k == 4 and self.stride == 2 and self.padding == 1:
            return self._phase(x.astype(self.dtype), kernel.astype(self.dtype))
        custom = (CUSTOM_DECONV_GRAD if self.custom_grad is None
                  else self.custom_grad)
        if custom and k == 4 and self.stride == 2 and self.padding == 1:
            return _conv_transpose_k4s2p1(x.astype(self.dtype),
                                          kernel.astype(self.dtype))
        # transposed conv = conv with lhs_dilation=s, per-side pad k-1-p,
        # spatially flipped kernel
        flipped = kernel[::-1, ::-1].astype(self.dtype)
        pad = k - 1 - self.padding
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            flipped,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    @staticmethod
    def _phase(x: jax.Array, kernel: jax.Array) -> jax.Array:
        """ConvTranspose(k4,s2,p1) as 4 phase convs with 2x2 taps + interleave:
        out[2y+dy, 2x+dx] = sum_{t,u} x[y-t, x-u] * W[dy+1+2t, dx+1+2u]
        (exact — the dilated form sums the same products plus zeros)."""
        spec = {0: ((3, 1), (1, 0)), 1: ((2, 0), (0, 1))}
        rows = []
        for dy in (0, 1):
            ky, py = spec[dy]
            cols = []
            for dx in (0, 1):
                kx, px = spec[dx]
                kk = jnp.stack([
                    jnp.stack([kernel[ky[a], kx[b]] for b in (0, 1)], axis=0)
                    for a in (0, 1)], axis=0)  # (2, 2, I, O)
                cols.append(jax.lax.conv_general_dilated(
                    x, kk, (1, 1), (py, px),
                    dimension_numbers=("NHWC", "HWIO", "NHWC")))
            rows.append(cols)
        b, h, w, o = rows[0][0].shape
        out = jnp.stack([jnp.stack(r, axis=0) for r in rows], axis=0)
        return out.transpose(2, 3, 0, 4, 1, 5).reshape(b, 2 * h, 2 * w, o)


# wgrad-only space-to-depth (r5): keep the DIRECT forward conv (XLA's
# 3-channel fwd handling is already good — the full-s2d stem measured
# neutral-to-slower) but compute the WEIGHT gradient on the 2x2
# space-to-depth view: the wgrad conv's contraction then runs at C_in=12
# instead of 3 (4x the MXU lane occupancy of the 7x7 wgrad; the 0.7 ms/step
# batch-constant pocket in the b64 xplane, BASELINE.md r4).  dx stays the
# stock XLA transposed conv via an inner jax.vjp.
# MEASURED AND REJECTED (r5, bit-exact parity held): b64 29.12 -> 29.79 ms,
# b128/pixel neutral — XLA's own wgrad handles C_in=3 better than the s2d
# rewrite's extra reshapes; kept as a tested flag (BASELINE.md r5).
STEM_WGRAD_S2D = False


@jax.custom_vjp
def _stem_conv_s2d_wgrad(x: jax.Array, kernel: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, kernel, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _stem_fwd(x, kernel):
    return _stem_conv_s2d_wgrad(x, kernel), (x, kernel)


def _stem_bwd(res, dy):
    x, kernel = res
    # dx: exactly the stock autodiff path (input-dilated conv)
    _, pullback = jax.vjp(
        lambda xx: jax.lax.conv_general_dilated(
            xx, kernel, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")), x)
    (dx,) = pullback(dy)

    # dW via the exact space-to-depth rewrite (same products as the direct
    # wgrad, reassociated): the 7x7/s2/p3 conv equals a 4x4/s1 conv on the
    # 2x2-s2d input with the kernel padded to 8x8 (StemConv docstring), so
    # its weight gradient is the s2d conv's wgrad mapped back through the
    # same (i, py) -> kh = 2i + py - 1 index algebra
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    ws0 = jnp.zeros((4, 4, 4 * c, f), kernel.dtype)
    _, pb_w = jax.vjp(
        lambda ws: jax.lax.conv_general_dilated(
            xs, ws, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")), ws0)
    (dws,) = pb_w(dy)
    dkp = dws.reshape(4, 4, 2, 2, c, f)
    dkp = dkp.transpose(0, 2, 1, 3, 4, 5).reshape(8, 8, c, f)
    return dx, dkp[1:, 1:]


_stem_conv_s2d_wgrad.defvjp(_stem_fwd, _stem_bwd)


class StemConv(nn.Module):
    """The ResNet stem conv1 (7x7, stride 2, pad 3, bias-free) computed as an
    exact space-to-depth rewrite: 4x4 stride-1 conv on the 2x2-space-to-depth
    input (12 channels).

    Identical math (same products, zero taps where the padded 8x8 kernel has
    no source), but TPU-friendly: the backward pass needs no stride-2
    input-dilated conv, and 12 input channels use 4x the MXU lanes of the
    raw 3-channel image (MLPerf ResNet stem trick).  The parameter keeps the
    torch shape/name (kernel (7,7,3,64) under conv1/) so checkpoint import is
    unchanged; set space_to_depth=False for the direct conv.
    """

    features: int = 64
    dtype: Any = jnp.float32
    space_to_depth: Optional[bool] = None  # None -> module default below

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (7, 7, 3, self.features),
        )
        s2d = (STEM_SPACE_TO_DEPTH if self.space_to_depth is None
               else self.space_to_depth)
        if not s2d or x.shape[1] % 2 or x.shape[2] % 2:
            xc = x.astype(self.dtype)
            kc = kernel.astype(self.dtype)
            if (STEM_WGRAD_S2D and not x.shape[1] % 2
                    and not x.shape[2] % 2):
                return _stem_conv_s2d_wgrad(xc, kc)
            return jax.lax.conv_general_dilated(
                xc, kc, (2, 2),
                ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, h, w, c = x.shape
        x2 = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8,8,3,F)
        k2 = kp.reshape(4, 2, 4, 2, 3, self.features)
        k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, self.features)
        return jax.lax.conv_general_dilated(
            x2.astype(self.dtype), k2.astype(self.dtype), (1, 1),
            ((2, 1), (2, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


# Pallas separable pool (ops/maxpool): stride-2 selections as leading-dim
# pair reshapes (the Mosaic-supported de-interleave form).  Toggle measured
# in BASELINE.md; tie semantics deviate from select-and-scatter (every tied
# position gets the gradient — measure-zero for continuous activations).
PALLAS_POOL = False


def _pool(x: jax.Array) -> jax.Array:
    if PALLAS_POOL:
        from alignsdf_tpu.ops.maxpool import maxpool_k3s2p1

        # interpret on CPU — including under a jax.default_device(cpu)
        # context (init_train_state traces the init there)
        dev = jax.config.jax_default_device
        interpret = (dev.platform == "cpu" if dev is not None
                     else jax.default_backend() == "cpu")
        return maxpool_k3s2p1(x, interpret)
    return _max_pool_3x3s2(x)


@jax.custom_vjp
def _max_pool_3x3s2(x: jax.Array) -> jax.Array:
    """max_pool 3x3/s2/p1 with the input pinned as the VJP residual.

    Identical gradient to plain autodiff (the backward IS jax's own
    reduce_window transpose on the saved tensor).  Measured alternatives
    (BASELINE.md): a parity-decomposed compare-and-accumulate backward was
    ~2 ms SLOWER (stride-2 slices/scatters relayout poorly on TPU), and the
    round-3 Pallas attempt hit an unsupported Mosaic interleave reshape —
    round 4's ops/maxpool.py found the supported form (PALLAS_POOL toggle).
    """
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def _max_pool_fwd(x):
    return _max_pool_3x3s2(x), x


def _max_pool_bwd(x, dy):
    _, pullback = jax.vjp(
        lambda xx: nn.max_pool(xx, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1))), x)
    return pullback(dy)


_max_pool_3x3s2.defvjp(_max_pool_fwd, _max_pool_bwd)


class BasicBlock(nn.Module):
    """reference networks/resnet.py:26-55"""

    features: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        out = _conv(self.features, 3, self.stride, 1, name="conv1", dtype=self.dtype)(x)
        out = TorchBatchNorm(name="bn1")(out, train)
        out = nn.relu(out)
        out = _conv(self.features, 3, 1, 1, name="conv2", dtype=self.dtype)(out)
        out = TorchBatchNorm(name="bn2")(out, train)
        if self.downsample:
            residual = _conv(self.features * self.expansion, 1, self.stride, 0,
                             name="downsample_conv", dtype=self.dtype)(x)
            residual = TorchBatchNorm(name="downsample_bn")(residual, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """reference networks/resnet.py:58-97"""

    features: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        out = _conv(self.features, 1, 1, 0, name="conv1", dtype=self.dtype)(x)
        out = TorchBatchNorm(name="bn1")(out, train)
        out = nn.relu(out)
        out = _conv(self.features, 3, self.stride, 1, name="conv2", dtype=self.dtype)(out)
        out = TorchBatchNorm(name="bn2")(out, train)
        out = nn.relu(out)
        out = _conv(self.features * self.expansion, 1, 1, 0, name="conv3", dtype=self.dtype)(out)
        out = TorchBatchNorm(name="bn3")(out, train)
        if self.downsample:
            residual = _conv(self.features * self.expansion, 1, self.stride, 0,
                             name="downsample_conv", dtype=self.dtype)(x)
            residual = TorchBatchNorm(name="downsample_bn")(residual, train)
        return nn.relu(out + residual)


class HeadNet(nn.Module):
    """3 x (deconv k4 s2 p1 -> BN -> ReLU): 8x8x512 -> 64x64x256
    (reference networks/model.py:33-51)."""

    out_features: int = 256
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(self.num_layers):
            x = TorchConvTranspose(self.out_features, name=f"deconv{i}",
                                   dtype=self.dtype)(x)
            x = TorchBatchNorm(name=f"bn{i}")(x, train)
            x = nn.relu(x)
        return x


class ResNetEncoder(nn.Module):
    """ResNet trunk + three-way head (reference networks/resnet.py:99-194,
    networks/model.py:54-76).  Input NHWC float32."""

    block: str                     # 'basic' | 'bottleneck'
    layers: Tuple[int, ...]        # blocks per stage
    latent_size: int = 256
    mano_features: bool = False
    use_headnet: bool = False
    use_pixel_align: bool = False
    remat: bool = False            # jax.checkpoint each residual block
    dtype: Any = jnp.float32       # conv/matmul compute dtype (params f32)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        x = x.astype(self.dtype)
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        if self.remat and not self.is_initializing():
            # rematerialize each residual block's activations in backward
            # (skipped during init: flax remat + param-init RNG miscompiles)
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        expansion = 1 if self.block == "basic" else 4

        x = StemConv(64, name="conv1", dtype=self.dtype)(x)
        x = TorchBatchNorm(name="bn1")(x, train)
        x = nn.relu(x)
        x = _pool(x)

        in_features = 64
        for stage, (features, blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers)
        ):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                needs_down = b == 0 and (s != 1 or in_features != features * expansion)
                x = block_cls(
                    features, s, downsample=needs_down, dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
                in_features = features * expansion

        # global average pool in f32 (cheap; the MANO branch and fc consume it)
        gap = x.astype(jnp.float32).mean(axis=(1, 2))  # (B, 512*expansion)

        mano_feat = gap if self.mano_features else None

        sdf_feat = None
        if not (self.use_headnet and self.use_pixel_align):
            from alignsdf_tpu.models.layers import TorchLinear

            sdf_feat = TorchLinear(self.latent_size, name="fc",
                                   dtype=self.dtype)(gap)

        aux_feat = None
        if self.use_headnet:
            aux_feat = HeadNet(name="aux_layer", dtype=self.dtype)(x, train)

        return sdf_feat, mano_feat, aux_feat


_ARCHS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


def make_encoder(backbone: str, latent_size: int, mano_features: bool,
                 use_headnet: bool, use_pixel_align: bool,
                 remat: bool = False, dtype: Any = jnp.float32):
    """Factory matching reference networks/model.py:54-76, extended with the
    PointNet encoders the reference ships unwired (networks/pointnet.py)."""
    if backbone in ("pointnet", "resnet_pointnet"):
        if mano_features or use_headnet or use_pixel_align:
            raise ValueError(
                f"Backbone {backbone!r} encodes a point cloud and provides no "
                "image features: ManoBranch/ObjectPoseBranch/PixelAlign/Render "
                "require a resnet backbone"
            )
        from alignsdf_tpu.models.pointnet import PointNetEncoder

        return PointNetEncoder(arch=backbone, latent_size=latent_size)
    block, layers = _ARCHS[backbone]
    return ResNetEncoder(
        block=block,
        layers=layers,
        latent_size=latent_size,
        mano_features=mano_features,
        use_headnet=use_headnet,
        use_pixel_align=use_pixel_align,
        remat=remat,
        dtype=dtype,
    )
