"""Pallas separable maxpool (ops/maxpool): exact forward parity with
nn.max_pool(3, 2, SAME-p1) and gradient parity with XLA's select-and-scatter
on tie-free data, across shapes that exercise multi-strip row blocks and
lane tiling.  The kernel is a measured-and-REJECTED perf lever (BASELINE.md
round 4: slower than select-and-scatter in the full step) kept behind
models.resnet.PALLAS_POOL for future hardware."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from alignsdf_tpu.ops.maxpool import maxpool_k3s2p1


def _xla_pool(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def test_forward_and_grad_parity():
    rng = np.random.default_rng(0)
    for shape in ((2, 16, 16, 8), (3, 128, 128, 64), (5, 64, 64, 32),
                  (1, 8, 8, 4)):
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(maxpool_k3s2p1(x, True)), np.asarray(_xla_pool(x)))
        dy = jnp.asarray(rng.normal(size=_xla_pool(x).shape), jnp.float32)
        g1 = jax.grad(lambda a: jnp.vdot(maxpool_k3s2p1(a, True), dy))(x)
        g2 = jax.grad(lambda a: jnp.vdot(_xla_pool(a), dy))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_bf16_forward_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 16)), jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(maxpool_k3s2p1(x, True), np.float32),
        np.asarray(_xla_pool(x), np.float32))


def test_resnet_toggle_roundtrip():
    """PALLAS_POOL routes the stem through the kernel and produces the same
    activations as the default path."""
    from alignsdf_tpu.models import resnet

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 8)), jnp.float32)
    try:
        resnet.PALLAS_POOL = True
        a = resnet._pool(x)
    finally:
        resnet.PALLAS_POOL = False
    b = resnet._pool(x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
