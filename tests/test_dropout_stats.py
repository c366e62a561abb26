"""The decoder's uint16-bits dropout must realize the configured keep
probability (reference decoders use p=0.2 dropout on layers 0-3,
reference networks/model.py:135-141)."""

import jax
import jax.numpy as jnp
import numpy as np

from alignsdf_tpu.config import NetworkSpecs
from alignsdf_tpu.models.decoder import SeparateDecoder


def test_dropout_keep_rate_and_scaling():
    ns = NetworkSpecs()  # dropout (0,1,2,3), p=0.2
    dec = SeparateDecoder(8, 3, "nerf", ns, use_classifier=False)
    x = jnp.ones((4096, 11))
    variables = dec.init(jax.random.PRNGKey(0), x)

    # two different rngs give different masks; same rng reproduces exactly
    out1 = dec.apply(variables, x, train=True, dropout_rng=jax.random.PRNGKey(1))
    out1b = dec.apply(variables, x, train=True, dropout_rng=jax.random.PRNGKey(1))
    out2 = dec.apply(variables, x, train=True, dropout_rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out1b[0]))
    assert not np.array_equal(np.asarray(out1[0]), np.asarray(out2[0]))

    # keep rate: measure directly on the mask primitive the decoder uses
    keep = 1.0 - ns.dropout_prob
    bits = jax.random.bits(jax.random.PRNGKey(3), (1 << 20,), jnp.uint16)
    thresh = jnp.uint16(int(round(keep * 65536.0)) - 1)
    rate = float(jnp.mean((bits <= thresh).astype(jnp.float32)))
    assert abs(rate - keep) < 2e-3, rate

    # inverted-scaling preserves the expectation: E[dropout(x)] ~= x
    y = jnp.ones((1 << 16, 1))
    key = jax.random.PRNGKey(4)
    b = jax.random.bits(key, y.shape, jnp.uint16)
    dropped = jnp.where(b <= thresh, y / keep, 0.0)
    assert abs(float(jnp.mean(dropped)) - 1.0) < 5e-3
