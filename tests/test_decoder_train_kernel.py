"""Fused train-path decoder (ops/decoder_train_kernel): forward parity with
the XLA decoder, custom-VJP gradient checks, and dropout semantics.

Gradient strategy: against a pure-jnp replica of the same padded plan the
kernel must agree to f32 precision (exact same summation structure); against
the flax decoder only the forward is compared tightly — gradients can differ
at borderline-ReLU units whose sign flips under f32 summation-order changes
(verified to be the sole source of deviation: in f64 the two paths agree to
4e-8).  With dropout ACTIVE the masks are a pure function of (seed, position),
so directional finite differences remain valid gradient checks.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alignsdf_tpu.config import NetworkSpecs, Specs
from alignsdf_tpu.models.decoder import make_decoder
from alignsdf_tpu.ops.decoder_kernel import build_branch_plan, pad_inputs
from alignsdf_tpu.ops.decoder_train_kernel import (
    _dropout_gate,
    _plan_statics,
    fused_branch,
    make_fused_train_decoder,
    make_fused_train_decoder_factored,
)

NS = NetworkSpecs(dims=(128, 128, 128, 128), dropout=(0, 1, 2, 3),
                  dropout_prob=0.2, norm_layers=(0, 1, 2, 3), latent_in=(2,),
                  num_class=6)
SPECS = Specs(model_type="1encoder2decoder", encode_style="both",
              point_feat_size=9, latent_size=64, network_specs=NS,
              classifier_branch=True)


@pytest.fixture(scope="module")
def setup():
    dec = make_decoder(SPECS.model_type, SPECS.latent_size,
                       SPECS.point_feat_size, SPECS.encode_style, NS,
                       SPECS.classifier_branch)
    x = jax.random.normal(jax.random.PRNGKey(1), (256, 64 + 9)) * 0.5
    params = dec.init(jax.random.PRNGKey(0), x)["params"]
    fused = make_fused_train_decoder(SPECS, block=128, interpret=True)
    assert fused is not None
    return dec, params, x, fused


def test_forward_matches_xla_decoder(setup):
    dec, params, x, fused = setup
    h1, o1, c1 = dec.apply({"params": params}, x, train=False)
    h2, o2, c2 = fused(params, x, seed=jnp.int32(3), train=False)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)


def _replica(plan, xin):
    """Pure-jnp forward of the exact padded plan (same summation structure)."""
    x0 = pad_inputs(xin, plan.weights[0].shape[0])
    xx = x0
    n = len(plan.weights)
    for layer in range(n):
        acc = xx @ plan.weights[layer]
        if plan.inject_weights[layer] is not None:
            acc = acc + x0 @ plan.inject_weights[layer]
        acc = acc + plan.biases[layer]
        xx = jnp.maximum(acc, 0.0) if layer < n - 1 else jnp.tanh(acc)
    return xx


def test_custom_vjp_matches_replica_grads(setup):
    """The kernel's VJP vs jax.grad of the structurally identical jnp forward:
    must agree to f32 precision for every parameter leaf and the input."""
    _, params, x, _ = setup
    xo = jnp.concatenate([x[:, : 64 + 3], x[:, -3:]], axis=1)
    static = _plan_statics(5, (False, False, True, False, False),
                           (True,) * 4, 0.8, 128, "float32", False, True)

    def loss_fused(p, xin):
        plan = build_branch_plan(p["obj"], "lino", 64 + 6, NS, 1,
                                 dtype=jnp.float32)
        x0 = pad_inputs(xin, plan.weights[0].shape[0])
        y, _ = fused_branch(static, plan.weights, plan.inject_weights,
                            plan.biases, x0, jnp.int32(4))
        return jnp.sum(y[:, 0] ** 2)

    def loss_replica(p, xin):
        plan = build_branch_plan(p["obj"], "lino", 64 + 6, NS, 1,
                                 dtype=jnp.float32)
        return jnp.sum(_replica(plan, xin)[:, 0] ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1))(params, xo)
    g2 = jax.grad(loss_replica, argnums=(0, 1))(params, xo)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        scale = float(jnp.abs(b).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale,
                                   atol=5e-6)


def test_dropout_semantics(setup):
    _, params, x, fused = setup
    h_eval, *_ = fused(params, x, seed=jnp.int32(3), train=False)
    h_tr, *_ = fused(params, x, seed=jnp.int32(3), train=True)
    h_tr2, *_ = fused(params, x, seed=jnp.int32(3), train=True)
    h_tr3, *_ = fused(params, x, seed=jnp.int32(4), train=True)
    assert float(jnp.abs(h_tr - h_eval).max()) > 1e-6     # dropout active
    assert jnp.array_equal(h_tr, h_tr2)                   # deterministic/seed
    assert float(jnp.abs(h_tr - h_tr3).max()) > 1e-6      # seed-dependent


def test_dropout_gate_distribution():
    g = _dropout_gate(jnp.uint32(1234), 2, 512, 512, 0.8, jnp.int32(7))
    keep = float(jnp.mean(g > 0))
    assert abs(keep - 0.8) < 0.01
    assert abs(float(g.max()) - 1.25) < 1e-6
    g2 = _dropout_gate(jnp.uint32(1234), 3, 512, 512, 0.8, jnp.int32(7))
    agree = float(jnp.mean((g > 0) == (g2 > 0)))  # p^2+(1-p)^2 = 0.68
    assert abs(agree - 0.68) < 0.02


def test_directional_derivative_with_active_dropout(setup):
    """Masks are a pure function of (seed, position), so finite differences
    against the custom VJP are valid even in train mode."""
    _, params, x, fused = setup

    def f(x_):
        h, o, c = fused(params, x_, seed=jnp.int32(11), train=True)
        return jnp.sum(jnp.sin(h)) + jnp.sum(o ** 2) + 0.01 * jnp.sum(c ** 2)

    v = jax.random.normal(jax.random.PRNGKey(5), x.shape)
    eps = 1e-3
    fd = float((f(x + eps * v) - f(x - eps * v)) / (2 * eps))
    gd = float(jnp.vdot(jax.grad(f)(x), v))
    assert abs(fd - gd) / max(abs(fd), 1e-9) < 0.03

    def fp(p_):
        h, o, _ = fused(p_, x, seed=jnp.int32(11), train=True)
        return jnp.sum(jnp.sin(h)) + jnp.sum(o ** 2)

    gp = jax.grad(fp)(params)
    vp = jax.tree.map(
        lambda a: jax.random.normal(jax.random.PRNGKey(9), a.shape), params)
    pe = jax.tree.map(lambda a, d: a + eps * d, params, vp)
    pm = jax.tree.map(lambda a, d: a - eps * d, params, vp)
    fdp = float((fp(pe) - fp(pm)) / (2 * eps))
    gdp = sum(float(jnp.vdot(a, b))
              for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(vp)))
    assert abs(fdp - gdp) / max(abs(fdp), 1e-9) < 0.03


class TestFactored:
    """Scene-factored kernel (latent folded into per-scene biases) vs the XLA
    decoder and the materialized-inputs kernel.  Same dropout stream by
    construction (the gate hashes the absolute point row, independent of the
    kernel's block size)."""

    B, N = 3, 256

    @pytest.fixture(scope="class")
    def fsetup(self):
        import dataclasses

        specs = dataclasses.replace(SPECS, samples_per_scene=self.N)
        dec = make_decoder(specs.model_type, specs.latent_size,
                           specs.point_feat_size, specs.encode_style, NS,
                           specs.classifier_branch)
        rng = np.random.RandomState(0)
        latent = jnp.asarray(rng.randn(self.B, 64).astype(np.float32) * 0.5)
        emb = jnp.asarray(rng.randn(self.B * self.N, 9).astype(np.float32) * 0.5)
        x = jnp.concatenate([jnp.repeat(latent, self.N, axis=0), emb], axis=1)
        params = dec.init(jax.random.PRNGKey(0), x)["params"]
        fac = make_fused_train_decoder_factored(specs, interpret=True)
        gen = make_fused_train_decoder(specs, block=128, interpret=True)
        assert fac is not None and fac.factored
        return dec, params, latent, emb, x, fac, gen

    def test_eval_forward_matches_xla(self, fsetup):
        dec, params, latent, emb, x, fac, _ = fsetup
        h1, o1, c1 = dec.apply({"params": params}, x, train=False)
        # factored decode returns 1-D sdf columns (lanes-major y rows)
        h2, o2, c2 = fac(params, latent, emb, jnp.int32(3), train=False)
        assert h2.ndim == 1 and o2.ndim == 1
        np.testing.assert_allclose(np.asarray(h1).ravel(), np.asarray(h2),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(o1).ravel(), np.asarray(o2),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)

    def test_train_forward_matches_generic_kernel(self, fsetup):
        _, params, latent, emb, x, fac, gen = fsetup
        h1, o1, c1 = gen(params, x, jnp.int32(7), train=True)
        h2, o2, c2 = fac(params, latent, emb, jnp.int32(7), train=True)
        np.testing.assert_allclose(np.asarray(h1).ravel(), np.asarray(h2),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(o1).ravel(), np.asarray(o2),
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)

    def test_grads_match_generic_kernel(self, fsetup):
        _, params, latent, emb, x, fac, gen = fsetup
        n = self.N

        def loss_fac(p, lat, e):
            h, o, c = fac(p, lat, e, jnp.int32(7), train=True)
            return jnp.sum(jnp.sin(h)) + jnp.sum(o ** 2) + 0.01 * jnp.sum(c ** 2)

        def loss_gen(p, lat, e):
            xx = jnp.concatenate([jnp.repeat(lat, n, axis=0), e], axis=1)
            h, o, c = gen(p, xx, jnp.int32(7), train=True)
            return jnp.sum(jnp.sin(h)) + jnp.sum(o ** 2) + 0.01 * jnp.sum(c ** 2)

        g1 = jax.grad(loss_fac, argnums=(0, 1, 2))(params, latent, emb)
        g2 = jax.grad(loss_gen, argnums=(0, 1, 2))(params, latent, emb)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            scale = float(jnp.abs(b).max()) + 1e-8
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale, atol=1e-4)

    def test_multi_block_scenes(self):
        """bps > 1: per-scene bias accumulation across several grid blocks."""
        ns = NetworkSpecs(dims=(128, 128, 128, 128), dropout=(0, 1),
                          dropout_prob=0.2, norm_layers=(0, 1, 2, 3),
                          latent_in=(2,), num_class=6)
        specs = Specs(model_type="1encoder2decoder", encode_style="both",
                      point_feat_size=9, latent_size=64, network_specs=ns,
                      samples_per_scene=2000)
        dec = make_decoder(specs.model_type, specs.latent_size,
                           specs.point_feat_size, specs.encode_style, ns, False)
        rng = np.random.RandomState(1)
        latent = jnp.asarray(rng.randn(2, 64).astype(np.float32) * 0.5)
        emb = jnp.asarray(rng.randn(2 * 2000, 9).astype(np.float32) * 0.5)
        x = jnp.concatenate([jnp.repeat(latent, 2000, axis=0), emb], axis=1)
        params = dec.init(jax.random.PRNGKey(0), x)["params"]
        # block_cap 512 -> block 400, bps 5: exercises the per-scene bias
        # accumulation ACROSS several revisited grid blocks (the default cap
        # gives block 2000 = one block per scene, bps 1)
        fac = make_fused_train_decoder_factored(specs, interpret=True,
                                                block_cap=512)
        assert fac is not None

        def loss_fac(lat):
            h, o, _ = fac(params, lat, emb, jnp.int32(2), train=True)
            return jnp.sum(h ** 2) + jnp.sum(o ** 2)

        def loss_ref(lat):
            xx = jnp.concatenate([jnp.repeat(lat, 2000, axis=0), emb], axis=1)
            gen = make_fused_train_decoder(specs, block=400, interpret=True)
            h, o, _ = gen(params, xx, jnp.int32(2), train=True)
            return jnp.sum(h ** 2) + jnp.sum(o ** 2)

        v1, g1 = jax.value_and_grad(loss_fac)(latent)
        v2, g2 = jax.value_and_grad(loss_ref)(latent)
        assert abs(float(v1) - float(v2)) / abs(float(v2)) < 1e-5
        scale = float(jnp.abs(g2).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(g1) / scale,
                                   np.asarray(g2) / scale, atol=1e-4)


def test_multi_step_matches_sequential():
    """make_multi_step (lax.scan device-side chaining) produces the same
    final state and per-step losses as sequential train_step calls."""
    from alignsdf_tpu.data.synthetic import synthetic_train_batch
    from alignsdf_tpu.models.alignsdf import build_model
    from alignsdf_tpu.training.train_state import make_optimizer
    from alignsdf_tpu.training.train_step import (init_train_state,
                                                  make_multi_step,
                                                  make_train_step)

    specs = Specs(model_type="1encoder2decoder", encode_style="nerf",
                  point_feat_size=3, latent_size=32, sdf_scale_factor=7.0186,
                  samples_per_scene=16, image_size=(64, 64),
                  network_specs=NS, dataset="obman")
    model = build_model(specs)
    opt = make_optimizer(specs)
    state0 = init_train_state(model, specs, jax.random.PRNGKey(0), opt)
    step = make_train_step(model, specs, opt, None)
    k = 3
    batches = [synthetic_train_batch(specs, 2, seed=s) for s in range(k)]
    rng = jax.random.PRNGKey(7)
    keys = [jax.random.fold_in(rng, j) for j in range(k)]

    st = state0
    seq_losses = []
    for b, key in zip(batches, keys):
        st, losses = jax.jit(step)(st, b, key)
        seq_losses.append(float(losses["total"]))

    stacked = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                           *batches)
    multi = jax.jit(make_multi_step(step, k))
    st2, losses_k = multi(state0, stacked, jnp.stack(keys))
    # scan-compiled vs separately-jitted programs differ at fusion-level
    # rounding only; Adam's 1/sqrt(nu) amplifies that noise on params whose
    # second moment is still tiny after 3 steps, hence the looser param atol
    np.testing.assert_allclose(np.asarray(losses_k["total"]),
                               np.asarray(seq_losses), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_train_step_with_fused_decoder():
    """Integration: the full train step with the decoder override runs and
    reduces the loss."""
    from alignsdf_tpu.data.synthetic import synthetic_train_batch
    from alignsdf_tpu.models.alignsdf import build_model
    from alignsdf_tpu.training.train_state import make_optimizer
    from alignsdf_tpu.training.train_step import (init_train_state,
                                                  make_train_step)

    specs = Specs(model_type="1encoder2decoder", encode_style="both",
                  point_feat_size=9, latent_size=64, sdf_scale_factor=7.0186,
                  samples_per_scene=32, image_size=(64, 64), mano_branch=True,
                  object_pose_branch=True, penetration_loss=True,
                  contact_loss=True, additional_loss_start=1,
                  network_specs=NS, dataset="obman")
    model = build_model(specs)
    opt = make_optimizer(specs)
    state = init_train_state(model, specs, jax.random.PRNGKey(0), opt)
    override = make_fused_train_decoder(specs, block=128, interpret=True)
    step = jax.jit(make_train_step(model, specs, opt, override))
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_train_batch(specs, 2).items()}
    first = None
    for i in range(5):
        state, losses = step(state, batch,
                             jax.random.fold_in(jax.random.PRNGKey(1), i))
        total = float(losses["total"])
        assert np.isfinite(total)
        first = first if first is not None else total
    assert total < first
