"""Fused Pallas decoder kernel vs the XLA flax decoder (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alignsdf_tpu.config import NetworkSpecs, Specs
from alignsdf_tpu.inference.grid import make_grid_evaluator
from alignsdf_tpu.models.decoder import CombinedDecoder, SeparateDecoder
from alignsdf_tpu.ops.decoder_kernel import (
    make_fused_grid_decode_fn,
    make_pallas_decode_fn,
)


def _specs(model_type, encode_style, pfs, use_classifier=False):
    return Specs(
        model_type=model_type,
        encode_style=encode_style,
        point_feat_size=pfs,
        classifier_branch=use_classifier,
        network_specs=NetworkSpecs(),
    )


@pytest.mark.parametrize("encode_style,pfs", [("nerf", 3), ("hand", 51), ("both", 9)])
def test_separate_kernel_matches_flax(encode_style, pfs):
    specs = _specs("1encoder2decoder", encode_style, pfs)
    dec = SeparateDecoder(specs.latent_size, pfs, encode_style, specs.network_specs,
                          use_classifier=False)
    x = np.random.RandomState(0).randn(300, specs.latent_size + pfs).astype(np.float32)
    variables = dec.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref_h, ref_o, _ = dec.apply(variables, jnp.asarray(x))

    decode = make_pallas_decode_fn(specs, block=128, interpret=True)
    k_h, k_o, logits = decode({"decoder_params": variables["params"]}, jnp.asarray(x))
    assert logits is None
    np.testing.assert_allclose(np.asarray(k_h), np.asarray(ref_h), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_o), np.asarray(ref_o), atol=1e-5)


@pytest.mark.parametrize("layout", ["points", "lanes"])
@pytest.mark.parametrize("model_type,use_classifier",
                         [("1encoder2decoder", False), ("1encoder1decoder", True),
                          ("1encoder2decoder", True)])
def test_fused_grid_kernel_matches_generic_path(model_type, use_classifier, layout):
    """The fully fused grid decoder (in-kernel coords + input construction)
    must reproduce the generic embed->concat->decode path bit-for-bit, in both
    kernel data layouts (points-major and lanes-major)."""
    specs = _specs(model_type, "nerf", 3, use_classifier=use_classifier)
    cls = CombinedDecoder if model_type == "1encoder1decoder" else SeparateDecoder
    dec = cls(specs.latent_size, 3, "nerf", specs.network_specs,
              use_classifier=use_classifier)
    v = dec.init(jax.random.PRNGKey(3), jnp.zeros((8, specs.latent_size + 3)))
    latent = jax.random.normal(jax.random.PRNGKey(4), (1, specs.latent_size))
    ctx = {"decoder_params": v["params"], "latent": latent}

    n = 20
    decode = make_pallas_decode_fn(specs, block=128, interpret=True)
    ev_ref = make_grid_evaluator(decode, specs, n, chunk=n ** 3 // 4,
                                 two_pass=True)
    gd = make_fused_grid_decode_fn(specs, n, block=128, interpret=True,
                                   layout=layout)
    assert gd is not None
    ev_fused = make_grid_evaluator(decode, specs, n, chunk=n ** 3 // 4,
                                   two_pass=True, grid_decode_fn=gd)
    r0, r1 = ev_ref(ctx), ev_fused(ctx)
    np.testing.assert_allclose(np.asarray(r0.sdf_hand), np.asarray(r1.sdf_hand),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(r0.sdf_obj), np.asarray(r1.sdf_obj),
                               atol=2e-6)
    np.testing.assert_array_equal(np.asarray(r0.cls), np.asarray(r1.cls))
    np.testing.assert_allclose(np.asarray(r0.origin), np.asarray(r1.origin),
                               atol=2e-6)


def test_fused_grid_decode_fn_gated_by_config():
    # NeRF positional encoding is nonlinear -> generic kernel only
    assert make_fused_grid_decode_fn(
        _specs("1encoder2decoder", "nerf", 51), n=16) is None
    # kinematic styles are affine in xyz -> fusable
    assert make_fused_grid_decode_fn(
        _specs("1encoder2decoder", "both", 9), n=16) is not None


def test_lanes_layout_falls_back_for_wide_classifier():
    """num_class > 6 doesn't fit the lanes-major 8-row output tile; the
    factory must silently route to the points-major kernel instead of
    tripping a shape error at trace time."""
    ns = NetworkSpecs(num_class=8)
    specs = Specs(model_type="1encoder1decoder", encode_style="nerf",
                  point_feat_size=3, classifier_branch=True, network_specs=ns)
    dec = CombinedDecoder(specs.latent_size, 3, "nerf", ns, use_classifier=True)
    v = dec.init(jax.random.PRNGKey(0), jnp.zeros((8, specs.latent_size + 3)))
    ctx = {"decoder_params": v["params"],
           "latent": jax.random.normal(jax.random.PRNGKey(1),
                                       (1, specs.latent_size))}
    n = 12
    decode = make_pallas_decode_fn(specs, block=128, interpret=True)
    ev_ref = make_grid_evaluator(decode, specs, n, chunk=n ** 3 // 4,
                                 two_pass=True)
    gd = make_fused_grid_decode_fn(specs, n, block=128, interpret=True,
                                   layout="lanes")
    assert gd is not None
    ev_fused = make_grid_evaluator(decode, specs, n, chunk=n ** 3 // 4,
                                   two_pass=True, grid_decode_fn=gd)
    r0, r1 = ev_ref(ctx), ev_fused(ctx)
    np.testing.assert_allclose(np.asarray(r0.sdf_hand),
                               np.asarray(r1.sdf_hand), atol=2e-6)
    np.testing.assert_array_equal(np.asarray(r0.cls), np.asarray(r1.cls))


def _random_rigid(rng, batch, count=None):
    shape = (batch, count) if count else (batch,)
    axis = rng.randn(*shape, 3)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.rand(*shape, 1) * 2.0
    from alignsdf_tpu.ops.rotations import batch_rodrigues
    rot = np.asarray(batch_rodrigues(jnp.asarray((axis * angle).reshape(-1, 3))))
    rot = rot.reshape(*shape, 3, 3)
    tf = np.zeros((*shape, 4, 4), np.float32)
    tf[..., :3, :3] = rot
    tf[..., :3, 3] = rng.randn(*shape, 3) * 0.1
    tf[..., 3, 3] = 1.0
    return jnp.asarray(tf)


@pytest.mark.parametrize("layout", ["points", "lanes"])
@pytest.mark.parametrize("encode_style,pfs", [("hand", 6), ("hand", 51),
                                              ("obj", 6), ("both", 9)])
def test_fused_grid_kernel_kinematic_styles(encode_style, pfs, layout):
    """Affine-embedding folding must match the generic kinematic path."""
    specs = _specs("1encoder2decoder", encode_style, pfs)
    dec = SeparateDecoder(specs.latent_size, pfs, encode_style,
                          specs.network_specs, use_classifier=False)
    in_dim = specs.latent_size + pfs
    v = dec.init(jax.random.PRNGKey(5), jnp.zeros((8, in_dim)))
    rng = np.random.RandomState(7)
    ctx = {
        "decoder_params": v["params"],
        "latent": jax.random.normal(jax.random.PRNGKey(6),
                                    (1, specs.latent_size)),
        "rot_center": jnp.asarray(rng.randn(1, 1, 3).astype(np.float32) * 0.05),
        "global_trans": _random_rigid(rng, 1, 16),
        "obj_trans": _random_rigid(rng, 1),
    }

    n = 16
    decode = make_pallas_decode_fn(specs, block=128, interpret=True)
    ev_ref = make_grid_evaluator(decode, specs, n, chunk=n ** 3 // 4,
                                 two_pass=True)
    gd = make_fused_grid_decode_fn(specs, n, block=128, interpret=True,
                                   layout=layout)
    assert gd is not None
    ev_fused = make_grid_evaluator(decode, specs, n, chunk=n ** 3 // 4,
                                   two_pass=True, grid_decode_fn=gd)
    r0, r1 = ev_ref(ctx), ev_fused(ctx)
    np.testing.assert_allclose(np.asarray(r0.sdf_hand), np.asarray(r1.sdf_hand),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(r0.sdf_obj), np.asarray(r1.sdf_obj),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(r0.origin), np.asarray(r1.origin),
                               atol=5e-5)


def test_bf16_fast_path_close_to_f32():
    """The bf16 fast path (opt-in, for grid eval throughput) must stay within
    a small absolute error of the f32 kernel on clamp-range SDF outputs."""
    specs = _specs("1encoder2decoder", "nerf", 3)
    dec = SeparateDecoder(specs.latent_size, 3, "nerf", specs.network_specs,
                          use_classifier=False)
    x = np.random.RandomState(2).randn(512, specs.latent_size + 3).astype(np.float32)
    variables = dec.init(jax.random.PRNGKey(2), jnp.asarray(x))
    ref_h, ref_o, _ = dec.apply(variables, jnp.asarray(x))

    decode = make_pallas_decode_fn(specs, block=128, interpret=True,
                                   dtype=jnp.bfloat16)
    k_h, k_o, _ = decode({"decoder_params": variables["params"]}, jnp.asarray(x))
    err_h = np.abs(np.asarray(k_h) - np.asarray(ref_h)).max()
    err_o = np.abs(np.asarray(k_o) - np.asarray(ref_o)).max()
    # clamp distance is 0.05 (reference specs ClampingDistance); keep the
    # fast path's worst-case error well under a voxel's worth of SDF
    assert err_h < 5e-3 and err_o < 5e-3, (err_h, err_o)


def test_combined_kernel_matches_flax_with_classifier():
    specs = _specs("1encoder1decoder", "nerf", 3, use_classifier=True)
    dec = CombinedDecoder(specs.latent_size, 3, "nerf", specs.network_specs,
                          use_classifier=True)
    x = np.random.RandomState(1).randn(257, specs.latent_size + 3).astype(np.float32)
    variables = dec.init(jax.random.PRNGKey(1), jnp.asarray(x))
    ref_h, ref_o, ref_cls = dec.apply(variables, jnp.asarray(x))

    decode = make_pallas_decode_fn(specs, block=128, interpret=True)
    k_h, k_o, k_cls = decode({"decoder_params": variables["params"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(k_h), np.asarray(ref_h), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_o), np.asarray(ref_o), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_cls), np.asarray(ref_cls), atol=1e-4)
