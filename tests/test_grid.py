"""Sharded grid evaluator: parity with direct dense evaluation on an 8-device
CPU mesh, plus the reference's coarse-to-fine refinement math."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alignsdf_tpu.config import NetworkSpecs, Specs
from alignsdf_tpu.inference.grid import make_grid_evaluator, _coords_from_linear
from alignsdf_tpu.models.decoder import SeparateDecoder
from alignsdf_tpu.parallel.mesh import make_mesh

import oracle

torch = pytest.importorskip("torch")

NS_SMALL = NetworkSpecs(dims=(32, 32, 32, 32), dropout=(), norm_layers=(0, 1, 2, 3),
                        latent_in=(2,))


def _small_specs():
    return Specs(
        model_type="1encoder2decoder", encode_style="nerf", point_feat_size=3,
        latent_size=16, network_specs=NS_SMALL, sdf_scale_factor=7.0,
    )


def _make_decoder(specs):
    dec = SeparateDecoder(specs.latent_size, specs.point_feat_size,
                          specs.encode_style, specs.network_specs, use_classifier=False)
    dummy = jnp.zeros((4, specs.latent_size + specs.point_feat_size))
    variables = dec.init(jax.random.PRNGKey(0), dummy)

    def decode_fn(ctx, inputs):
        h, o, c = dec.apply({"params": ctx["params"]}, inputs)
        return h, o, None

    return dec, variables, decode_fn


def test_coords_match_reference_convention():
    """Index -> coordinate mapping matches reference utils/mesh.py:27-40."""
    n = 8
    idx = jnp.arange(n ** 3, dtype=jnp.int32)
    voxel = jnp.float32(2.0 / (n - 1))
    origin = jnp.full((3,), -1.0, jnp.float32)
    coords = np.asarray(_coords_from_linear(idx, n, origin, voxel))

    overall = torch.arange(0, n ** 3, 1).long()
    samples = torch.zeros(n ** 3, 3)
    samples[:, 2] = overall % n
    samples[:, 1] = (overall // n) % n
    samples[:, 0] = ((overall // n) // n) % n
    samples = samples * float(voxel) - 1.0
    np.testing.assert_allclose(coords, samples.numpy(), atol=1e-6)


def test_sharded_grid_matches_dense_eval():
    specs = _small_specs()
    dec, variables, decode_fn = _make_decoder(specs)
    mesh = make_mesh(8)
    n = 16

    latent = jax.random.normal(jax.random.PRNGKey(1), (1, specs.latent_size))
    ctx = {"params": variables["params"], "latent": latent}

    evaluate = make_grid_evaluator(decode_fn, specs, n, chunk=256, mesh=mesh,
                                   two_pass=False)
    result = evaluate(ctx)

    # dense reference evaluation
    idx = jnp.arange(n ** 3, dtype=jnp.int32)
    pts = _coords_from_linear(idx, n, jnp.full((3,), -1.0), jnp.float32(2.0 / (n - 1)))
    inputs = jnp.concatenate(
        [jnp.broadcast_to(latent, (pts.shape[0], specs.latent_size)), pts], axis=1
    )
    h, o, _ = decode_fn(ctx, inputs)
    np.testing.assert_allclose(
        np.asarray(result.sdf_hand).reshape(-1), np.asarray(h)[:, 0], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(result.sdf_obj).reshape(-1), np.asarray(o)[:, 0], atol=1e-5
    )


def test_fused_kernels_match_xla_on_sharded_mesh():
    """The production multi-chip configuration: the lanes-major fused grid
    kernel (and the pixel-align fused kernel) inside a point-sharded 8-device
    jit must reproduce the XLA decode path's fields."""
    from alignsdf_tpu.ops.decoder_kernel import (
        make_fused_grid_decode_fn,
        make_fused_pixel_grid_decode_fn,
    )

    specs = _small_specs()
    dec, variables, decode_fn = _make_decoder(specs)
    mesh = make_mesh(8)
    n = 16

    latent = jax.random.normal(jax.random.PRNGKey(1), (1, specs.latent_size))
    ctx = {"params": variables["params"],
           "decoder_params": variables["params"], "latent": latent}

    ev_xla = make_grid_evaluator(decode_fn, specs, n, chunk=512, mesh=mesh,
                                 two_pass=True)
    gd = make_fused_grid_decode_fn(specs, n, block=128, interpret=True,
                                   layout="lanes")
    assert gd is not None
    ev_fused = make_grid_evaluator(decode_fn, specs, n, chunk=512, mesh=mesh,
                                   two_pass=True, grid_decode_fn=gd)
    r0, r1 = ev_xla(ctx), ev_fused(ctx)
    np.testing.assert_allclose(np.asarray(r0.sdf_hand),
                               np.asarray(r1.sdf_hand), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r0.sdf_obj),
                               np.asarray(r1.sdf_obj), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r0.origin),
                               np.asarray(r1.origin), atol=2e-5)

    # pixel-align variant on the same mesh
    import dataclasses

    px = dataclasses.replace(specs, pixel_align=True, image_size=(64, 64))
    fmap = jax.random.normal(jax.random.PRNGKey(3),
                             (1, specs.latent_size, 8, 8)) * 0.3
    px_ctx = {
        "params": variables["params"], "decoder_params": variables["params"],
        "latent": fmap,
        "cam_intr": jnp.asarray([[[480.0, 0, 32, 0], [0, 480.0, 32, 0],
                                  [0, 0, 1, 0]]], jnp.float32),
        "pred_root": jnp.asarray([[[0.01, -0.02, 0.6]]]),
    }
    ev_px_xla = make_grid_evaluator(decode_fn, px, n, chunk=512, mesh=mesh,
                                    two_pass=True)
    gd_px = make_fused_pixel_grid_decode_fn(px, n, block=128, interpret=True)
    assert gd_px is not None
    ev_px = make_grid_evaluator(decode_fn, px, n, chunk=512, mesh=mesh,
                                two_pass=True, grid_decode_fn=gd_px)
    r2, r3 = ev_px_xla(px_ctx), ev_px(px_ctx)
    np.testing.assert_allclose(np.asarray(r2.sdf_hand),
                               np.asarray(r3.sdf_hand), atol=5e-5)
    np.testing.assert_allclose(np.asarray(r2.sdf_obj),
                               np.asarray(r3.sdf_obj), atol=5e-5)


def test_refine_cube_matches_reference():
    oracle.setup_reference()
    from utils.mesh import get_higher_res_cube
    from alignsdf_tpu.inference.grid import _refine_cube

    specs = _small_specs()
    n = 16
    rng = np.random.RandomState(0)
    # synthetic fields with a negative blob
    g = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    sdf_hand = (np.sqrt((X - 0.2) ** 2 + Y ** 2 + Z ** 2) - 0.3).astype(np.float32)
    sdf_obj = (np.sqrt(X ** 2 + (Y + 0.1) ** 2 + Z ** 2) - 0.25).astype(np.float32)

    voxel = 2.0 / (n - 1)
    t_voxel, t_origin = get_higher_res_cube(
        True, True, torch.from_numpy(sdf_hand), torch.from_numpy(sdf_obj),
        n, [-1, -1, -1], voxel,
    )
    j_voxel, j_origin = _refine_cube(
        specs, jnp.asarray(sdf_hand), jnp.asarray(sdf_obj), n, jnp.float32(voxel)
    )
    np.testing.assert_allclose(float(j_voxel), float(t_voxel), atol=1e-6)
    np.testing.assert_allclose(np.asarray(j_origin), t_origin.numpy(), atol=1e-6)


def test_banded_pixel_grid_matches_full():
    """The banded sampling contraction (ops/decoder_kernel, band=...) must be
    bit-exact vs the full contraction — both when the per-block row bound
    FITS (geometry chosen so band=32 holds at n=32: long focal ratio, far
    root) and when it falls back (near root puts the camera plane's
    influence inside the grid / spans exceed the band)."""
    import dataclasses

    from alignsdf_tpu.ops.decoder_kernel import (
        branch_columns,
        build_pixel_grid_branch_plan,
        make_fused_pixel_grid_decode_fn,
        make_fused_pixel_grid_kernel_t,
    )

    specs = dataclasses.replace(_small_specs(), pixel_align=True)
    dec, variables, decode_fn = _make_decoder(specs)
    n = 32
    hf = wf = 64
    rng = np.random.RandomState(3)
    fmap = jnp.asarray(
        rng.randn(1, specs.latent_size, hf, wf).astype(np.float32) * 0.3)

    def fields(band, root_z):
        ctx = {
            "params": variables["params"],
            "decoder_params": variables["params"], "latent": fmap,
            "cam_intr": jnp.asarray([[[150.0, 0, 128, 0], [0, 150.0, 128, 0],
                                      [0, 0, 1, 0]]], jnp.float32),
            "pred_root": jnp.asarray([[[0.01, -0.02, root_z]]]),
        }
        gd = make_fused_pixel_grid_decode_fn(specs, n, block=128,
                                             interpret=True, band=band)
        ev = make_grid_evaluator(decode_fn, specs, n, chunk=n ** 3, mesh=None,
                                 two_pass=True, grid_decode_fn=gd)
        r = ev(ctx)
        return np.asarray(r.sdf_hand), np.asarray(r.sdf_obj)

    # the fitting geometry really is banded (non-vacuous): probe the plan
    cols_h, _ = branch_columns(specs)
    plan = build_pixel_grid_branch_plan(
        variables["params"]["hand"], "linh", specs.latent_size,
        jnp.eye(3), jnp.zeros((3,)), specs.network_specs, 1)
    proj = jnp.concatenate([
        jnp.eye(3).reshape(9), jnp.zeros(3),
        jnp.asarray([[150.0, 0, 128], [0, 150.0, 128], [0, 0, 1]]).reshape(9),
        jnp.asarray([0.01, -0.02, 1.2]),
        jnp.asarray([2.0 / specs.sdf_scale_factor, (wf - 1) / 256.0,
                     (hf - 1) / 256.0, 256.0], jnp.float32)])
    probe = make_fused_pixel_grid_kernel_t(
        plan, None, None, jnp.zeros((128, hf * wf + 128)), (hf, wf), proj, n,
        block=128, interpret=True, band=32)
    rlo, fits = probe.band_plan(jnp.full((3,), -1.0, jnp.float32),
                                jnp.float32(2.0 / (n - 1)), jnp.int32(0),
                                n ** 3)
    assert bool(fits)
    assert len(np.unique(np.asarray(rlo))) > 1  # real per-block banding

    for root_z in (1.2, 0.18):   # fitting / forced-fallback
        h_full, o_full = fields(None, root_z)
        h_band, o_band = fields(32, root_z)
        assert np.abs(h_band - h_full).max() == 0.0
        assert np.abs(o_band - o_full).max() == 0.0
        assert np.abs(h_full).max() > 0


def test_two_pass_grid_runs_and_refines():
    specs = _small_specs()
    dec, variables, decode_fn = _make_decoder(specs)
    n = 16
    latent = jax.random.normal(jax.random.PRNGKey(2), (1, specs.latent_size))
    ctx = {"params": variables["params"], "latent": latent}
    evaluate = make_grid_evaluator(decode_fn, specs, n, chunk=512, mesh=None,
                                   two_pass=True)
    result = evaluate(ctx)
    assert result.sdf_hand.shape == (n, n, n)
    assert np.isfinite(np.asarray(result.sdf_hand)).all()
    assert float(result.voxel_size) > 0
