"""Fused pixel-align train decoder (ops/decoder_train_pixel): forward parity
with the XLA pixel path (pixel_alignment + decoder apply), custom-VJP
gradient checks against XLA autodiff of the same math — including the
feature-map and pixel-coordinate (-> MANO-root) cotangents the kernel emits —
and the full train-step integration.

Shapes are kept small for CPU interpret mode (Hf=Wf=8, C=ls=32); the block
divides samples_per_scene so scene bands cover several grid blocks (bps>1),
exercising the per-scene feature-table accumulation.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alignsdf_tpu.config import NetworkSpecs, Specs
from alignsdf_tpu.models.decoder import make_decoder
from alignsdf_tpu.ops.decoder_train_pixel import (
    _keys_cubic_grad,
    make_fused_train_decoder_pixel,
)
from alignsdf_tpu.ops.geometry import pixel_alignment

NS = NetworkSpecs(dims=(96, 96, 96, 96), dropout=(0, 1, 2, 3),
                  dropout_prob=0.2, norm_layers=(0, 1, 2, 3), latent_in=(2,),
                  num_class=6)
B, N = 2, 96       # block 48 -> bps 2 (scene bands span 2 grid blocks)
HF = WF = 8
LS = 32


def _specs(**kw):
    base = dict(model_type="1encoder2decoder", encode_style="both",
                point_feat_size=9, latent_size=LS, network_specs=NS,
                pixel_align=True, samples_per_scene=N,
                sdf_scale_factor=7.0186, image_size=(64, 64),
                classifier_branch=True)
    base.update(kw)
    return Specs(**base)


@pytest.fixture(scope="module")
def setup():
    specs = _specs()
    dec = make_decoder(specs.model_type, specs.latent_size,
                       specs.point_feat_size, specs.encode_style, NS,
                       specs.classifier_branch)
    rng = np.random.RandomState(0)
    x_dummy = jnp.zeros((8, LS + 9))
    params = dec.init(jax.random.PRNGKey(0), x_dummy)["params"]
    fmap = jnp.asarray(rng.randn(B, HF, WF, LS).astype(np.float32) * 0.5)
    emb = jnp.asarray(rng.randn(B * N, 9).astype(np.float32) * 0.5)
    # xyz spread so some points project out of image (mean-fallback exercised)
    xyz = jnp.asarray(rng.randn(B * N, 3).astype(np.float32) * 1.5)
    cam = np.zeros((B, 3, 4), np.float32)
    cam[:, 0, 0] = cam[:, 1, 1] = 80.0
    cam[:, 0, 2] = cam[:, 1, 2] = 32.0
    cam[:, 2, 2] = 1.0
    cam_intr = jnp.asarray(cam)
    root = np.tile(np.asarray([0.02, -0.01, 0.55], np.float32), (B, 1, 1))
    pred_root = jnp.asarray(root)
    fused = make_fused_train_decoder_pixel(specs, interpret=True, block_cap=48)
    assert fused is not None and fused.pixel and fused.block == 48
    return specs, dec, params, fmap, emb, xyz, cam_intr, pred_root, fused


def _xla_pixel_forward(specs, dec, params, fmap, emb, xyz, cam_intr,
                       pred_root, train=False, rng=None):
    """The reference-parity XLA path: pixel_alignment + decoder apply
    (models/alignsdf.decoder_inputs with the encoder factored out)."""
    latent = pixel_alignment(
        fmap.transpose(0, 3, 1, 2).astype(jnp.float32), xyz, cam_intr,
        pred_root, specs.image_size[0], specs.sdf_scale_factor)
    inputs = jnp.concatenate([latent, emb], axis=1)
    return dec.apply({"params": params}, inputs, train=train,
                     dropout_rng=rng)


def test_eval_forward_matches_xla(setup):
    specs, dec, params, fmap, emb, xyz, cam_intr, pred_root, fused = setup
    h1, o1, c1 = _xla_pixel_forward(specs, dec, params, fmap, emb, xyz,
                                    cam_intr, pred_root)
    # fused decode returns 1-D sdf columns (lanes-major y rows)
    h2, o2, c2 = fused(params, fmap, emb, xyz, cam_intr, pred_root,
                       jnp.int32(3), train=False)
    assert h2.ndim == 1 and o2.ndim == 1
    np.testing.assert_allclose(np.asarray(h1).ravel(), np.asarray(h2),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(o1).ravel(), np.asarray(o2),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)


def test_mean_fallback_points_present(setup):
    """The fixture's point spread must actually exercise both the in-image
    and the out-of-image (mean fallback) paths, else the parity above is
    vacuous for the fallback column."""
    specs, _, _, _, _, xyz, cam_intr, pred_root, _ = setup
    xyz_cam = (xyz.reshape(B, N, 3) * (2.0 / specs.sdf_scale_factor)
               + pred_root)
    hom = jnp.einsum("bij,bnj->bni", cam_intr[:, :3, :3], xyz_cam)
    xi = hom[..., 0] / hom[..., 2]
    yi = hom[..., 1] / hom[..., 2]
    sz = specs.image_size[0]
    inside = (xi >= 0) & (xi <= sz) & (yi >= 0) & (yi <= sz)
    n_in = int(jnp.sum(inside))
    assert 0 < n_in < B * N, n_in


def test_grads_match_xla_autodiff(setup):
    """d(params)/d(fmap)/d(pred_root)/d(emb) from the custom VJP vs XLA
    autodiff of the identical math (dropout off: the streams differ)."""
    specs, dec, params, fmap, emb, xyz, cam_intr, pred_root, fused = setup

    def loss_fused(p, fm, e, root):
        h, o, c = fused(p, fm, e, xyz, cam_intr, root, jnp.int32(3),
                        train=False)
        return (jnp.sum(jnp.sin(h)) + jnp.sum(o ** 2)
                + 0.01 * jnp.sum(c ** 2))

    def loss_xla(p, fm, e, root):
        h, o, c = _xla_pixel_forward(specs, dec, p, fm, e, xyz, cam_intr,
                                     root)
        return (jnp.sum(jnp.sin(h)) + jnp.sum(o ** 2)
                + 0.01 * jnp.sum(c ** 2))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(params, fmap, emb,
                                                    pred_root)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(params, fmap, emb,
                                                  pred_root)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        scale = float(jnp.abs(b).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-5)


def test_directional_derivative_with_active_dropout(setup):
    """Finite differences vs the custom VJP in train mode (masks are a pure
    function of seed/position, so FD remains valid).  Only the feature-map
    direction is FD-checked: along the root direction every pixel coordinate
    shifts at once, crossing many ReLU/dropout kinks, and the directional
    derivative is too small for a stable f32 quotient — the root cotangent is
    instead certified against XLA autodiff in test_grads_match_xla_autodiff
    (exact same math, dropout off)."""
    specs, dec, params, fmap, emb, xyz, cam_intr, pred_root, fused = setup

    def f(fm):
        h, o, c = fused(params, fm, emb, xyz, cam_intr, pred_root,
                        jnp.int32(11), train=True)
        return jnp.sum(jnp.sin(h)) + jnp.sum(o ** 2) + 0.01 * jnp.sum(c ** 2)

    vf = jax.random.normal(jax.random.PRNGKey(5), fmap.shape)
    eps = 1e-3
    fd = float((f(fmap + eps * vf) - f(fmap - eps * vf)) / (2 * eps))
    gd = float(jnp.vdot(jax.grad(f)(fmap), vf))
    assert abs(fd - gd) / max(abs(fd), 1e-9) < 0.03


def test_dropout_streams_decorrelated_between_trunks(setup):
    """Dropout is active in train mode, and the obj trunk hashes layer
    indices offset by n_layers, so its gate stream differs from the hand
    trunk's at the same (seed, layer): mask agreement must sit at the
    independent-streams level p^2+(1-p)^2 = 0.68, not 1."""
    from alignsdf_tpu.ops.decoder_train_kernel import _dropout_gate

    specs, dec, params, fmap, emb, xyz, cam_intr, pred_root, fused = setup
    h_ev, o_ev, _ = fused(params, fmap, emb, xyz, cam_intr, pred_root,
                          jnp.int32(3), train=False)
    h_tr, o_tr, _ = fused(params, fmap, emb, xyz, cam_intr, pred_root,
                          jnp.int32(3), train=True)
    assert float(jnp.abs(h_tr - h_ev).max()) > 1e-6
    assert float(jnp.abs(o_tr - o_ev).max()) > 1e-6
    n_layers = len(NS.dims) + 1
    g_h = _dropout_gate(jnp.uint32(3), 0, 256, 256, 0.8, jnp.int32(0))
    g_o = _dropout_gate(jnp.uint32(3), n_layers, 256, 256, 0.8, jnp.int32(0))
    agree = float(jnp.mean((g_h > 0) == (g_o > 0)))
    assert abs(agree - 0.68) < 0.02


def test_keys_cubic_grad_matches_fd():
    from alignsdf_tpu.ops.decoder_kernel import _keys_cubic

    rng = np.random.default_rng(0)
    t = rng.uniform(-2.5, 2.5, 512)
    # keep FD stencils away from the C1 joints at |t| in {1, 2} (the
    # derivative is continuous there but the quadratic FD term jumps)
    eps = 1e-3
    t = t[(np.abs(np.abs(t) - 1.0) > 2 * eps)
          & (np.abs(np.abs(t) - 2.0) > 2 * eps)]
    t = jnp.asarray(t, jnp.float32)
    fd = (_keys_cubic(t + eps) - _keys_cubic(t - eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(_keys_cubic_grad(t)),
                               np.asarray(fd), atol=5e-3)


def test_combined_decoder(setup):
    specs = _specs(model_type="1encoder1decoder", encode_style="nerf",
                   point_feat_size=9)
    dec = make_decoder(specs.model_type, specs.latent_size,
                       specs.point_feat_size, specs.encode_style, NS,
                       specs.classifier_branch)
    _, _, params0, fmap, emb, xyz, cam_intr, pred_root, _ = setup
    params = dec.init(jax.random.PRNGKey(0), jnp.zeros((8, LS + 9)))["params"]
    fused = make_fused_train_decoder_pixel(specs, interpret=True,
                                           block_cap=48)
    assert fused is not None
    h1, o1, c1 = _xla_pixel_forward(specs, dec, params, fmap, emb, xyz,
                                    cam_intr, pred_root)
    h2, o2, c2 = fused(params, fmap, emb, xyz, cam_intr, pred_root,
                       jnp.int32(3), train=False)
    np.testing.assert_allclose(np.asarray(h1).ravel(), np.asarray(h2),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(o1).ravel(), np.asarray(o2),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)


def test_banded_train_kernel_matches_full():
    """Banded sampling contraction (band=...): per-scene points sorted by
    feature row, blocks contract only a row band.  Forward must match the
    unbanded kernel exactly (per-point term order unchanged; excluded rows
    carry zero Keys weights), gradients must match XLA autodiff of the same
    math; both for a tight point cluster (fits) and a wide spread
    (runtime fallback)."""
    hf = wf = 16
    specs = _specs(image_size=(64, 64))
    dec = make_decoder(specs.model_type, specs.latent_size,
                       specs.point_feat_size, specs.encode_style, NS,
                       specs.classifier_branch)
    rng = np.random.RandomState(1)
    params = dec.init(jax.random.PRNGKey(0), jnp.zeros((8, LS + 9)))["params"]
    fmap = jnp.asarray(rng.randn(B, hf, wf, LS).astype(np.float32) * 0.5)
    emb = jnp.asarray(rng.randn(B * N, 9).astype(np.float32) * 0.5)
    cam = np.zeros((B, 3, 4), np.float32)
    cam[:, 0, 0] = cam[:, 1, 1] = 80.0
    cam[:, 0, 2] = cam[:, 1, 2] = 32.0
    cam[:, 2, 2] = 1.0
    cam_intr = jnp.asarray(cam)
    pred_root = jnp.asarray(
        np.tile(np.asarray([0.02, -0.01, 0.55], np.float32), (B, 1, 1)))

    full = make_fused_train_decoder_pixel(specs, interpret=True,
                                          block_cap=48, band=None)
    banded = make_fused_train_decoder_pixel(specs, interpret=True,
                                            block_cap=48, band=hf // 2)
    assert banded.band == hf // 2 and banded.block == 48  # bps = 2

    # tight cluster (fits): most points a few rows apart, a handful far
    # out of image to exercise the mean fallback inside the banded path
    xyz_np = rng.randn(B * N, 3).astype(np.float32) * 0.1
    xyz_np[::17] *= 40.0
    for xyz in (jnp.asarray(xyz_np),
                jnp.asarray(rng.randn(B * N, 3).astype(np.float32) * 1.5)):
        h1, o1, c1 = full(params, fmap, emb, xyz, cam_intr, pred_root,
                          jnp.int32(3), train=False)
        h2, o2, c2 = banded(params, fmap, emb, xyz, cam_intr, pred_root,
                            jnp.int32(3), train=False)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-7)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-7)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)

        def loss_banded(p, fm, e, root):
            h, o, c = banded(p, fm, e, xyz, cam_intr, root, jnp.int32(3),
                             train=False)
            return (jnp.sum(jnp.sin(h)) + jnp.sum(o ** 2)
                    + 0.01 * jnp.sum(c ** 2))

        def loss_xla(p, fm, e, root):
            h, o, c = _xla_pixel_forward(specs, dec, p, fm, e, xyz,
                                         cam_intr, root)
            return (jnp.sum(jnp.sin(h)) + jnp.sum(o ** 2)
                    + 0.01 * jnp.sum(c ** 2))

        g1 = jax.grad(loss_banded, argnums=(0, 1, 2, 3))(
            params, fmap, emb, pred_root)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(
            params, fmap, emb, pred_root)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            scale = float(jnp.abs(b).max()) + 1e-8
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale, atol=2e-5)

    # active dropout: FD along the feature-map direction through the banded
    # (sorted) path
    xyz = jnp.asarray(xyz_np)

    def f(fm):
        h, o, c = banded(params, fm, emb, xyz, cam_intr, pred_root,
                         jnp.int32(11), train=True)
        return jnp.sum(jnp.sin(h)) + jnp.sum(o ** 2) + 0.01 * jnp.sum(c ** 2)

    vf = jax.random.normal(jax.random.PRNGKey(5), fmap.shape)
    eps = 1e-3
    fd = float((f(fmap + eps * vf) - f(fmap - eps * vf)) / (2 * eps))
    gd = float(jnp.vdot(jax.grad(f)(fmap), vf))
    assert abs(fd - gd) / max(abs(fd), 1e-9) < 0.03


def test_banded_fits_is_nonvacuous():
    """The tight-cluster geometry above must actually take the banded branch
    (fits=True for every scene block) — probe the bound math directly."""
    hf = wf = 16
    specs = _specs(image_size=(64, 64))
    rng = np.random.RandomState(1)
    xyz = rng.randn(B * N, 3).astype(np.float32) * 0.1
    xyz[::17] *= 40.0
    root = np.asarray([0.02, -0.01, 0.55], np.float32)
    s2 = 2.0 / specs.sdf_scale_factor
    cam_f = 80.0
    xyz_cam = xyz.reshape(B, N, 3) * s2 + root
    xi = cam_f * xyz_cam[..., 0] / xyz_cam[..., 2] + 32.0
    yi = cam_f * xyz_cam[..., 1] / xyz_cam[..., 2] + 32.0
    inside = (xi >= 0) & (xi <= 64) & (yi >= 0) & (yi <= 64)
    yp = (yi / 64.0) * (hf - 1)
    block, band = 48, hf // 2
    spans = []
    for b_ in range(B):
        order = np.argsort(np.where(inside[b_], yp[b_], 1e9))
        ys = np.where(inside[b_], yp[b_], 1e9)[order]
        for k in range(N // block):
            blk = ys[k * block:(k + 1) * block]
            blk = blk[blk < 1e8]
            if len(blk):
                spans.append(np.floor(blk.max()) + 2 - (np.floor(blk.min()) - 1))
    assert spans and max(spans) < band, (max(spans), band)


def test_host_sorted_presorted_band_matches_xla():
    """The production banding pipeline: the HOST orders each scene-half by
    approximate projected row (data/pixel_sort), the kernel runs with
    band=...,presorted=True (no device sort/permutation).  Forward and
    gradients must match XLA autodiff on the SAME sorted inputs; the sorted
    geometry must actually fit the band (non-vacuous); per-point columns
    must travel with their points through the host sort."""
    from alignsdf_tpu.data.pixel_sort import (
        pixel_row_order,
        pixel_row_sort_batch,
    )

    hf = wf = 16
    specs = _specs(image_size=(64, 64))
    dec = make_decoder(specs.model_type, specs.latent_size,
                       specs.point_feat_size, specs.encode_style, NS,
                       specs.classifier_branch)
    rng = np.random.RandomState(2)
    params = dec.init(jax.random.PRNGKey(0), jnp.zeros((8, LS + 9)))["params"]
    fmap = jnp.asarray(rng.randn(B, hf, wf, LS).astype(np.float32) * 0.5)
    cam = np.zeros((B, 3, 4), np.float32)
    cam[:, 0, 0] = cam[:, 1, 1] = 80.0
    cam[:, 0, 2] = cam[:, 1, 2] = 32.0
    cam[:, 2, 2] = 1.0
    root = np.tile(np.asarray([0.02, -0.01, 0.55], np.float32), (B, 1))

    # tight cluster + a few out-of-image points, as a loader batch
    xyz_np = rng.randn(B * N, 3).astype(np.float32) * 0.1
    xyz_np[::17] *= 40.0
    batch = {
        "xyz": xyz_np,
        "sdf_gt_hand": xyz_np[:, :1].copy(),    # sentinel: must follow xyz
        "sdf_gt_obj": xyz_np[:, 1:2].copy(),
        "labels": np.arange(B * N, dtype=np.int32),
        "cam_intr": cam,
        "mano_root": root,
    }
    sb = pixel_row_sort_batch(batch, 64.0, specs.sdf_scale_factor,
                              feat_rows=hf)
    # columns traveled with their points; scenes never mix; the explicit
    # hand indicator replaces the positional halves
    assert np.array_equal(sb["sdf_gt_hand"][:, 0], sb["xyz"][:, 0])
    assert np.array_equal(sb["sdf_gt_obj"][:, 0], sb["xyz"][:, 1])
    half = N // 2
    for s in range(B):
        lab = sb["labels"][s * N:(s + 1) * N]
        assert set(lab) == set(range(s * N, (s + 1) * N))
        hand_pts = sb["point_is_hand"][s * N:(s + 1) * N] > 0.5
        assert hand_pts.sum() == half
        # indicator marks exactly the points that came from the hand half
        assert set(lab[hand_pts]) == set(range(s * N, s * N + half))

    # in-image points sorted ascending by approximate row
    p0 = pixel_row_order(xyz_np[:N], cam[0], root[0], 64.0,
                         specs.sdf_scale_factor, hf)
    assert np.array_equal(np.sort(p0), np.arange(N))

    # is_hand-driven masks == positional masks, permuted identically
    from alignsdf_tpu.training.train_step import build_batch_masks

    mh_pos, mo_pos = build_batch_masks(specs, B, 0.0)
    mh_ind, mo_ind = build_batch_masks(
        specs, B, 0.0, jnp.asarray(sb["point_is_hand"]))
    perm_full = np.concatenate(
        [s * N + pixel_row_order(xyz_np[s * N:(s + 1) * N], cam[s], root[s],
                                 64.0, specs.sdf_scale_factor, hf)
         for s in range(B)])
    np.testing.assert_array_equal(np.asarray(mh_pos)[perm_full],
                                  np.asarray(mh_ind))
    np.testing.assert_array_equal(np.asarray(mo_pos)[perm_full],
                                  np.asarray(mo_ind))

    emb = jnp.asarray(rng.randn(B * N, 9).astype(np.float32) * 0.5)
    xyz_s = jnp.asarray(sb["xyz"])
    cam_j = jnp.asarray(cam)
    root_j = jnp.asarray(root.reshape(B, 1, 3))

    fused = make_fused_train_decoder_pixel(specs, interpret=True,
                                           block_cap=48, band=12,
                                           presorted=True)

    def loss_fused(p, fm, e, r):
        h, o, c = fused(p, fm, e, xyz_s, cam_j, r, jnp.int32(3), train=False)
        return (jnp.sum(jnp.sin(h)) + jnp.sum(o ** 2)
                + 0.01 * jnp.sum(c ** 2))

    def loss_xla(p, fm, e, r):
        h, o, c = _xla_pixel_forward(specs, dec, p, fm, e, xyz_s, cam_j, r)
        return (jnp.sum(jnp.sin(h)) + jnp.sum(o ** 2)
                + 0.01 * jnp.sum(c ** 2))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(params, fmap, emb, root_j)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(params, fmap, emb, root_j)
    for a, bb in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        scale = float(jnp.abs(bb).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(bb) / scale, atol=2e-5)

    # non-vacuous: the sorted blocks really fit the band (replicate bounds)
    s2 = 2.0 / specs.sdf_scale_factor
    xyz_cam = np.asarray(sb["xyz"]).reshape(B, N, 3) * s2 + \
        root.reshape(B, 1, 3)
    xi = 80.0 * xyz_cam[..., 0] / xyz_cam[..., 2] + 32.0
    yi = 80.0 * xyz_cam[..., 1] / xyz_cam[..., 2] + 32.0
    inside = (xi >= 0) & (xi <= 64) & (yi >= 0) & (yi <= 64)
    yp = (yi / 64.0) * (hf - 1)
    block, band = 48, 12
    for s in range(B):
        key = np.where(inside[s], yp[s], 1e9)
        for k in range(N // block):
            blk = key[k * block:(k + 1) * block]
            blk = blk[blk < 1e8]
            if len(blk):
                span = np.floor(blk.max()) + 2 - (np.floor(blk.min()) - 1) + 1
                assert span <= band, (s, k, span)


def test_train_step_with_pixel_decoder():
    """Integration: the full train step with the pixel decoder override runs,
    reduces the loss, and matches the XLA train step's loss exactly when
    dropout is off (identical math, no RNG-stream difference)."""
    from alignsdf_tpu.data.synthetic import synthetic_train_batch
    from alignsdf_tpu.models.alignsdf import build_model
    from alignsdf_tpu.training.train_state import make_optimizer
    from alignsdf_tpu.training.train_step import (init_train_state,
                                                  make_train_step)

    # latent_size 256 = the HeadNet channel count (pixel-align configs pin
    # this, reference experiments PixelAlign + LatentSize 256); hidden dims
    # must exceed latent+embed for the latent_in re-injection layer
    ns = dataclasses.replace(NS, dims=(320, 320, 320, 320), dropout=())
    specs = Specs(model_type="1encoder2decoder", encode_style="both",
                  point_feat_size=9, latent_size=256,
                  sdf_scale_factor=7.0186, samples_per_scene=32,
                  image_size=(64, 64), mano_branch=True,
                  object_pose_branch=True, pixel_align=True,
                  penetration_loss=True, contact_loss=True,
                  additional_loss_start=1, network_specs=ns, dataset="obman")
    model = build_model(specs)
    opt = make_optimizer(specs)
    state = init_train_state(model, specs, jax.random.PRNGKey(0), opt)
    override = make_fused_train_decoder_pixel(specs, interpret=True,
                                              block_cap=32)
    assert override is not None
    step_px = jax.jit(make_train_step(model, specs, opt, override))
    step_xla = jax.jit(make_train_step(model, specs, opt, None))
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_train_batch(specs, 2).items()}

    s1, l1 = step_px(state, batch, jax.random.PRNGKey(1))
    s2, l2 = step_xla(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(l1["total"]), float(l2["total"]),
                               rtol=2e-5)

    first = None
    for i in range(5):
        state, losses = step_px(state, batch,
                                jax.random.fold_in(jax.random.PRNGKey(1), i))
        total = float(losses["total"])
        assert np.isfinite(total)
        first = first if first is not None else total
    assert total < first
