"""Fused Pallas TRAIN decoder for pixel-aligned configs.

Pixel-aligned latents (reference utils/utils.py:536-558 pixel_alignment inside
the train loop train.py:464-626) are per-POINT: each query point bicubically
samples a (C, Hf, Wf) HeadNet feature map at its camera projection, with an
out-of-image fallback to the map's mean feature.  The XLA path materializes
the (M, C) latents plus (M, C+pfs) decoder inputs in HBM and pays the einsum
VJP's weight-tensor traffic; this kernel instead computes the latent INSIDE
the decoder kernel with the bicubic-as-matmul trick proven by the inference
pixel kernel (ops/decoder_kernel.make_fused_pixel_grid_kernel_t):

  * the Keys cubic's (-2, 2) support means evaluating K(col - x_pix) for ALL
    Hf/Wf rows/columns yields exactly the 4 tap weights per axis; the
    separable (HW, BLK) weight tile never leaves VMEM, and the mean-feature
    fallback enters as a separate (8, BLK) selector against a (B, 8, C_pad)
    mean operand (no extended table is ever concatenated on the XLA side);
  * latent = wxy^T @ feT + mrow8^T @ mean8 — MXU matmuls per block against
    the scene's (HW, C_pad) flattened feature map (a reshape of the NHWC
    HeadNet output, DMA'd per scene group of blocks);
  * backward re-derives the weight tile and emits four cotangents the XLA
    side finishes off: d(feature map) as a per-scene (HW, C_pad) table
    (dfeT = wxy @ dlat) plus d(mean), d(pixel coords) via the Keys-cubic
    derivative (factorized separably, flowing to the predicted MANO root
    through the projection), and d(embedding columns);
  * the trunk chain (both branches + classifier input) is the proven
    points-major train-kernel structure: residual GATED activations stored
    (the combined ReLU/dropout gate is recovered exactly as (acts > 0)/keep
    — no gate-PRNG replay in backward), dW/db accumulated in VMEM across
    the sequential grid.

Both trunks run in ONE kernel so the bicubic matmuls (the expensive part:
~(HW+128) x C per point per matmul) are paid once, not per branch.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alignsdf_tpu.config import Specs
from alignsdf_tpu.ops.decoder_kernel import (
    _keys_cubic,
    _round_up,
    branch_columns,
    build_branch_plan,
)
from alignsdf_tpu.ops.decoder_train_kernel import (
    _dropout_gate,
    _lm_blocks,
    _lm_unblocks,
    _scene_block,
    _vmem_kwargs,
)


def _keys_cubic_grad(t: jax.Array) -> jax.Array:
    """d/dt of the Keys cubic (A=-0.75), continuous at |t|=1 and 2."""
    a = -0.75
    s = jnp.abs(t)
    near = 3.0 * (a + 2.0) * s * s - 2.0 * (a + 3.0) * s
    far = a * ((3.0 * s - 10.0) * s + 8.0)
    mag = jnp.where(s <= 1.0, near, jnp.where(s < 2.0, far, 0.0))
    return jnp.sign(t) * mag


def _sels(static, trunks):
    """Output-selection one-hots: sel_h embeds the hand trunk's live output
    columns into y rows 0..out_h-1; sel_o the obj trunk's column into row 1."""
    h_last = trunks[0].biases[-1].shape[1]
    out_h = 2 if static.combined else 1
    sel_h = jnp.zeros((8, h_last), jnp.float32)
    sel_h = sel_h.at[jnp.arange(out_h), jnp.arange(out_h)].set(1.0)
    sels = [sel_h]
    if static.has_obj:
        h_last_o = trunks[1].biases[-1].shape[1]
        sels.append(jnp.zeros((8, h_last_o), jnp.float32).at[1, 0].set(1.0))
    return sels


class PixelStatic(NamedTuple):
    """Hashable static config for the pixel train kernel pair."""

    n_layers: int
    inject_p: Tuple[bool, ...]   # layers (>=1) that re-inject [lat, emb]
    dropout_p: Tuple[bool, ...]
    keep: float
    block: int
    cdtype: str
    train: bool
    interpret: bool
    need_xlast: bool
    bps: int                     # blocks per scene
    hf: int
    wf: int
    combined: bool
    has_obj: bool
    band: Optional[int] = None   # banded sampling contraction rows (or None)


class PixelTrunk(NamedTuple):
    """One trunk's kernel operands (pytree; None entries are empty subtrees).

    wx[l]    (h_{l-1}_pad, h_l_pad) main-path weights, None at layer 0;
    wlat[l]  (C_pad, h_l_pad) latent columns at x0-consuming layers else None;
    wemb[l]  (emb_pad, h_l_pad) embedding columns likewise;
    biases[l] (1, h_l_pad).
    """

    wx: Tuple[Optional[jax.Array], ...]
    wlat: Tuple[Optional[jax.Array], ...]
    wemb: Tuple[Optional[jax.Array], ...]
    biases: Tuple[jax.Array, ...]


def _x0_layers(static: PixelStatic) -> Tuple[bool, ...]:
    return tuple(l == 0 or static.inject_p[l] for l in range(static.n_layers))


def _split_trunk_refs(static: PixelStatic, refs, trunk: PixelTrunk):
    """Pop one trunk's refs off the flat list, mirroring _flatten_trunk."""
    out_wx, out_wlat, out_wemb = [], [], []
    for kind, src, dst in (("wx", trunk.wx, out_wx),
                           ("wlat", trunk.wlat, out_wlat),
                           ("wemb", trunk.wemb, out_wemb)):
        for w in src:
            if w is None:
                dst.append(None)
            else:
                dst.append(refs[0])
                refs = refs[1:]
    bs, refs = refs[:static.n_layers], refs[static.n_layers:]
    return (out_wx, out_wlat, out_wemb, list(bs)), refs


def _flatten_trunk(trunk: PixelTrunk):
    ops = [w for w in trunk.wx if w is not None]
    ops += [w for w in trunk.wlat if w is not None]
    ops += [w for w in trunk.wemb if w is not None]
    ops += list(trunk.biases)
    return ops


def _weight_tile(static: PixelStatic, xp, yp, mask, dtype, r0=None):
    """The (HW, BLK) separable bicubic weight tile plus the (8, BLK)
    mean-fallback selector (row 0 = 1-mask): the feature map and its mean
    stay SEPARATE kernel operands, so the XLA side never concatenates a
    (B, HW+128, C) extended table per step (the concat + layout copies of
    that table cost ~5 ms/step at b64, xplane r5).  lat = wxy^T f + mrow8^T
    mean8 is bit-exact vs the old fused table: for in-image points row 0 of
    mrow8 is 0 (second term contributes exact +0), for out-of-image points
    every masked kx tap is 0 (first term accumulates exact 0.0).

    The 0/1 mask is folded into the 1-D kx taps BEFORE the outer product —
    bit-exact (a*1 = a, anything*0 = 0 for finite taps) and saves the
    (HW, BLK) mask multiply on the dense tile.  The returned kx is therefore
    already masked (the backward's dyp factorization relies on this).

    With ``r0`` (banded mode, static.band set) the row axis covers only
    rows [r0, r0 + band): the caller sorted each scene's points by yp, so a
    block's bicubic taps all land in that window and excluded rows carry
    exactly-zero Keys weights."""
    hf, wf, block = static.hf, static.wf, static.block
    rows = hf if r0 is None else static.band
    cxi = jax.lax.broadcasted_iota(jnp.int32, (wf, block), 0).astype(
        jnp.float32)
    cyi = jax.lax.broadcasted_iota(jnp.int32, (rows, block), 0)
    if r0 is not None:
        cyi = cyi + r0
    cyi = cyi.astype(jnp.float32)
    kx = _keys_cubic(cxi - xp) * mask               # (Wf, BLK), masked
    ky = _keys_cubic(cyi - yp)                      # (rows, BLK)
    wxy = (ky[:, None, :] * kx[None, :, :]).reshape(rows * wf, block)
    mrow8 = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (8, block), 0) == 0,
        1.0 - mask, 0.0)
    return wxy.astype(dtype), mrow8.astype(dtype), kx, ky


def _trunk_forward(static: PixelStatic, trunk_refs, lat, emb, seed, gid,
                   a_refs, xlast_ref, seed_off: int):
    """One trunk's forward chain; returns the final pre-tanh (BLK, h_last)."""
    wx, wlat, wemb, bs = trunk_refs
    dtype = jnp.dtype(static.cdtype)
    x0l = _x0_layers(static)
    x = None
    for layer in range(static.n_layers):
        if layer == static.n_layers - 1 and xlast_ref is not None:
            xlast_ref[:] = x.astype(jnp.float32)
        acc = bs[layer][0:1, :]
        if wx[layer] is not None:
            acc = acc + jnp.dot(x, wx[layer][:],
                                preferred_element_type=jnp.float32)
        if x0l[layer]:
            acc = acc + jnp.dot(lat, wlat[layer][:],
                                preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(emb, wemb[layer][:],
                                preferred_element_type=jnp.float32)
        if layer < static.n_layers - 1:
            x = jnp.maximum(acc, 0.0)
            if static.train and static.dropout_p[layer]:
                x = x * _dropout_gate(seed, layer + seed_off, x.shape[0],
                                      x.shape[1], static.keep, gid)
            # gated-activation residual: backward recovers the combined
            # relu*dropout gate as (acts > 0) / keep — no PRNG replay
            a_refs[layer][:] = x.astype(a_refs[layer].dtype)
            x = x.astype(dtype)
        else:
            return acc
    raise AssertionError("unreachable")


def _fwd_kernel(static: PixelStatic, trunks_def, seed_ref, rlo_ref, pix_ref,
                emb_ref, fe_ref, mean_ref, *refs):
    n_hidden = static.n_layers - 1
    dtype = jnp.dtype(static.cdtype)
    gid = pl.program_id(0)
    seed = seed_ref[0]

    trunk_h, refs = _split_trunk_refs(static, list(refs), trunks_def[0])
    trunk_o = None
    if static.has_obj:
        trunk_o, refs = _split_trunk_refs(static, refs, trunks_def[1])
    sel_h_ref, refs = refs[0], refs[1:]
    sel_o_ref = None
    if static.has_obj:
        sel_o_ref, refs = refs[0], refs[1:]
    y_ref = refs[0]
    refs = refs[1:]
    xlast_ref = None
    if static.need_xlast:
        xlast_ref, refs = refs[0], refs[1:]
    ah_refs, refs = refs[:n_hidden], refs[n_hidden:]
    if static.has_obj:
        ao_refs, refs = refs[:n_hidden], refs[n_hidden:]
    else:
        ao_refs = []
    lat_ref = refs[0]

    xp = pix_ref[0, 0:1, :]
    yp = pix_ref[0, 1:2, :]
    mask = pix_ref[0, 2:3, :]
    r0 = rlo_ref[gid] if static.band else None
    wxy, mrow8, _, _ = _weight_tile(static, xp, yp, mask, dtype, r0)
    if static.band:
        fe_rows = fe_ref[pl.ds(r0 * static.wf, static.band * static.wf), :]
    else:
        fe_rows = fe_ref[:]

    # latent = wxy^T @ feT + mrow8^T @ mean8: (BLK, C_pad), f32 accumulate.
    # Stored as a residual: recomputing it in backward costs a 283-GFLOP
    # matmul per step at production shapes vs ~0.16 ms of HBM traffic for
    # the store (xplane, BASELINE.md round 4)
    lat = jax.lax.dot_general(wxy, fe_rows.astype(dtype),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    lat = lat + jax.lax.dot_general(mrow8, mean_ref[0].astype(dtype),
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    lat = lat.astype(dtype)
    lat_ref[:] = lat
    emb = emb_ref[:].astype(dtype)

    acc_h = _trunk_forward(static, trunk_h, lat, emb, seed, gid, ah_refs,
                           xlast_ref, 0)
    # LANES-MAJOR output: sel re-orients the live output columns onto
    # sublanes with one tiny MXU matmul (rows of sel are disjoint per trunk;
    # unused rows give tanh(0) = 0)
    rows = jax.lax.dot_general(sel_h_ref[:], acc_h, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    if static.has_obj:
        acc_o = _trunk_forward(static, trunk_o, lat, emb, seed, gid,
                               ao_refs, None, static.n_layers)
        rows = rows + jax.lax.dot_general(
            sel_o_ref[:], acc_o, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    y_ref[0] = jnp.tanh(rows)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_pixel_decoder(static: PixelStatic, trunks, fe, mean8, pix, emb,
                        rlo, fits, seed):
    """Both trunks fused with in-kernel pixel-aligned latents.

    trunks: (hand PixelTrunk, obj PixelTrunk | None);
    fe:   (B*HW, C_pad) per-scene flattened feature maps (a reshape of the
          NHWC HeadNet output — no extended table is ever concatenated);
    mean8: (B, 8, C_pad), row 0 of each scene = the map's mean feature
          (the out-of-image fallback; applied in-kernel via an (8, BLK)
          selector matmul);
    pix:  (8, M) f32 — rows 0/1/2 = x-pixel, y-pixel, in-image mask;
    emb:  (M, emb_pad) embedding columns;
    rlo:  (M // block,) int32 per-block feature-row band starts (banded
          mode, static.band set; the caller sorts each scene's points by
          yp so every block's taps fit its band — see make decode()).
          Ignored when static.band is None.
    fits: () bool — True when every block's row span fits static.band; the
          kernels cond to the full contraction otherwise.  The cond lives
          INSIDE this custom_vjp, around each pallas_call with an identical
          operand list (the full kernel ignores rlo), so no residual or
          cast is ever duplicated across cond branches.
    Returns (y (8, M) f32 LANES-MAJOR — row 0 hand sdf, row 1 obj —, x_last
    (M, h) f32); row slices of the dense-lane (8, M) form are free where the
    (M, 8) form made XLA materialize ~2 ms/step of 8-lane pad/copy glue per
    trunk for the y slice and dy cotangent (BASELINE.md round 4).
    """
    (y, x_last), _ = _fused_pixel_fwd(static, trunks, fe, mean8, pix, emb,
                                      rlo, fits, seed)
    return y, x_last


def _rep_spec(op):
    return pl.BlockSpec(op.shape,
                        partial(lambda nd, *idx: (0,) * nd, len(op.shape)),
                        memory_space=pltpu.VMEM)


def _pix_blocks(pix: jax.Array, block: int) -> jax.Array:
    """(8, M) -> (M//block, 8, block) so each grid step's pix tile is one
    leading-index slice (Mosaic lane-divisibility rule)."""
    m = pix.shape[1]
    return pix.reshape(8, m // block, block).transpose(1, 0, 2)


def _pix_unblocks(pix3: jax.Array) -> jax.Array:
    nb, _, block = pix3.shape
    return pix3.transpose(1, 0, 2).reshape(8, nb * block)


def _fused_pixel_fwd(static: PixelStatic, trunks, fe, mean8, pix, emb, rlo,
                     fits, seed):
    m = emb.shape[0]
    block, bps = static.block, static.bps
    assert m % block == 0, (m, block)
    hw = static.hf * static.wf
    c_pad = fe.shape[1]
    dt = jnp.dtype(static.cdtype)
    rdtype = dt
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    n_hidden = static.n_layers - 1

    def cast_trunk(t):
        if t is None:
            return None
        c = lambda w: None if w is None else w.astype(dt)  # noqa: E731
        return PixelTrunk(tuple(c(w) for w in t.wx),
                          tuple(c(w) for w in t.wlat),
                          tuple(c(w) for w in t.wemb), t.biases)

    trunks_k = (cast_trunk(trunks[0]),
                cast_trunk(trunks[1]) if static.has_obj else None)
    fe_k = fe.astype(dt)
    mean_k = mean8.astype(dt)
    ops = _flatten_trunk(trunks_k[0])
    if static.has_obj:
        ops += _flatten_trunk(trunks_k[1])
    ops += _sels(static, trunks_k)

    h_pads = [b.shape[1] for b in trunks[0].biases]
    if static.has_obj:
        # residual buffers + t-loop out_specs below are sized from the hand
        # trunk's widths; a config with differing trunk dims would write obj
        # activations into wrong-width buffers — fail loudly instead
        assert [b.shape[1] for b in trunks[1].biases] == h_pads, \
            "pixel train kernel requires identical hand/obj trunk widths"
    grid = (m // block,)

    out_shapes = [jax.ShapeDtypeStruct((m // block, 8, block), jnp.float32)]
    out_specs = [pl.BlockSpec((1, 8, block), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if static.need_xlast:
        out_shapes.append(jax.ShapeDtypeStruct((m, h_pads[-2]), jnp.float32))
        out_specs.append(pl.BlockSpec((block, h_pads[-2]), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    n_res = n_hidden * (2 if static.has_obj else 1)
    for t in range(2 if static.has_obj else 1):
        out_shapes += [jax.ShapeDtypeStruct((m, h_pads[i]), rdtype)
                       for i in range(n_hidden)]
        out_specs += [pl.BlockSpec((block, h_pads[i]), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
                      for i in range(n_hidden)]
    out_shapes.append(jax.ShapeDtypeStruct((m, c_pad), rdtype))  # lat
    out_specs.append(pl.BlockSpec((block, c_pad), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))

    rlo_arr = jnp.asarray(rlo, jnp.int32).reshape(m // block)

    def call(static_v):
        return pl.pallas_call(
            partial(_fwd_kernel, static_v, trunks_k),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),             # seed
                pl.BlockSpec(memory_space=pltpu.SMEM),             # rlo
                # Mosaic requires the block's lane dim to be 128-divisible
                # OR equal to the array's: a (n_blocks, 8, block) layout
                # makes the per-block pix tile one leading-index slice
                pl.BlockSpec((1, 8, block), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),             # pix
                pl.BlockSpec((block, emb.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),             # emb
                pl.BlockSpec((hw, c_pad), lambda i: (i // bps, 0),
                             memory_space=pltpu.VMEM),             # feT band
                pl.BlockSpec((1, 8, c_pad), lambda i: (i // bps, 0, 0),
                             memory_space=pltpu.VMEM),             # mean8
                *[_rep_spec(op) for op in ops],
            ],
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=static_v.interpret,
            **_vmem_kwargs(static_v.interpret),
        )(seed_arr, rlo_arr, _pix_blocks(pix, block), emb.astype(dt), fe_k,
          mean_k, *ops)

    if static.band is not None:
        # cond INSIDE the vjp: both branches share the exact operand list
        # (the full kernel ignores rlo), so nothing is duplicated or
        # copied across the conditional boundary
        outs = jax.lax.cond(fits, lambda: call(static),
                            lambda: call(static._replace(band=None)))
    else:
        outs = call(static)

    y3 = outs[0]
    i = 1
    if static.need_xlast:
        x_last, i = outs[1], 2
    else:
        x_last = jnp.zeros((m, h_pads[-2]), jnp.float32)  # DCE'd by XLA
    a_list = tuple(outs[i:i + n_res])
    lat_res = outs[i + n_res]
    res = (trunks_k, fe_k, mean_k, pix, emb.astype(dt), a_list, lat_res, y3,
           rlo_arr, fits, seed_arr)
    return (_lm_unblocks(y3), x_last), res


def _trunk_backward(static: PixelStatic, trunk_refs, d_refs, a_refs, lat, emb,
                    dpre_last, dxlast, seed, gid, seed_off: int):
    """Reverse chain for one trunk.  Returns (dlat_acc, demb_acc) (BLK, *) f32
    and accumulates dwx/dwlat/dwemb/db into the VMEM accumulator refs."""
    wx, wlat, wemb, _ = trunk_refs
    dwx, dwlat, dwemb, dbs = d_refs
    dtype = jnp.dtype(static.cdtype)
    x0l = _x0_layers(static)
    blk = emb.shape[0]

    # the residuals ARE the gated activations; the combined relu*dropout
    # gate is (acts > 0) / keep exactly — no gate-PRNG replay in backward
    acts = []
    gates = []
    for layer in range(static.n_layers - 1):
        a = a_refs[layer][:].astype(jnp.float32)
        scale = (1.0 / static.keep) if (static.train
                                        and static.dropout_p[layer]) else 1.0
        gates.append((a > 0.0).astype(jnp.float32) * jnp.float32(scale))
        acts.append(a.astype(dtype))

    def mm_t_lhs(x, d):
        return jax.lax.dot_general(x, d.astype(dtype),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    dlat_acc = jnp.zeros((blk, lat.shape[1]), jnp.float32)
    demb_acc = jnp.zeros((blk, emb.shape[1]), jnp.float32)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == 0
    dpre = dpre_last
    for layer in range(static.n_layers - 1, -1, -1):
        dbs[layer][:] += jnp.where(
            row0, jnp.sum(dpre, axis=0, keepdims=True), 0.0)
        if x0l[layer]:
            dwlat[layer][:] += mm_t_lhs(lat, dpre)
            dwemb[layer][:] += mm_t_lhs(emb, dpre)
            dlat_acc = dlat_acc + jax.lax.dot_general(
                dpre.astype(dtype), wlat[layer][:],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            demb_acc = demb_acc + jax.lax.dot_general(
                dpre.astype(dtype), wemb[layer][:],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if wx[layer] is not None:
            dwx[layer][:] += mm_t_lhs(acts[layer - 1], dpre)
            dx = jax.lax.dot_general(
                dpre.astype(dtype), wx[layer][:],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            if layer == static.n_layers - 1 and dxlast is not None:
                dx = dx + dxlast
            dpre = dx * gates[layer - 1]
    return dlat_acc, demb_acc


def _bwd_kernel(static: PixelStatic, trunks_def, seed_ref, rlo_ref, pix_ref,
                emb_ref, dy_ref, *refs):
    n_hidden = static.n_layers - 1
    dtype = jnp.dtype(static.cdtype)
    # 2-D (scene, block-in-scene) grid; gid = the global block index so the
    # dropout-gate rows match the 1-D forward grid exactly
    gid = pl.program_id(0) * static.bps + pl.program_id(1)
    seed = seed_ref[0]
    hw = static.hf * static.wf

    dxlast_in = None
    if static.need_xlast:
        dxlast_in, refs = refs[0], list(refs[1:])
    else:
        refs = list(refs)
    fe_ref, refs = refs[0], refs[1:]
    trunk_h, refs = _split_trunk_refs(static, refs, trunks_def[0])
    trunk_o = None
    if static.has_obj:
        trunk_o, refs = _split_trunk_refs(static, refs, trunks_def[1])
    ah_refs, refs = refs[:n_hidden], refs[n_hidden:]
    ao_refs = []
    if static.has_obj:
        ao_refs, refs = refs[:n_hidden], refs[n_hidden:]
    y_ref, sel_h_ref, refs = refs[0], refs[1], refs[2:]
    sel_o_ref = None
    if static.has_obj:
        sel_o_ref, refs = refs[0], refs[1:]
    lat_in_ref, refs = refs[0], refs[1:]
    # outputs
    dfe_ref, dmean_ref, dpix_ref, demb_ref = refs[:4]
    refs = refs[4:]

    def take_d():
        nonlocal refs
        dwx = [None] * static.n_layers
        dwlat = [None] * static.n_layers
        dwemb = [None] * static.n_layers
        x0l = _x0_layers(static)
        for layer in range(static.n_layers):
            if layer > 0:
                dwx[layer], refs = refs[0], refs[1:]
        for layer in range(static.n_layers):
            if x0l[layer]:
                dwlat[layer], refs = refs[0], refs[1:]
        for layer in range(static.n_layers):
            if x0l[layer]:
                dwemb[layer], refs = refs[0], refs[1:]
        dbs, refs = refs[:static.n_layers], refs[static.n_layers:]
        return dwx, dwlat, dwemb, list(dbs)

    d_h = take_d()
    d_o = take_d() if static.has_obj else None

    # dfe accumulates directly into its per-scene output window, revisited
    # across the MINORMOST grid dimension of a 2-D (scene, block-in-scene)
    # grid with affine index maps — Mosaic's canonical reduction idiom.  A
    # 1-D grid with an i//bps output map silently corrupts the accumulation
    # (measured: bps=1 exact, bps=2 ~3% off; interpret mode cannot catch
    # it), and scratch/extra-window workarounds crash the compile helper.
    @pl.when(gid == 0)
    def _init():
        for group in (d_h,) + ((d_o,) if static.has_obj else ()):
            for part in group:
                for r in part:
                    if r is not None:
                        r[:] = jnp.zeros_like(r)

    @pl.when(pl.program_id(1) == 0)
    def _init_scene():
        dfe_ref[:] = jnp.zeros_like(dfe_ref)
        dmean_ref[:] = jnp.zeros_like(dmean_ref)

    xp = pix_ref[0, 0:1, :]
    yp = pix_ref[0, 1:2, :]
    mask = pix_ref[0, 2:3, :]
    r0 = rlo_ref[gid] if static.band else None
    wxy, mrow8, kx, ky = _weight_tile(static, xp, yp, mask, dtype, r0)
    if static.band:
        fe = fe_ref[pl.ds(r0 * static.wf, static.band * static.wf),
                    :].astype(dtype)
    else:
        fe = fe_ref[:].astype(dtype)
    lat = lat_in_ref[:].astype(dtype)   # forward residual, not recomputed
    emb = emb_ref[:].astype(dtype)

    # split the lanes-major dy rows into per-trunk last-layer cotangents
    y8 = y_ref[0]                                     # (8, BLK)
    g_lm = dy_ref[0] * (1.0 - y8 * y8)
    dpre_h = jax.lax.dot_general(g_lm, sel_h_ref[:],
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dlat_h, demb_h = _trunk_backward(static, trunk_h, d_h, ah_refs, lat, emb,
                                     dpre_h, dxlast_in[:] if dxlast_in is not
                                     None else None, seed, gid, 0)
    dlat = dlat_h
    demb = demb_h
    if static.has_obj:
        dpre_o = jax.lax.dot_general(g_lm, sel_o_ref[:],
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        dlat_o, demb_o = _trunk_backward(static, trunk_o, d_o, ao_refs, lat,
                                         emb, dpre_o, None, seed, gid,
                                         static.n_layers)
        dlat = dlat + dlat_o
        demb = demb + demb_o
    demb_ref[:] = demb

    # feature-map cotangent: dfeT += wxy @ dlat (HW, C_pad); the mean path's
    # cotangent accumulates separately (dmean += mrow8 @ dlat, row 0 live).
    # Banded mode touches only the block's band rows of the per-scene
    # window (zeroed in full at j == 0)
    dlat_c = dlat.astype(dtype)
    dfe_add = jnp.dot(wxy, dlat_c, preferred_element_type=jnp.float32)
    if static.band:
        sl = pl.ds(r0 * static.wf, static.band * static.wf)
        dfe_ref[sl, :] = dfe_ref[sl, :] + dfe_add
    else:
        dfe_ref[:] += dfe_add
    dmean_ref[0] += jnp.dot(mrow8, dlat_c,
                            preferred_element_type=jnp.float32)

    # pixel-coordinate cotangents via the Keys-cubic derivative:
    #   dW[q, p] = sum_c feT[q, c] * dlat[p, c]   (HW, BLK)
    #   dxp[p]   = sum_{r,c} dW[(r,c), p] * ky[r, p] * d/dxp K(c - xp)
    # The (ky (x) gx) / (gy (x) kx) weights are SEPARABLE, so the double sum
    # factorizes into two cheap stages over the (Hf, Wf, BLK) view instead
    # of building two more dense (HW, BLK) tiles: ~60% fewer VPU ops in the
    # tile path (the tiles were the VPU cost center, xplane r4/r5)
    rows = static.band if static.band else static.hf
    dw3 = jax.lax.dot_general(
        fe, dlat_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(
            rows, static.wf, static.block)
    cxi = jax.lax.broadcasted_iota(jnp.int32, (static.wf, static.block),
                                   0).astype(jnp.float32)
    cyi = jax.lax.broadcasted_iota(jnp.int32, (rows, static.block), 0)
    if static.band:
        cyi = cyi + r0
    cyi = cyi.astype(jnp.float32)
    gx = -_keys_cubic_grad(cxi - xp) * mask           # (Wf, BLK), masked
    gy = -_keys_cubic_grad(cyi - yp)                  # (rows, BLK)
    # dxp = sum_r ky[r] * (sum_c gx[c] * dw[r, c]);  kx is already masked
    tx = jnp.sum(dw3 * gx[None, :, :], axis=1)        # (rows, BLK)
    dxp = jnp.sum(ky * tx, axis=0, keepdims=True)     # (1, BLK)
    ty = jnp.sum(dw3 * gy[:, None, :], axis=0)        # (Wf, BLK)
    dyp = jnp.sum(kx * ty, axis=0, keepdims=True)
    r8 = jax.lax.broadcasted_iota(jnp.int32, (8, static.block), 0)
    dpix_ref[0] = (jnp.where(r8 == 0, dxp, 0.0)
                   + jnp.where(r8 == 1, dyp, 0.0))


def _fused_pixel_bwd(static: PixelStatic, res, cots):
    (trunks_k, fe, mean_k, pix, emb, a_list, lat_res, y3, rlo_arr, fits,
     seed_arr) = res
    dy_lm, dx_last = cots   # dy arrives lanes-major (8, M), dense lanes
    m = emb.shape[0]
    dy3 = _lm_blocks(dy_lm, static.block)
    block, bps = static.block, static.bps
    hw = static.hf * static.wf
    c_pad = fe.shape[1]
    n_hidden = static.n_layers - 1
    # 2-D (scene, block-in-scene) grid: dfe revisits its per-scene output
    # window across the minormost dim with affine index maps (the canonical
    # Mosaic reduction idiom — see _bwd_kernel note)
    grid = (m // block // bps, bps)
    x0l = _x0_layers(static)

    ops = _flatten_trunk(trunks_k[0])
    if static.has_obj:
        ops += _flatten_trunk(trunks_k[1])

    sels = _sels(static, trunks_k)

    def d_shapes(trunk: PixelTrunk):
        shapes, specs = [], []
        for layer in range(static.n_layers):
            if layer > 0:
                shapes.append(jax.ShapeDtypeStruct(trunk.wx[layer].shape,
                                                   jnp.float32))
                specs.append(_rep_spec(trunk.wx[layer]))
        for source in (trunk.wlat, trunk.wemb):
            for layer in range(static.n_layers):
                if x0l[layer]:
                    shapes.append(jax.ShapeDtypeStruct(source[layer].shape,
                                                       jnp.float32))
                    specs.append(_rep_spec(source[layer]))
        for b in trunk.biases:
            shapes.append(jax.ShapeDtypeStruct((8, b.shape[1]), jnp.float32))
            specs.append(_rep_spec(jnp.zeros((8, b.shape[1]))))
        return shapes, specs

    blk_spec = lambda w: pl.BlockSpec((block, w),  # noqa: E731
                                      lambda i, j: (i * bps + j, 0),
                                      memory_space=pltpu.VMEM)
    lm3 = lambda: pl.BlockSpec((1, 8, block),  # noqa: E731
                               lambda i, j: (i * bps + j, 0, 0),
                               memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct(fe.shape, jnp.float32),            # dfeT
        jax.ShapeDtypeStruct(mean_k.shape, jnp.float32),        # dmean8
        jax.ShapeDtypeStruct((m // block, 8, block), jnp.float32),  # dpix
        jax.ShapeDtypeStruct((m, emb.shape[1]), jnp.float32),   # demb
    ]
    out_specs = [
        pl.BlockSpec((hw, c_pad), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, c_pad), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        lm3(),
        blk_spec(emb.shape[1]),
    ]
    sh_h, sp_h = d_shapes(trunks_k[0])
    out_shapes += sh_h
    out_specs += sp_h
    n_dh = len(sh_h)
    if static.has_obj:
        sh_o, sp_o = d_shapes(trunks_k[1])
        out_shapes += sh_o
        out_specs += sp_o

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                   # seed
        pl.BlockSpec(memory_space=pltpu.SMEM),                   # rlo
        lm3(),                                                   # pix
        blk_spec(emb.shape[1]),                                  # emb
        lm3(),                                                   # dy
    ]
    operands = [seed_arr, rlo_arr, _pix_blocks(pix, block), emb, dy3]
    if static.need_xlast:
        in_specs.append(blk_spec(dx_last.shape[1]))
        operands.append(dx_last)
    in_specs.append(pl.BlockSpec((hw, c_pad), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM))       # feT band
    operands.append(fe)
    in_specs += [_rep_spec(op) for op in ops]
    operands += ops
    for t in range(2 if static.has_obj else 1):
        in_specs += [blk_spec(a_list[t * n_hidden + i].shape[1])
                     for i in range(n_hidden)]
        operands += list(a_list[t * n_hidden:(t + 1) * n_hidden])
    in_specs.append(lm3())                                       # y
    operands.append(y3)
    in_specs += [_rep_spec(s) for s in sels]
    operands += sels
    in_specs.append(blk_spec(c_pad))                             # lat
    operands.append(lat_res)

    def call(static_v):
        return pl.pallas_call(
            partial(_bwd_kernel, static_v, trunks_k),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=static_v.interpret,
            **_vmem_kwargs(static_v.interpret),
        )(*operands)

    if static.band is not None:
        outs = jax.lax.cond(fits, lambda: call(static),
                            lambda: call(static._replace(band=None)))
    else:
        outs = call(static)

    dfe, dmean = outs[0], outs[1]
    dpix, demb = _pix_unblocks(outs[2]), outs[3]

    def unpack_d(chunk, trunk: PixelTrunk):
        it = iter(chunk)
        dwx = tuple(next(it) if layer > 0 else None
                    for layer in range(static.n_layers))
        dwlat = tuple(next(it) if x0l[layer] else None
                      for layer in range(static.n_layers))
        dwemb = tuple(next(it) if x0l[layer] else None
                      for layer in range(static.n_layers))
        dbs = tuple(o[0:1] for o in it)  # db lives in row 0
        return PixelTrunk(dwx, dwlat, dwemb, dbs)

    d_hand = unpack_d(outs[4:4 + n_dh], trunks_k[0])
    d_obj = None
    if static.has_obj:
        d_obj = unpack_d(outs[4 + n_dh:], trunks_k[1])
    return (d_hand, d_obj), dfe, dmean, dpix, demb, None, None, None


fused_pixel_decoder.defvjp(_fused_pixel_fwd, _fused_pixel_bwd)


def make_fused_train_decoder_pixel(specs: Specs,
                                   interpret: Optional[bool] = None,
                                   block_cap: int = 2000,
                                   band=None,
                                   presorted: bool = False):
    # block_cap 2000 for the UNBANDED kernel: with the feature map as a
    # separate operand (no extended-table build) bps=1 measured best — no
    # per-scene dfe window revisits (r5 sweep: block 2000 -> 1,715 samples/s
    # vs 400 -> 1,702).  Banded mode needs bps > 1 (per-scene points sorted
    # by feature row, each block covering a narrow band), so band != None
    # with the default cap switches to 400 (bps 5 on 2000 pts/scene)
    """decode(decoder_params, fmap (B, Hf, Wf, C) NHWC, emb (M, pfs), xyz
    (M, 3), cam_intr (B, 3, 3+), pred_root (B, 1, 3), seed, train) ->
    (sdf_h, sdf_o, logits) via fused_pixel_decoder, or None when the config
    is not pixel-aligned / outside the kernel structure.  decode.pixel is
    True so the train step knows to call model.decoder_inputs_pixel.

    The camera projection (reference utils/utils.py:536-549) stays in plain
    differentiable jnp here, so the pixel-coordinate cotangents the kernel
    emits flow to the predicted MANO root automatically; only the bicubic
    sampling + decoder chain live in the kernel.

    ``band``: banded sampling contraction — MEASURED AND REJECTED as a
    device-side default (r5, BASELINE.md): each scene's points are sorted
    by their projected feature row (order restored outside the kernel —
    the kernel is point-order agnostic; per-point forward values are
    unchanged), so each block's bicubic taps land in a narrow row band and
    the sampling matmuls (fwd latent, bwd dfe and dW — the dominant MXU
    cost beyond the trunks) contract only band/Hf of the feature table.
    Bounds are EXACT (computed on the same f32 pix array the kernel
    consumes) and a traced fits flag falls back to the full contraction
    when any block's span exceeds the band.  On device the kernels DO get
    faster (bwd 10.2 -> 7.8 ms, fwd 4.6 -> 3.9 at b64) — but the
    device-side permutation glue costs more than the kernels save: TPU
    gathers on 8/16-lane rows run at ~1 GB/s effective (~7 ms/step of
    gather/scatter fusions for pix/emb/y and their VJP transposes; the
    sorts themselves are ~0.4 ms).  Net b64 1,678 -> 1,394 samples/s.
    ``presorted=True`` (with ``band``) removes the device permutation: the
    HOST loader already ordered each scene by approximate projected row
    (data/pixel_sort.pixel_row_sort_batch, whole-scene; an explicit
    point_is_hand column replaces the positional masks), so decode() skips
    the device sort/gathers entirely — the exact per-block bounds and the
    runtime fits fallback still come from the actual pix array, so a wrong
    or missing host sort only costs speed, never correctness.  Measured
    ~NEUTRAL end-to-end (r5): the banded kernels beat full-at-block-400 by
    ~2.5 ms/step (xplane: bwd 9.5 -> 7.8, fwd 4.6 -> 3.9 at b64), but
    banding needs bps > 1 while the unbanded default runs block 2000
    (bps=1, ~1.2 ms faster than block 400), the fits cond adds ~0.5 ms,
    and an UNTRAINED model's per-step root drift defeats the host sort
    (boundary-margin sorting fixes classification flips; large root error
    still falls back).  Kept as a certified lever.
    "auto" = Hf//2 for maps of 16+ rows; None (default) = the exact
    legacy kernel, no banding.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    ns = specs.network_specs
    if (not specs.pixel_align or not ns.weight_norm or ns.use_tanh
            or ns.latent_dropout or ns.xyz_in_all or 0 in ns.latent_in):
        return None
    if band is not None and block_cap == 2000:
        block_cap = 400
    block = _scene_block(specs.samples_per_scene, cap=block_cap)
    if block is None or block < 16:
        return None
    ls, pfs = specs.latent_size, specs.point_feat_size
    combined = specs.model_type == "1encoder1decoder"
    keep = 1.0 - ns.dropout_prob
    n_layers = len(ns.dims) + 1
    inject_pattern = tuple(layer in ns.latent_in for layer in range(n_layers))
    dropout_pattern = tuple(bool(ns.dropout) and layer in ns.dropout
                            for layer in range(n_layers - 1))
    emb_pad = _round_up(pfs, 16)
    c_pad = _round_up(ls, 128)
    cols_h, cols_o = branch_columns(specs)

    def split_trunk(branch_params, prefix, cols, out_dim):
        """BranchPlan -> PixelTrunk: latent rows -> wlat, embedding rows
        scattered to their positions in the full pfs-wide emb input."""
        plan = build_branch_plan(branch_params, prefix, ls + len(cols), ns,
                                 out_dim, dtype=jnp.float32)
        x0l = tuple(l == 0 or inject_pattern[l] for l in range(n_layers))
        wx, wlat, wemb = [], [], []
        cols_idx = np.asarray(cols, np.int32)
        for layer in range(n_layers):
            main = plan.weights[layer]
            injw = plan.inject_weights[layer]
            if layer == 0:
                wx.append(None)
                src = main
            else:
                wx.append(main)
                src = injw
            if x0l[layer]:
                w_lat = src[:ls]
                w_lat = jnp.pad(w_lat, ((0, c_pad - ls), (0, 0)))
                w_emb = jnp.zeros((emb_pad, src.shape[1]), src.dtype)
                w_emb = w_emb.at[cols_idx].set(src[ls:ls + len(cols)])
                wlat.append(w_lat)
                wemb.append(w_emb)
            else:
                wlat.append(None)
                wemb.append(None)
        return PixelTrunk(tuple(wx), tuple(wlat), tuple(wemb), plan.biases)

    def classifier_apply(branch_params, x_last):
        from alignsdf_tpu.ops.decoder_kernel import _materialize_linear

        cw, cb = _materialize_linear(branch_params["classifier_head"])
        logits = x_last[:, :cw.shape[0]] @ cw + cb
        return logits.astype(jnp.float32)

    def decode(decoder_params, fmap, emb, xyz, cam_intr, pred_root, seed,
               train=True):
        b, hf, wf, c = fmap.shape
        hw = hf * wf
        m = emb.shape[0]
        n = m // b
        assert n % block == 0, (n, block)
        bps = n // block

        # per-scene flattened feature table (B*HW, C_pad) + the mean feature
        # as a SEPARATE (B, 8, C_pad) operand: no extended table is ever
        # concatenated/copied on the XLA side (the old (B, HW+128, C) build
        # cost ~5 ms/step of concat + layout copies at b64, xplane r5); the
        # kernel folds the out-of-image mean fallback in via an (8, BLK)
        # selector matmul
        flat = fmap.astype(jnp.float32).reshape(b, hw, c)
        mean = flat.mean(axis=1)                        # (B, C)
        fe = flat.reshape(b * hw, c)
        mean8 = jnp.broadcast_to(mean[:, None, :], (b, 8, c))
        if c_pad != c:
            fe = jnp.pad(fe, ((0, 0), (0, c_pad - c)))
            mean8 = jnp.pad(mean8, ((0, 0), (0, 0), (0, c_pad - c)))

        # camera projection in the EXACT float sequence of the XLA path
        # (ops/geometry.pixel_alignment + grid_sample_bicubic, reference
        # utils/utils.py:536-549): same values to the ulp, so borderline
        # ReLU units downstream see identical pre-activations — a formula
        # reassociation here (e.g. xi * ((wf-1)/imgsz)) shifts xp by ~1e-6
        # px and flips kink branches at isolated points (measured: ~3%
        # gradient deviation concentrated on single points)
        imgsz = float(specs.image_size[0])
        xyz_cam = (xyz.reshape(b, n, 3) * 2.0 / specs.sdf_scale_factor
                   + pred_root)
        hom = jnp.einsum("bij,bnj->bni", cam_intr[:, :3, :3], xyz_cam)
        xy_img = hom[..., :2] / hom[..., 2:3]
        uv = xy_img / imgsz * 2.0 - 1.0
        in_img = ((uv[..., 0] >= -1.0) & (uv[..., 0] <= 1.0)
                  & (uv[..., 1] >= -1.0) & (uv[..., 1] <= 1.0))
        mask = in_img.astype(jnp.float32)
        xp_raw = (uv[..., 0] + 1.0) * 0.5 * (wf - 1)
        yp_raw = (uv[..., 1] + 1.0) * 0.5 * (hf - 1)
        valid = in_img & jnp.isfinite(yp_raw) & jnp.isfinite(xp_raw)
        xp = jnp.where(valid, xp_raw, 0.0)
        yp = jnp.where(valid, yp_raw, 0.0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, m), 0)
        pix = (jnp.where(lane == 0, xp.reshape(1, m), 0.0)
               + jnp.where(lane == 1, yp.reshape(1, m), 0.0)
               + jnp.where(lane == 2, mask.reshape(1, m), 0.0))

        emb_in = jnp.pad(emb, ((0, 0), (0, emb_pad - emb.shape[1])))

        # ---- banded mode: per-scene sort by feature row + exact per-block
        # band bounds.  The permutation is undone on the outputs below, so
        # kernel semantics are unchanged point-for-point (only the dropout
        # gate assignment and the order of dW/dfe accumulation differ).
        band_i = (hf // 2 if hf >= 16 else None) if band == "auto" else band
        if band_i is not None and bps <= 1:
            band_i = None
        inv = rlo = None
        fits = None
        if band_i is not None:
            big = jnp.float32(1e9)
            key = jnp.where(valid, yp, big)               # (B, N)
            if presorted:
                # the host loader already ordered each scene-half by
                # (approximate) row — bounds come straight off the blocks;
                # the fits cond below still guarantees correctness if the
                # host order is stale or absent
                ks = key.reshape(m // block, block)
            else:
                order = jnp.argsort(key, axis=1)          # stable
                perm = (order
                        + (jnp.arange(b, dtype=order.dtype) * n)[:, None]
                        ).reshape(m)
                inv = jnp.argsort(perm)
                pix = pix[:, perm]
                emb_in = emb_in[perm]
                ks = jnp.take_along_axis(key, order, axis=1).reshape(
                    m // block, block)
            kvalid = ks < big
            lo = jnp.min(jnp.where(kvalid, ks, big), axis=1)
            hi = jnp.max(jnp.where(kvalid, ks, -big), axis=1)
            empty = hi < lo
            # taps touch rows floor(yp)-1 .. floor(yp)+2, clamped to the map
            r_bot = jnp.maximum(
                jnp.floor(jnp.minimum(lo, big)).astype(jnp.int32) - 1, 0)
            r_top = jnp.minimum(
                jnp.floor(jnp.clip(hi, -big, big)).astype(jnp.int32) + 2,
                hf - 1)
            # r0*wf must sit on a VMEM tile boundary (32 sublanes covers
            # f32 and bf16)
            row_align = max(1, -(-32 // wf))
            r_cap = (hf - band_i) // row_align * row_align
            rlo = jnp.clip(r_bot // row_align * row_align, 0, r_cap)
            rlo = jnp.where(empty, 0, rlo).astype(jnp.int32)
            fits = jnp.all(empty | (r_top < rlo + band_i))

        if combined:
            trunk_params = decoder_params["trunk"]
            need_cls = specs.classifier_branch
            trunks = (split_trunk(trunk_params, "lin", cols_h, 2), None)
        else:
            trunk_params = decoder_params["hand"]
            need_cls = (specs.classifier_branch
                        and "classifier_head" in trunk_params)
            trunks = (split_trunk(trunk_params, "linh", cols_h, 1),
                      split_trunk(decoder_params["obj"], "lino", cols_o, 1))

        static = PixelStatic(
            n_layers, inject_pattern, dropout_pattern, keep, block,
            specs.compute_dtype, bool(train), interpret, bool(need_cls),
            bps, hf, wf, combined, not combined)
        if band_i is None:
            rlo = jnp.zeros((m // block,), jnp.int32)
            fits = jnp.asarray(False)
        else:
            static = static._replace(band=band_i)
        y, x_last = fused_pixel_decoder(static, trunks, fe, mean8, pix,
                                        emb_in, rlo, fits, seed)
        if band_i is not None and not presorted:
            # undo the per-scene sort on everything leaving the kernel
            y = y[:, inv]
            x_last = x_last[inv]
        logits = classifier_apply(trunk_params, x_last) if need_cls else None
        # y is lanes-major (8, M): row slices are free, and the losses
        # flatten to 1-D anyway
        return y[0], y[1], logits

    decode.pixel = True
    decode.block = block
    decode.band = band
    return decode
