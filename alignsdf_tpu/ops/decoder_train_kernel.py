"""Fused Pallas decoder for the TRAINING path: forward + backward kernels with
in-kernel dropout, wrapped in a jax.custom_vjp.

The decoder is the second-largest slice of the train step (~20 ms of the 43 ms
bf16 step at batch 64 x 2000 pts, BASELINE.md ablation), and the XLA path pays
for it twice over: dropout masks are materialized in HBM (8 x (128k, 512)
random tensors per step) and every linear/relu/dropout boundary is an HBM
round trip.  Here each trunk runs as ONE kernel per direction:

  forward  — streams point blocks through the [linear -> (+re-injection) ->
             ReLU -> dropout] x L -> tanh chain with weights resident in VMEM,
             storing only the pre-activations (the minimal residual: ReLU and
             dropout masks are *recomputed* in backward, never stored);
  backward — re-derives the masks, runs the reverse chain, and accumulates
             dW/db in VMEM across the sequential TPU grid (revisited output
             blocks), emitting per-block dx.

Dropout uses a counter-based hash (murmur-style finalizer of
(seed, layer, global row, lane)) instead of a stateful PRNG: identical bits in
forward and backward by construction, no RNG state, and exact replay in
pallas interpret mode on CPU for the parity tests.  The Bernoulli(keep)
distribution matches the XLA path's uint16-threshold masks; the streams
differ (documented — same training distribution, different RNG).

Weight-norm materialization and padding happen OUTSIDE the custom_vjp in
plain jnp (ops/decoder_kernel.build_branch_plan), so gradients flow through
g·v/||v|| automatically and the kernel sees dense matrices.

Structure supported: the canonical AlignSDF decoders — weight_norm trunks,
latent_in re-injection, dropout on hidden layers, final tanh, classifier at
the last layer's input (reference networks/model.py:191-350).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alignsdf_tpu.config import Specs
from alignsdf_tpu.ops.decoder_kernel import (
    _round_up,
    build_branch_plan,
    pad_inputs,
    separate_decoder_inputs,
)


def _dropout_gate(seed, layer: int, blk: int, out_pad: int, keep: float,
                  block_idx):
    """Deterministic Bernoulli(keep) gate for one (blk, out_pad) tile:
    murmur3-style finalizer of (seed, layer, global row, lane).  uint32
    arithmetic wraps; identical bits wherever it is evaluated."""
    row = jax.lax.broadcasted_iota(jnp.uint32, (blk, out_pad), 0)
    col = jax.lax.broadcasted_iota(jnp.uint32, (blk, out_pad), 1)
    grow = row + jnp.uint32(blk) * block_idx.astype(jnp.uint32)
    h = (seed.astype(jnp.uint32)
         ^ (grow * jnp.uint32(0x9E3779B1))
         ^ (col * jnp.uint32(0x85EBCA6B))
         ^ jnp.uint32((layer * 0xC2B2AE35) & 0xFFFFFFFF))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    thresh = jnp.uint32(min(int(round(keep * 2 ** 32)), 2 ** 32 - 1))
    return (h < thresh).astype(jnp.float32) * jnp.float32(1.0 / keep)


def _plan_statics(n_layers: int, inject_pattern: Tuple[bool, ...],
                  dropout_pattern: Tuple[bool, ...], keep: float,
                  block: int, compute_dtype: str, train: bool,
                  interpret: bool, need_xlast: bool = True):
    return (n_layers, inject_pattern, dropout_pattern, float(keep), int(block),
            compute_dtype, bool(train), bool(interpret), bool(need_xlast))


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_branch(static, weights, injects, biases, x0, seed):
    """One trunk, fused: returns (y (M, 128) f32, x_last (M, H_pad) f32).

    ``y`` column 0 (and 1 for combined trunks) is the tanh'd SDF; ``x_last``
    is the final layer's input — the classifier head consumes it in XLA so
    its gradient flows back through the custom VJP's second cotangent.
    """
    (y, x_last), _ = _fused_branch_fwd(static, weights, injects, biases, x0,
                                       seed)
    return y, x_last


def _fwd_kernel(static, seed_ref, x0_ref, *refs):
    (n_layers, inject_p, dropout_p, keep, block, cdtype, train, _,
     need_xlast) = static
    dtype = jnp.dtype(cdtype)
    n_inj = sum(inject_p)
    w_refs, refs = refs[:n_layers], refs[n_layers:]
    inj_refs, refs = refs[:n_inj], refs[n_inj:]
    b_refs, refs = refs[:n_layers], refs[n_layers:]
    y_ref = refs[0]
    xlast_ref = refs[1] if need_xlast else None
    a_refs = refs[2:] if need_xlast else refs[1:]

    gid = pl.program_id(0)
    seed = seed_ref[0]
    inj_it = iter(inj_refs)
    injs = [next(inj_it) if p else None for p in inject_p]

    x0 = x0_ref[:].astype(dtype)
    x = x0
    for layer in range(n_layers):
        if layer == n_layers - 1 and xlast_ref is not None:
            xlast_ref[:] = x.astype(jnp.float32)
        acc = jnp.dot(x, w_refs[layer][:],
                      preferred_element_type=jnp.float32)
        if injs[layer] is not None:
            acc = acc + jnp.dot(x0, injs[layer][:],
                                preferred_element_type=jnp.float32)
        # row 0 of the bias ref: (1, h) for plain biases, row 0 of an (8, h)
        # scene-table block for the scene-factored variant
        acc = acc + b_refs[layer][0:1, :]
        if layer < n_layers - 1:
            x = jnp.maximum(acc, 0.0)
            if train and dropout_p[layer]:
                x = x * _dropout_gate(seed, layer, x.shape[0], x.shape[1],
                                      keep, gid)
            # residual = the GATED activation: backward recovers the combined
            # relu*dropout gate as (acts > 0) / keep (acts > 0 iff a > 0 and
            # the unit was kept) — no PRNG replay in backward (r5: the gate
            # hash was ~7G VPU ops/step per direction at b64)
            a_refs[layer][:] = x.astype(a_refs[layer].dtype)
            x = x.astype(dtype)
        else:
            # scene variant keeps only 8 live output lanes (out_dim <= 2):
            # a (M, 8) y tile is 16x less HBM than the padded (M, 128) one
            y_ref[:] = jnp.tanh(acc[:, : y_ref.shape[1]])


def _fused_branch_fwd(static, weights, injects, biases, x0, seed):
    (n_layers, inject_p, dropout_p, keep, block, cdtype, train, interpret,
     need_xlast) = static
    m = x0.shape[0]
    m_pad = _round_up(m, block)
    if m_pad != m:
        x0 = jnp.pad(x0, ((0, m_pad - m), (0, 0)))
    in_pad = x0.shape[1]
    h_pads = [w.shape[1] for w in weights]
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    rdtype = jnp.dtype(cdtype)  # residual dtype (halves HBM traffic on bf16)

    # cast weights to the compute dtype ONCE here (not per block in-kernel)
    dt = jnp.dtype(cdtype)
    weights_k = [w.astype(dt) for w in weights]
    injects_k = [w.astype(dt) if w is not None else None for w in injects]
    x0 = x0.astype(dt)

    inj_flat = [w for w in injects_k if w is not None]
    grid = (m_pad // block,)

    def rep_spec(op):
        return pl.BlockSpec(op.shape,
                            partial(lambda nd, i: (0,) * nd, len(op.shape)),
                            memory_space=pltpu.VMEM)

    out_shapes = [jax.ShapeDtypeStruct((m_pad, h_pads[-1]), jnp.float32)]  # y
    out_specs = [pl.BlockSpec((block, h_pads[-1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if need_xlast:  # classifier-head input (skipped when no classifier)
        out_shapes.append(jax.ShapeDtypeStruct((m_pad, h_pads[-2]), jnp.float32))
        out_specs.append(pl.BlockSpec((block, h_pads[-2]), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    out_shapes += [jax.ShapeDtypeStruct((m_pad, h_pads[i]), rdtype)
                   for i in range(n_layers - 1)]                        # a_i
    out_specs += [pl.BlockSpec((block, h_pads[i]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
                  for i in range(n_layers - 1)]

    outs = pl.pallas_call(
        partial(_fwd_kernel, static),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block, in_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[rep_spec(w) for w in weights_k],
            *[rep_spec(w) for w in inj_flat],
            *[rep_spec(b) for b in biases],
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(seed_arr, x0, *weights_k, *inj_flat, *biases)

    if need_xlast:
        y, x_last, *a_list = outs
        x_last = x_last[:m]
    else:
        y, *a_list = outs
        x_last = jnp.zeros((m, h_pads[-2]), jnp.float32)  # DCE'd by XLA
    res = (weights_k, injects_k, x0, tuple(a_list), y, seed_arr, m)
    return (y[:m], x_last), res


def _bwd_kernel(static, seed_ref, x0_ref, dy_ref, *refs):
    (n_layers, inject_p, dropout_p, keep, block, cdtype, train, _,
     need_xlast) = static
    if need_xlast:
        dxlast_ref, refs = refs[0], refs[1:]
    else:
        dxlast_ref = None
    dtype = jnp.dtype(cdtype)
    n_inj = sum(inject_p)
    w_refs, refs = refs[:n_layers], refs[n_layers:]
    inj_refs, refs = refs[:n_inj], refs[n_inj:]
    a_refs, refs = refs[:n_layers - 1], refs[n_layers - 1:]
    y_ref = refs[0]
    out_refs = refs[1:]
    dx0_ref = out_refs[0]
    dw_refs = out_refs[1:1 + n_layers]
    dinj_refs = out_refs[1 + n_layers:1 + n_layers + n_inj]
    db_refs = out_refs[1 + n_layers + n_inj:]

    gid = pl.program_id(0)
    seed = seed_ref[0]

    @pl.when(gid == 0)
    def _init():
        for r in list(dw_refs) + list(dinj_refs) + list(db_refs):
            r[:] = jnp.zeros_like(r)

    inj_it = iter(inj_refs)
    injs = [next(inj_it) if p else None for p in inject_p]
    dinj_it = iter(dinj_refs)
    dinjs = [next(dinj_it) if p else None for p in inject_p]

    x0 = x0_ref[:].astype(dtype)
    blk = x0.shape[0]

    # phase 1: the residuals ARE the gated layer inputs x_l; the combined
    # relu*dropout gate is (x_l > 0) / keep exactly (x_l = a * gate > 0 iff
    # a > 0 and the unit was kept) — no gate-PRNG replay
    xs = [x0]
    gates = []
    for layer in range(n_layers - 1):
        a = a_refs[layer][:].astype(jnp.float32)  # gated acts, may be bf16
        scale = (1.0 / keep) if (train and dropout_p[layer]) else 1.0
        gates.append((a > 0.0).astype(jnp.float32) * jnp.float32(scale))
        xs.append(a.astype(dtype))

    def mm_t_lhs(x, d):  # x^T @ d without an explicit transpose
        return jax.lax.dot_general(x, d.astype(dtype),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # phase 2: reverse chain
    y = y_ref[:]
    dpre = dy_ref[:] * (1.0 - y * y)  # tanh'
    dx0_acc = jnp.zeros_like(x0, dtype=jnp.float32)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == 0
    for layer in range(n_layers - 1, -1, -1):
        x_l = xs[layer]
        dw_refs[layer][:] += mm_t_lhs(x_l, dpre)
        db_refs[layer][:] += jnp.where(
            row0, jnp.sum(dpre, axis=0, keepdims=True), 0.0)
        if dinjs[layer] is not None:
            dinjs[layer][:] += mm_t_lhs(x0, dpre)
            dx0_acc = dx0_acc + jax.lax.dot_general(
                dpre.astype(dtype), injs[layer][:],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        dx = jax.lax.dot_general(
            dpre.astype(dtype), w_refs[layer][:],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if layer == n_layers - 1 and dxlast_ref is not None:
            dx = dx + dxlast_ref[:]  # classifier-head cotangent enters here
        if layer > 0:
            dpre = dx * gates[layer - 1]
        else:
            dx0_acc = dx0_acc + dx
    dx0_ref[:] = dx0_acc


def _fused_branch_bwd(static, res, cots):
    (n_layers, inject_p, dropout_p, keep, block, cdtype, train, interpret,
     need_xlast) = static
    weights, injects, x0, a_list, y, seed_arr, m = res
    dy, dx_last = cots
    m_pad = x0.shape[0]
    if m_pad != m:
        dy = jnp.pad(dy, ((0, m_pad - m), (0, 0)))
        if need_xlast:
            dx_last = jnp.pad(dx_last, ((0, m_pad - m), (0, 0)))
    in_pad = x0.shape[1]
    inj_flat = [w for w in injects if w is not None]
    n_inj = len(inj_flat)
    grid = (m_pad // block,)

    def rep_spec(op):
        return pl.BlockSpec(op.shape,
                            partial(lambda nd, i: (0,) * nd, len(op.shape)),
                            memory_space=pltpu.VMEM)

    def acc_spec(shape):  # accumulated across the sequential grid
        return pl.BlockSpec(shape, partial(lambda nd, i: (0,) * nd, len(shape)),
                            memory_space=pltpu.VMEM)

    blk_spec = lambda w: pl.BlockSpec((block, w), lambda i: (i, 0),  # noqa: E731
                                      memory_space=pltpu.VMEM)

    out_shapes = (
        [jax.ShapeDtypeStruct((m_pad, in_pad), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in inj_flat]
        + [jax.ShapeDtypeStruct((8, w.shape[1]), jnp.float32)  # db in row 0
           for w in weights]
    )
    out_specs = (
        [blk_spec(in_pad)]
        + [acc_spec(w.shape) for w in weights]
        + [acc_spec(w.shape) for w in inj_flat]
        + [acc_spec((8, w.shape[1])) for w in weights]
    )

    outs = pl.pallas_call(
        partial(_bwd_kernel, static),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk_spec(in_pad),                       # x0
            blk_spec(dy.shape[1]),                  # dy
            *([blk_spec(dx_last.shape[1])] if need_xlast else []),
            *[rep_spec(w) for w in weights],
            *[rep_spec(w) for w in inj_flat],
            *[blk_spec(a.shape[1]) for a in a_list],
            blk_spec(y.shape[1]),                   # y
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(seed_arr, x0, dy, *([dx_last] if need_xlast else []),
      *weights, *inj_flat, *a_list, y)

    dx0 = outs[0][:m]
    dws = tuple(outs[1:1 + n_layers])
    dinj_flat = list(outs[1 + n_layers:1 + n_layers + n_inj])
    it = iter(dinj_flat)
    dinjects = tuple(next(it) if p else None for p in inject_p)
    dbs = tuple(o[0:1] for o in outs[1 + n_layers + n_inj:])  # db lives in row 0
    return dws, dinjects, dbs, dx0, None


fused_branch.defvjp(_fused_branch_fwd, _fused_branch_bwd)


# ---------------------------------------------------------------------------
# Scene-factored variant: the training latent is per-SCENE (batch 64 scenes x
# 2000 points), so materializing [latent, embed] rows for every point wastes
# ~20% of the decoder FLOPs (latent @ W recomputed per point) and ~1.5 ms/step
# of concat/pad/select glue plus a (M, 384) f32 dx write (xplane trace,
# BASELINE.md).  Here the latent half of every x0-consuming layer is folded
# OUTSIDE the kernel into per-scene effective biases
#
#   beff_l[s] = b_l + latent[s] @ W_l[:latent_size]        (64, 512) tables
#
# and the kernel streams only the narrow embedding columns (block, emb_pad),
# reading its scene's bias row via the BlockSpec index map.  Backward emits
# per-scene bias-cotangent tables instead of the latent columns of dx; XLA
# turns those into d_latent / dW_lat with two tiny matmuls.  The forward
# kernel body is _fwd_kernel unchanged (x0 == emb).
# ---------------------------------------------------------------------------


def _scene_statics(base_static, bps: int, scene_bias: Tuple[bool, ...]):
    return base_static + (int(bps), tuple(scene_bias))


def _vmem_kwargs(interpret):
    """Raise the scoped-VMEM budget for larger point blocks (v5e: 128 MB
    physical)."""
    if interpret:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}


def _lm_blocks(y_lm: jax.Array, block: int) -> jax.Array:
    """(8, M) lanes-major -> (M//block, 8, block): each grid step's tile is
    one leading-index slice (Mosaic requires the block's lane dim to be
    128-divisible or equal to the array's last dim)."""
    m = y_lm.shape[1]
    return y_lm.reshape(8, m // block, block).transpose(1, 0, 2)


def _lm_unblocks(y3: jax.Array) -> jax.Array:
    nb, _, block = y3.shape
    return y3.transpose(1, 0, 2).reshape(8, nb * block)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_branch_scene(static, weights, injects, biases, emb, seed):
    """One trunk on (scenes x points-per-scene) input: weights[0] and the
    inject weights hold only embedding columns; biases[l] is a per-scene
    (B*8, out_pad) row-0-of-8 table for x0-consuming layers, (1, out_pad)
    otherwise.  Returns (y (8, M) f32 LANES-MAJOR — rows 0..out_dim valid —
    and x_last (M, H_pad) f32).

    Lanes-major y is deliberate: the loss consumes per-branch 1-D columns,
    and row slices of a dense-lane (8, M) array are free, while the (M, 8)
    points-major form made XLA materialize ~2 ms/step of pathological 8-lane
    pad/copy glue for the y slice and its dy cotangent (b128 xplane trace).
    """
    (y, x_last), _ = _fused_scene_fwd(static, weights, injects, biases, emb,
                                      seed)
    return y, x_last


def _fwd_kernel_scene(static, seed_ref, x0_ref, *refs):
    """The shared layer chain of _fwd_kernel, but the final tanh output is
    emitted LANES-MAJOR as a (1, 8, BLK) tile: rows = sel @ acc^T (one tiny
    MXU matmul re-orients the live output columns onto sublanes)."""
    (n_layers, inject_p, dropout_p, keep, block, cdtype, train, _,
     need_xlast) = static
    dtype = jnp.dtype(cdtype)
    n_inj = sum(inject_p)
    w_refs, refs = refs[:n_layers], refs[n_layers:]
    inj_refs, refs = refs[:n_inj], refs[n_inj:]
    b_refs, refs = refs[:n_layers], refs[n_layers:]
    sel_ref = refs[0]
    y_ref = refs[1]
    xlast_ref = refs[2] if need_xlast else None
    a_refs = refs[3:] if need_xlast else refs[2:]

    gid = pl.program_id(0)
    seed = seed_ref[0]
    inj_it = iter(inj_refs)
    injs = [next(inj_it) if p else None for p in inject_p]

    x0 = x0_ref[:].astype(dtype)
    x = x0
    for layer in range(n_layers):
        if layer == n_layers - 1 and xlast_ref is not None:
            xlast_ref[:] = x.astype(jnp.float32)
        acc = jnp.dot(x, w_refs[layer][:],
                      preferred_element_type=jnp.float32)
        if injs[layer] is not None:
            acc = acc + jnp.dot(x0, injs[layer][:],
                                preferred_element_type=jnp.float32)
        acc = acc + b_refs[layer][0:1, :]
        if layer < n_layers - 1:
            x = jnp.maximum(acc, 0.0)
            if train and dropout_p[layer]:
                x = x * _dropout_gate(seed, layer, x.shape[0], x.shape[1],
                                      keep, gid)
            # gated-activation residual (see the generic kernel note)
            a_refs[layer][:] = x.astype(a_refs[layer].dtype)
            x = x.astype(dtype)
        else:
            rows = jax.lax.dot_general(
                sel_ref[:], acc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # (8, BLK)
            y_ref[0] = jnp.tanh(rows)  # rows >= out_dim are tanh(0) = 0


def _sel8(h_last: int) -> jax.Array:
    return jnp.zeros((8, h_last), jnp.float32).at[
        jnp.arange(8), jnp.arange(8)].set(1.0)


def _fused_scene_fwd(static, weights, injects, biases, emb, seed):
    (n_layers, inject_p, dropout_p, keep, block, cdtype, train, interpret,
     need_xlast, bps, scene_bias) = static
    m = emb.shape[0]
    assert m % block == 0, (m, block)
    emb_pad = emb.shape[1]
    h_pads = [w.shape[1] for w in weights]
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    rdtype = jnp.dtype(cdtype)

    dt = jnp.dtype(cdtype)
    weights_k = [w.astype(dt) for w in weights]
    injects_k = [w.astype(dt) if w is not None else None for w in injects]
    emb = emb.astype(dt)
    inj_flat = [w for w in injects_k if w is not None]
    grid = (m // block,)

    def rep_spec(op):
        return pl.BlockSpec(op.shape,
                            partial(lambda nd, i: (0,) * nd, len(op.shape)),
                            memory_space=pltpu.VMEM)

    def bias_spec(layer, b):
        if scene_bias[layer]:
            # (B*8, h) table, scene's 8-row band (row 0 valid) per block —
            # Mosaic requires >= (8, 128) blocks
            return pl.BlockSpec((8, b.shape[1]), lambda i: (i // bps, 0),
                                memory_space=pltpu.VMEM)
        return rep_spec(b)

    base_static = static[:9]
    sel = _sel8(h_pads[-1])
    out_shapes = [jax.ShapeDtypeStruct((m // block, 8, block), jnp.float32)]
    out_specs = [pl.BlockSpec((1, 8, block), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if need_xlast:
        out_shapes.append(jax.ShapeDtypeStruct((m, h_pads[-2]), jnp.float32))
        out_specs.append(pl.BlockSpec((block, h_pads[-2]), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    out_shapes += [jax.ShapeDtypeStruct((m, h_pads[i]), rdtype)
                   for i in range(n_layers - 1)]
    out_specs += [pl.BlockSpec((block, h_pads[i]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
                  for i in range(n_layers - 1)]

    outs = pl.pallas_call(
        partial(_fwd_kernel_scene, base_static),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block, emb_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[rep_spec(w) for w in weights_k],
            *[rep_spec(w) for w in inj_flat],
            *[bias_spec(layer, b) for layer, b in enumerate(biases)],
            rep_spec(sel),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(seed_arr, emb, *weights_k, *inj_flat, *biases, sel)

    if need_xlast:
        y3, x_last, *a_list = outs
    else:
        y3, *a_list = outs
        x_last = jnp.zeros((m, h_pads[-2]), jnp.float32)  # DCE'd by XLA
    res = (weights_k, injects_k, emb, tuple(a_list), y3, seed_arr,
           tuple(b.shape for b in biases))
    return (_lm_unblocks(y3), x_last), res


def _bwd_kernel_scene(static, seed_ref, emb_ref, dy_ref, *refs):
    (n_layers, inject_p, dropout_p, keep, block, cdtype, train, _,
     need_xlast, bps, scene_bias) = static
    if need_xlast:
        dxlast_ref, refs = refs[0], refs[1:]
    else:
        dxlast_ref = None
    dtype = jnp.dtype(cdtype)
    n_inj = sum(inject_p)
    w_refs, refs = refs[:n_layers], refs[n_layers:]
    inj_refs, refs = refs[:n_inj], refs[n_inj:]
    a_refs, refs = refs[:n_layers - 1], refs[n_layers - 1:]
    y_ref = refs[0]
    sel_ref = refs[1]   # (8, h_last) lane-embedding eye
    n_scene = sum(scene_bias)
    out_refs = refs[2:]
    demb_ref = out_refs[0]
    dw_refs = out_refs[1:1 + n_layers]
    dinj_refs = out_refs[1 + n_layers:1 + n_layers + n_inj]
    db_refs = out_refs[1 + n_layers + n_inj:1 + 2 * n_layers + n_inj]
    # per-scene db tables accumulate in SCRATCH, flushed to their revisited
    # output windows once per scene group: read-modify-write of a revisited
    # output window is silently wrong on real Mosaic (measured on the pixel
    # kernel: bps=1 exact, bps=2 ~3% off; interpret mode cannot catch it).
    # Global accumulators (constant index windows) are unaffected.
    scr_it = iter(out_refs[1 + 2 * n_layers + n_inj:])
    db_accs = [next(scr_it) if scene_bias[layer] else None
               for layer in range(n_layers)]

    gid = pl.program_id(0)
    seed = seed_ref[0]

    @pl.when(gid == 0)
    def _init():
        for r in list(dw_refs) + list(dinj_refs):
            r[:] = jnp.zeros_like(r)
        for layer, r in enumerate(db_refs):
            if not scene_bias[layer]:
                r[:] = jnp.zeros_like(r)

    @pl.when(gid % bps == 0)
    def _init_scene():
        for acc in db_accs:
            if acc is not None:
                acc[:] = jnp.zeros_like(acc)

    inj_it = iter(inj_refs)
    injs = [next(inj_it) if p else None for p in inject_p]
    dinj_it = iter(dinj_refs)
    dinjs = [next(dinj_it) if p else None for p in inject_p]

    x0 = emb_ref[:].astype(dtype)
    blk = x0.shape[0]

    # gated-activation residuals: gate = (x_l > 0) / keep exactly, no
    # gate-PRNG replay (see the generic kernel note)
    xs = [x0]
    gates = []
    for layer in range(n_layers - 1):
        a = a_refs[layer][:].astype(jnp.float32)
        scale = (1.0 / keep) if (train and dropout_p[layer]) else 1.0
        gates.append((a > 0.0).astype(jnp.float32) * jnp.float32(scale))
        xs.append(a.astype(dtype))

    def mm_t_lhs(x, d):
        return jax.lax.dot_general(x, d.astype(dtype),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # y/dy arrive LANES-MAJOR (1, 8, BLK); the tanh' product re-embeds into
    # the padded output width with one tiny (8, BLK)^T x (8, h) matmul
    y8 = y_ref[0]
    g_lm = dy_ref[0] * (1.0 - y8 * y8)
    dpre = jax.lax.dot_general(g_lm, sel_ref[:], (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    demb_acc = jnp.zeros_like(x0, dtype=jnp.float32)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == 0
    for layer in range(n_layers - 1, -1, -1):
        x_l = xs[layer]
        dw_refs[layer][:] += mm_t_lhs(x_l, dpre)
        dsum = jnp.sum(dpre, axis=0, keepdims=True)
        db_dst = db_accs[layer] if scene_bias[layer] else db_refs[layer]
        db_dst[:] += jnp.where(row0, dsum, 0.0)
        if dinjs[layer] is not None:
            dinjs[layer][:] += mm_t_lhs(x0, dpre)
            demb_acc = demb_acc + jax.lax.dot_general(
                dpre.astype(dtype), injs[layer][:],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        dx = jax.lax.dot_general(
            dpre.astype(dtype), w_refs[layer][:],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if layer == n_layers - 1 and dxlast_ref is not None:
            dx = dx + dxlast_ref[:]
        if layer > 0:
            dpre = dx * gates[layer - 1]
        else:
            demb_acc = demb_acc + dx
    demb_ref[:] = demb_acc

    @pl.when(gid % bps == bps - 1)
    def _flush_scene():
        for layer, acc in enumerate(db_accs):
            if acc is not None:
                db_refs[layer][:] = acc[:]


def _fused_scene_bwd(static, res, cots):
    (n_layers, inject_p, dropout_p, keep, block, cdtype, train, interpret,
     need_xlast, bps, scene_bias) = static
    weights, injects, emb, a_list, y3, seed_arr, bias_shapes = res
    dy_lm, dx_last = cots   # dy arrives lanes-major (8, M), dense lanes
    dy3 = _lm_blocks(dy_lm, block)
    m = emb.shape[0]
    emb_pad = emb.shape[1]
    inj_flat = [w for w in injects if w is not None]
    n_inj = len(inj_flat)
    grid = (m // block,)

    def rep_spec(op):
        return pl.BlockSpec(op.shape,
                            partial(lambda nd, i: (0,) * nd, len(op.shape)),
                            memory_space=pltpu.VMEM)

    def acc_spec(shape):
        return pl.BlockSpec(shape, partial(lambda nd, i: (0,) * nd, len(shape)),
                            memory_space=pltpu.VMEM)

    blk_spec = lambda w: pl.BlockSpec((block, w), lambda i: (i, 0),  # noqa: E731
                                      memory_space=pltpu.VMEM)

    # every bias cotangent accumulates in a row-0-of-8 layout: scene tables
    # are (B*8, h) with an (8, h) scene-indexed block; plain biases widen to
    # a global (8, h) accumulator like the generic kernel
    bias_shapes = tuple(
        s if scene_bias[layer] else (8, s[1])
        for layer, s in enumerate(bias_shapes)
    )

    def db_shape(layer):
        b, h = bias_shapes[layer]
        return jax.ShapeDtypeStruct((b, h), jnp.float32)

    def db_spec(layer):
        b, h = bias_shapes[layer]
        if scene_bias[layer]:
            return pl.BlockSpec((8, h), lambda i: (i // bps, 0),
                                memory_space=pltpu.VMEM)
        return acc_spec((b, h))

    out_shapes = (
        [jax.ShapeDtypeStruct((m, emb_pad), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in inj_flat]
        + [db_shape(layer) for layer in range(n_layers)]
    )
    out_specs = (
        [blk_spec(emb_pad)]
        + [acc_spec(w.shape) for w in weights]
        + [acc_spec(w.shape) for w in inj_flat]
        + [db_spec(layer) for layer in range(n_layers)]
    )

    h_last = weights[-1].shape[1]
    sel = _sel8(h_last)
    lm_spec = pl.BlockSpec((1, 8, block), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        partial(_bwd_kernel_scene, static),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk_spec(emb_pad),
            lm_spec,                                # dy (nb, 8, block)
            *([blk_spec(dx_last.shape[1])] if need_xlast else []),
            *[rep_spec(w) for w in weights],
            *[rep_spec(w) for w in inj_flat],
            *[blk_spec(a.shape[1]) for a in a_list],
            lm_spec,                                # y (nb, 8, block)
            rep_spec(sel),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((8, bias_shapes[layer][1]), jnp.float32)
                        for layer in range(n_layers) if scene_bias[layer]],
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(seed_arr, emb, dy3, *([dx_last] if need_xlast else []),
      *weights, *inj_flat, *a_list, y3, sel)

    demb = outs[0]
    dws = tuple(outs[1:1 + n_layers])
    dinj_flat = list(outs[1 + n_layers:1 + n_layers + n_inj])
    it = iter(dinj_flat)
    dinjects = tuple(next(it) if p else None for p in inject_p)
    db_raw = outs[1 + n_layers + n_inj:]
    # scene tables keep their (B*8, h) shape (rows 1-7 are zero — the unused
    # pad rows of the input table get zero cotangent); plain biases -> row 0
    dbs = tuple(o if scene_bias[layer] else o[0:1]
                for layer, o in enumerate(db_raw))
    return dws, dinjects, dbs, demb, None


fused_branch_scene.defvjp(_fused_scene_fwd, _fused_scene_bwd)


def _scene_block(n: int, cap: int = 512) -> Optional[int]:
    """Largest divisor of the per-scene point count that is a multiple of 16
    (bf16 sublane) and <= cap; None if no usable block exists."""
    best = None
    for b in range(16, cap + 1, 16):
        if n % b == 0:
            best = b
    return best


def make_fused_train_decoder_factored(specs: Specs,
                                      interpret: Optional[bool] = None,
                                      block_cap: int = 2048):
    """decode(decoder_params, latent (B, ls), emb (M, pfs), seed, train) ->
    (sdf_h, sdf_o, logits) via fused_branch_scene, or None when the config
    needs materialized per-point inputs (pixel_align) or the kernel can't
    block the per-scene point count.  decode.factored is True so the train
    step knows to call model.decoder_inputs_factored.

    ``block_cap`` bounds the point block; the largest divisor of
    samples_per_scene wins (2000 points/scene -> block 2000: one grid step
    per scene amortizes the VMEM gradient accumulators, measured faster than
    400 on v5e with the raised scoped-VMEM budget)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    ns = specs.network_specs
    if (not ns.weight_norm or ns.use_tanh or ns.latent_dropout
            or ns.xyz_in_all or specs.pixel_align):
        return None
    if 0 in ns.latent_in:
        # the inject loop's scene_table() for layer 0 would overwrite the
        # layer-0 table that already folded w0_lat, dropping the latent@W0
        # term; no reference config does this (latent_in=(2,)) — fall back
        return None
    block = _scene_block(specs.samples_per_scene, cap=block_cap)
    if block is None or block < 128:
        return None
    ls = specs.latent_size
    combined = specs.model_type == "1encoder1decoder"
    keep = 1.0 - ns.dropout_prob
    n_layers = len(ns.dims) + 1
    inject_pattern = tuple(layer in ns.latent_in for layer in range(n_layers))
    dropout_pattern = tuple(bool(ns.dropout) and layer in ns.dropout
                            for layer in range(n_layers - 1))
    scene_bias = tuple(layer == 0 or inject_pattern[layer]
                       for layer in range(n_layers))
    cdtype = specs.compute_dtype

    from alignsdf_tpu.ops.decoder_kernel import branch_columns

    cols_h, cols_o = branch_columns(specs)

    dt = jnp.dtype(cdtype)

    def run_branch(branch_params, prefix, cols, out_dim, latent, emb, seed,
                   train, need_xlast=False):
        in_dim = ls + len(cols)
        plan = build_branch_plan(branch_params, prefix, in_dim, ns, out_dim,
                                 dtype=jnp.float32)
        emb_pad = _round_up(len(cols), 16)
        lat_c = latent.astype(dt)

        def split(w):
            """(in0_pad, h) -> latent rows (ls, h) + padded emb rows."""
            w_lat, w_emb = w[:ls], w[ls:ls + len(cols)]
            w_emb = jnp.pad(w_emb, ((0, emb_pad - len(cols)), (0, 0)))
            return w_lat, w_emb

        def scene_table(beff):
            """(B, h) per-scene bias -> (B*8, h) row-0-of-8 table (Mosaic
            blocks must be >= 8 sublanes)."""
            return jnp.pad(beff[:, None, :], ((0, 0), (0, 7), (0, 0))).reshape(
                -1, beff.shape[-1])

        w0_lat, w0_emb = split(plan.weights[0])
        weights_s = [w0_emb] + list(plan.weights[1:])
        biases_s = list(plan.biases)
        biases_s[0] = scene_table(plan.biases[0] + jnp.dot(
            lat_c, w0_lat.astype(dt), preferred_element_type=jnp.float32))
        injects_s = []
        for layer, iw in enumerate(plan.inject_weights):
            if iw is None:
                injects_s.append(None)
                continue
            iw_lat, iw_emb = split(iw)
            injects_s.append(iw_emb)
            biases_s[layer] = scene_table(plan.biases[layer] + jnp.dot(
                lat_c, iw_lat.astype(dt), preferred_element_type=jnp.float32))

        emb_b = emb[:, cols]
        emb_b = jnp.pad(emb_b, ((0, 0), (0, emb_pad - len(cols))))

        bps = specs.samples_per_scene // block
        static = _scene_statics(
            _plan_statics(n_layers, inject_pattern, dropout_pattern, keep,
                          block, cdtype, train, interpret, need_xlast),
            bps, scene_bias)
        y, x_last = fused_branch_scene(static, tuple(weights_s),
                                       tuple(injects_s), tuple(biases_s),
                                       emb_b, seed)
        return y, x_last

    def classifier_apply(branch_params, x_last):
        from alignsdf_tpu.ops.decoder_kernel import _materialize_linear

        cw, cb = _materialize_linear(branch_params["classifier_head"])
        logits = x_last[:, :cw.shape[0]] @ cw + cb
        return logits.astype(jnp.float32)

    # y comes back lanes-major (8, M); row slices are free and the losses
    # flatten to 1-D anyway, so decode returns 1-D (M,) sdf columns — the
    # (M, 1) points-major form cost ~2 ms/step of 8-lane pad/copy glue for
    # the slice + dy cotangent (xplane, BASELINE.md round 4)
    if combined:
        def decode(decoder_params, latent, emb, seed, train=True):
            trunk = decoder_params["trunk"]
            y, x_last = run_branch(trunk, "lin", cols_h, 2, latent, emb, seed,
                                   train, need_xlast=specs.classifier_branch)
            logits = (classifier_apply(trunk, x_last)
                      if specs.classifier_branch else None)
            return y[0], y[1], logits

        decode.factored = True
        return decode

    def decode(decoder_params, latent, emb, seed, train=True):
        hand = decoder_params["hand"]
        need_cls = specs.classifier_branch and "classifier_head" in hand
        y_h, x_last = run_branch(hand, "linh", cols_h, 1, latent, emb, seed,
                                 train, need_xlast=need_cls)
        y_o, _ = run_branch(decoder_params["obj"], "lino", cols_o, 1, latent,
                            emb, seed + 1, train)
        logits = classifier_apply(hand, x_last) if need_cls else None
        return y_h[0], y_o[0], logits

    decode.factored = True
    return decode


def make_fused_train_decoder(specs: Specs, block: int = 512,
                             interpret: Optional[bool] = None):
    """decode(decoder_params, inputs, seed, train) -> (sdf_h, sdf_o, logits),
    differentiable wrt decoder_params and inputs, for the training step.

    Returns None when the decoder structure falls outside the kernel
    (LayerNorm trunks / use_tanh / latent_dropout / xyz_in_all) — callers
    keep the XLA path.  ``interpret`` defaults to True on the CPU backend
    (tests) and False on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    ns = specs.network_specs
    if (not ns.weight_norm or ns.use_tanh or ns.latent_dropout
            or ns.xyz_in_all):
        return None
    ls, pfs = specs.latent_size, specs.point_feat_size
    combined = specs.model_type == "1encoder1decoder"
    keep = 1.0 - ns.dropout_prob
    n_layers = len(ns.dims) + 1
    inject_pattern = tuple(layer in ns.latent_in for layer in range(n_layers))
    dropout_pattern = tuple(bool(ns.dropout) and layer in ns.dropout
                            for layer in range(n_layers - 1))
    cdtype = specs.compute_dtype

    def branch_in_dims():
        style = specs.encode_style
        if combined or style == "nerf":
            return ls + pfs, ls + pfs
        if style == "hand":
            return ls + pfs, ls + 3
        if style == "obj":
            return ls + 3, ls + pfs
        return ls + pfs - 3, ls + 6  # both

    in_hand, in_obj = branch_in_dims()

    def run_branch(branch_params, prefix, in_dim, out_dim, x, seed, train,
                   need_xlast=False):
        plan = build_branch_plan(branch_params, prefix, in_dim, ns, out_dim,
                                 dtype=jnp.float32)
        static = _plan_statics(n_layers, inject_pattern, dropout_pattern,
                               keep, block, cdtype, train, interpret,
                               need_xlast)
        x = pad_inputs(x, plan.weights[0].shape[0])
        y, x_last = fused_branch(static, plan.weights, plan.inject_weights,
                                 plan.biases, x, seed)
        return y, x_last

    def classifier_apply(branch_params, x_last):
        from alignsdf_tpu.ops.decoder_kernel import _materialize_linear

        cw, cb = _materialize_linear(branch_params["classifier_head"])
        logits = x_last[:, :cw.shape[0]] @ cw + cb
        return logits.astype(jnp.float32)

    if combined:
        def decode(decoder_params, inputs, seed, train=True):
            trunk = decoder_params["trunk"]
            y, x_last = run_branch(trunk, "lin", ls + pfs, 2, inputs, seed,
                                   train,
                                   need_xlast=specs.classifier_branch)
            logits = (classifier_apply(trunk, x_last)
                      if specs.classifier_branch else None)
            return y[:, 0:1], y[:, 1:2], logits

        return decode

    def decode(decoder_params, inputs, seed, train=True):
        xh, xo = separate_decoder_inputs(specs, inputs)
        hand = decoder_params["hand"]
        need_cls = specs.classifier_branch and "classifier_head" in hand
        y_h, x_last = run_branch(hand, "linh", in_hand, 1, xh, seed, train,
                                 need_xlast=need_cls)
        y_o, _ = run_branch(decoder_params["obj"], "lino", in_obj, 1, xo,
                            seed + 1, train)
        logits = classifier_apply(hand, x_last) if need_cls else None
        return y_h[:, 0:1], y_o[:, 0:1], logits

    return decode
