"""Pallas maxpool(k=3, s=2, p=1) forward + backward for the ResNet stem.

XLA's backward for the stem maxpool — a select-and-scatter plus the source
recompute — is BATCH-CONSTANT on v5e (latency-bound: identical ~1.9 ms/step
at batch 64 and 128, xplane trace, BASELINE.md round 4).  This kernel pair
reformulates the pool separably (pool_h then pool_w) in layouts where every
stride-2 selection is a LEADING-DIM pair reshape — the one de-interleave
form Mosaic compiles (probed on device; lane-dim group selects and strided
sublane slices do not):

  * H pass:  view (B, H, W, C) as (B*H, W*C) 2D; window maxes via wrap-rolls
    on the row axis with edge masks; even rows via reshape(N/2, 2, L)[:, 0].
  * W pass:  view the H-pooled (B, OH, W, C) as (B*OH*W, C) 2D; now W is the
    row axis and the same roll + pair-reshape machinery applies.

Backward re-derives per-position equality masks against the saved stage
outputs (x == pooled over the covering windows) and distributes dy through
them — upsampling dy/pooled back to the fine grid with the INVERSE pair
reshape (stack with zeros, merge leading dims).  Tie semantics deviate from
XLA's select-and-scatter (first-max wins): exact ties receive the gradient
at every tied position, per axis.  Ties between distinct f32/bf16 activation
values are measure-zero; the deviation is documented in README.

Reference analogue: the torch MaxPool2d(3, 2, 1) in networks/resnet.py:116.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # -inf stand-in that survives bf16 casts


def _roll_up(x, axis=0):
    """x shifted so row r holds old row r+1 (wrap masked by callers)."""
    return pltpu.roll(x, shift=x.shape[axis] - 1, axis=axis)


def _roll_down(x, axis=0):
    """x shifted so row r holds old row r-1."""
    return pltpu.roll(x, shift=1, axis=axis)


def _window_max(x, period: int):
    """Per-row max over {r-1, r, r+1} within each ``period``-row group (rows
    congruent to the image boundary contribute -inf across it)."""
    n, m = x.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0) % period
    up = jnp.where(row == period - 1, _NEG, _roll_up(x))     # r+1
    down = jnp.where(row == 0, _NEG, _roll_down(x))          # r-1
    return jnp.maximum(jnp.maximum(x, up), down)


def _even_rows(x):
    n, m = x.shape
    return x.reshape(n // 2, 2, m)[:, 0, :]


def _up2_rows(x, fill):
    """Inverse of _even_rows: rows 2i <- x[i], rows 2i+1 <- ``fill``."""
    n, m = x.shape
    z = jnp.full((n, 1, m), fill, x.dtype)
    return jnp.concatenate([x[:, None, :], z], axis=1).reshape(2 * n, m)


def _fwd_pass_kernel(period, x_ref, o_ref):
    # f32 for the rolls: Mosaic's dynamic_rotate rejects non-32-bit vectors;
    # max in f32 is exact for bf16 inputs so the cast round-trips losslessly
    x = x_ref[:].astype(jnp.float32)
    o_ref[:] = _even_rows(_window_max(x, period)).astype(o_ref.dtype)


def _bwd_pass_kernel(period, x_ref, p_ref, dy_ref, o_ref):
    """dx for one separable pass: dy at the coarse rows, x fine, p = pooled.
    dx[r] = sum_{o: r in win(o)} dy[o] * [x[r] == p[o]]; windows live at even
    rows after upsampling, so the three candidates are rows r-1, r, r+1 of
    the upsampled arrays (odd entries are neutralized)."""
    x = x_ref[:].astype(jnp.float32)
    p_up = _up2_rows(p_ref[:].astype(jnp.float32), _NEG)
    dy_up = _up2_rows(dy_ref[:].astype(jnp.float32), 0.0)
    n, m = x.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0) % period
    acc = jnp.where(x == p_up, dy_up, 0.0)
    p_u = jnp.where(row == period - 1, _NEG, _roll_up(p_up))
    d_u = jnp.where(row == period - 1, 0.0, _roll_up(dy_up))
    acc = acc + jnp.where(x == p_u, d_u, 0.0)
    p_d = jnp.where(row == 0, _NEG, _roll_down(p_up))
    d_d = jnp.where(row == 0, 0.0, _roll_down(dy_up))
    acc = acc + jnp.where(x == p_d, d_d, 0.0)
    o_ref[:] = acc.astype(o_ref.dtype)


def _blocking(n: int, m: int, period: int, budget_bytes: int):
    """(rows, lanes) per grid block: rows a multiple of ``period`` (the roll
    edge masks make multi-strip blocks exact — lanes are fully independent)
    that DIVIDES n, sized so one f32 working copy fits ``budget_bytes``."""
    # largest divisor of m <= 2048 — grid=(.., m // lanes) silently skips
    # tail lanes otherwise, leaving unwritten garbage for non-divisible m
    lanes = next(c for c in range(min(m, 2048), 0, -1) if m % c == 0)
    rows_target = max(1, budget_bytes // (lanes * 4))
    k_target = max(1, rows_target // period)
    strips = n // period
    k = 1
    for cand in range(1, min(k_target, strips) + 1):
        if strips % cand == 0:
            k = cand
    return period * k, lanes


def _vmem_kwargs(interpret: bool):
    if interpret:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}


def _run_pass(x2, period: int, interpret: bool):
    """Forward one separable pass on a 2-D (rows, lanes) view."""
    n, m = x2.shape
    rpb, lb = _blocking(n, m, period, 2 << 20)
    grid = (n // rpb, m // lb)
    return pl.pallas_call(
        partial(_fwd_pass_kernel, period),
        grid=grid,
        in_specs=[pl.BlockSpec((rpb, lb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rpb // 2, lb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // 2, m), x2.dtype),
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(x2)


def _run_bwd_pass(x2, p2, dy2, period: int, interpret: bool):
    n, m = x2.shape
    # smaller row blocks: the backward holds ~a dozen f32 temporaries live
    rpb, lb = _blocking(n, m, period, 512 << 10)
    grid = (n // rpb, m // lb)
    half = pl.BlockSpec((rpb // 2, lb), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_bwd_pass_kernel, period),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rpb, lb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            half, half,
        ],
        out_specs=pl.BlockSpec((rpb, lb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), x2.dtype),
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(x2, p2, dy2)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def maxpool_k3s2p1(x: jax.Array, interpret: bool = False) -> jax.Array:
    """(B, H, W, C) NHWC -> (B, H//2, W//2, C), torch MaxPool2d(3, 2, 1)
    semantics (H, W even, >= 4)."""
    y, _ = _maxpool_fwd(x, interpret)
    return y


def _maxpool_fwd(x, interpret):
    b, h, w, c = x.shape
    # H pass: rows = (b, h), lanes = (w, c)
    y1 = _run_pass(x.reshape(b * h, w * c), h, interpret)
    y1 = y1.reshape(b, h // 2, w, c)
    # W pass: rows = (b, oh, w), lanes = c
    y2 = _run_pass(y1.reshape(b * (h // 2) * w, c), w, interpret)
    y = y2.reshape(b, h // 2, w // 2, c)
    return y, (x, y1, y)


def _maxpool_bwd(interpret, res, dy):
    x, y1, y = res
    b, h, w, c = x.shape
    dy1 = _run_bwd_pass(
        y1.reshape(b * (h // 2) * w, c),
        y.reshape(b * (h // 2) * (w // 2), c),
        dy.reshape(b * (h // 2) * (w // 2), c),
        w, interpret,
    )
    dx = _run_bwd_pass(
        x.reshape(b * h, w * c),
        y1.reshape(b * (h // 2), w * c),
        dy1.reshape(b * (h // 2), w * c),
        h, interpret,
    )
    return (dx.reshape(b, h, w, c),)


maxpool_k3s2p1.defvjp(_maxpool_fwd, _maxpool_bwd)
