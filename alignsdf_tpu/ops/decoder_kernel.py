"""Fused Pallas TPU kernel for the batched per-point SDF decoder.

The hot op of the whole system: during 256^3 grid reconstruction, ~33.5M
query points run through twin 5-layer 512-wide MLPs (reference
utils/mesh.py:47-63 does this in a python loop of 2^18-point chunks).  This
kernel keeps all decoder weights resident in VMEM and streams point blocks
HBM -> VMEM -> MXU, fusing the full [linear -> (+input re-injection) -> ReLU]
x L -> tanh chain of both branches into one pallas_call:

  * weight-norm is materialized outside the kernel (one tiny XLA op per call)
    so the kernel sees dense (in, out) matrices;
  * the DeepSDF latent re-injection layer (reference networks/model.py:
    165-166,310-311) is algebraically split:  [x, input] @ W  ==
    x @ W_top + input @ W_bot  — no in-kernel concat, two MXU calls;
  * all dims are zero-padded to (8, 128) tiles; padding is exact (zero rows/
    cols and zero bias contribute nothing through matmul and ReLU);
  * output block layout: col 0 = hand sdf, col 1 = obj sdf, cols 2..2+C =
    classifier logits — one (BLK, 128) store per block.

The same structure also serves CombinedDecoder (single trunk, 2 outputs).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alignsdf_tpu.config import NetworkSpecs, Specs


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class BranchPlan(NamedTuple):
    """Static structure of one MLP trunk (weights padded, injections split)."""

    weights: Tuple[jax.Array, ...]      # layer i: (in_pad, out_pad)
    inject_weights: Tuple[Optional[jax.Array], ...]  # (in0_pad, out_pad) or None
    biases: Tuple[jax.Array, ...]       # (1, out_pad)
    out_dim: int                        # true output dim (1 or 2)


def _materialize_linear(p: Dict[str, jax.Array]) -> Tuple[jax.Array, jax.Array]:
    if "v" in p:  # weight-norm parameterization
        v, g = p["v"], p["g"]
        w = v * (g[None, :] / jnp.linalg.norm(v, axis=0, keepdims=True))
    else:
        w = p["kernel"]
    return w, p["bias"]


def build_branch_plan(
    branch_params: Dict[str, Any],
    prefix: str,
    in_dim: int,
    specs: NetworkSpecs,
    out_dim: int,
    dtype=jnp.float32,
) -> BranchPlan:
    """Pad + split one trunk's weights for the kernel.

    ``in_dim`` is the trunk's true input width (latent+embed per encode_style);
    layer dims follow the decoder construction (reference networks/model.py:
    216-247).
    """
    dims = (in_dim,) + specs.dims + (out_dim,)
    n_layers = len(dims) - 1
    in0_pad = _round_up(in_dim, 128)

    weights: List[jax.Array] = []
    inject_ws: List[Optional[jax.Array]] = []
    biases: List[jax.Array] = []

    cur_dim = in_dim
    for layer in range(n_layers):
        if layer + 1 in specs.latent_in:
            layer_out = dims[layer + 1] - dims[0]
        else:
            layer_out = dims[layer + 1]
        w, b = _materialize_linear(branch_params[f"{prefix}{layer}"])
        w = w.astype(dtype)
        b = b.astype(jnp.float32)
        out_pad = _round_up(layer_out, 128)

        if layer in specs.latent_in:
            # torch layer input was [x (cur_dim), input (in_dim)]
            w_x, w_in = w[:cur_dim], w[cur_dim:cur_dim + in_dim]
            wx_pad = jnp.zeros((_round_up(cur_dim, 128), out_pad), dtype)
            wx_pad = wx_pad.at[:cur_dim, :layer_out].set(w_x)
            wi_pad = jnp.zeros((in0_pad, out_pad), dtype)
            wi_pad = wi_pad.at[:in_dim, :layer_out].set(w_in)
            weights.append(wx_pad)
            inject_ws.append(wi_pad)
        else:
            w_pad = jnp.zeros((_round_up(cur_dim, 128), out_pad), dtype)
            w_pad = w_pad.at[:cur_dim, :layer_out].set(w)
            weights.append(w_pad)
            inject_ws.append(None)

        b_pad = jnp.zeros((1, out_pad), jnp.float32).at[0, :layer_out].set(b)
        biases.append(b_pad)
        cur_dim = layer_out

    return BranchPlan(tuple(weights), tuple(inject_ws), tuple(biases), out_dim)


def _branch_compute(x0, plan_weights, plan_inject, plan_biases, n_layers):
    """Run one trunk inside the kernel. x0: (BLK, IN0_PAD) in VMEM, in the
    plan's compute dtype (f32 for parity, bf16 for the fast path — matmuls
    always accumulate in f32 via preferred_element_type).
    Returns (final tanh output f32, input of the last layer) — the latter
    feeds the classifier head (reference networks/model.py:161-162,306-307)."""
    dtype = plan_weights[0].dtype
    x = x0
    last_input = x0
    for layer in range(n_layers):
        if layer == n_layers - 1:
            last_input = x
        w = plan_weights[layer]
        acc = jnp.dot(x, w[:], preferred_element_type=jnp.float32)
        inj = plan_inject[layer]
        if inj is not None:
            acc = acc + jnp.dot(x0, inj[:], preferred_element_type=jnp.float32)
        acc = acc + plan_biases[layer][:]
        if layer < n_layers - 1:
            x = jnp.maximum(acc, 0.0).astype(dtype)
        else:
            x = jnp.tanh(acc)
    return x, last_input


def make_fused_decoder(
    hand_plan: BranchPlan,
    obj_plan: Optional[BranchPlan],
    classifier: Optional[Tuple[jax.Array, jax.Array, int]] = None,
    block: int = 1024,
    combined: bool = False,
    interpret: bool = False,
):
    """Build the fused decoder: f(x_hand (M, IN_H), x_obj (M, IN_O)) ->
    (sdf_hand (M,1), sdf_obj (M,1), logits (M, C) | None).

    For ``combined`` decoders pass the single trunk as ``hand_plan`` (its two
    output columns are hand/obj sdf) and x_obj is ignored.

    Inputs must be pre-padded to the plans' input widths (zero-fill).
    """
    n_hand = len(hand_plan.weights)
    n_obj = len(obj_plan.weights) if obj_plan is not None else 0
    num_class = classifier[2] if classifier is not None else 0

    # flat operand list for pallas_call
    def flatten_ops():
        ops = []
        for p in (hand_plan, obj_plan) if obj_plan is not None else (hand_plan,):
            ops.extend(p.weights)
            ops.extend(w for w in p.inject_weights if w is not None)
            ops.extend(p.biases)
        if classifier is not None:
            ops.extend(classifier[:2])
        return ops

    def kernel(x_hand_ref, x_obj_ref, *op_refs):
        out_ref = op_refs[-1]
        refs = list(op_refs[:-1])

        (h_ws, h_inj, h_bs), refs = _take_plan_refs(refs, hand_plan)
        h_out, h_last_in = _branch_compute(x_hand_ref[:], h_ws, h_inj, h_bs,
                                           n_hand)
        o_out = None
        if obj_plan is not None:
            (o_ws, o_inj, o_bs), refs = _take_plan_refs(refs, obj_plan)
            o_out, _ = _branch_compute(x_obj_ref[:], o_ws, o_inj, o_bs, n_obj)

        cls_refs = tuple(refs[:2]) if classifier is not None else None
        out_ref[:] = _assemble_output(h_out, o_out, combined, cls_refs,
                                      h_last_in, num_class)

    in_h_pad = hand_plan.weights[0].shape[0]
    in_o_pad = obj_plan.weights[0].shape[0] if obj_plan is not None else 128
    compute_dtype = hand_plan.weights[0].dtype

    def run(x_hand: jax.Array, x_obj: jax.Array):
        m = x_hand.shape[0]
        m_pad = _round_up(m, block)
        if m_pad != m:
            x_hand = jnp.pad(x_hand, ((0, m_pad - m), (0, 0)))
            x_obj = jnp.pad(x_obj, ((0, m_pad - m), (0, 0)))
        # points enter the kernel in the compute dtype (halves the HBM->VMEM
        # stream in the bf16 fast path; accumulation stays f32)
        x_hand = x_hand.astype(compute_dtype)
        x_obj = x_obj.astype(compute_dtype)
        grid = (m_pad // block,)

        ops = flatten_ops()
        # weights/biases are small (~6 MB total): resident in VMEM, unblocked
        op_specs = [
            pl.BlockSpec(op.shape, partial(lambda nd, i: (0,) * nd, len(op.shape)),
                         memory_space=pltpu.VMEM)
            for op in ops
        ]

        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block, in_h_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, in_o_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                *op_specs,
            ],
            out_specs=pl.BlockSpec((block, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, 128), jnp.float32),
            interpret=interpret,
        )(x_hand, x_obj, *ops)

        out = out[:m]
        sdf_hand = out[:, 0:1]
        sdf_obj = out[:, 1:2]
        logits = out[:, 2:2 + num_class] if num_class else None
        return sdf_hand, sdf_obj, logits

    return run


def _take_plan_refs(refs: List, plan: BranchPlan):
    """Pop one branch's (weights, inject, biases) refs off the flat list."""
    n_layers = len(plan.weights)
    ws, refs = refs[:n_layers], refs[n_layers:]
    n_inj = sum(1 for w in plan.inject_weights if w is not None)
    inj_flat, refs = refs[:n_inj], refs[n_inj:]
    it = iter(inj_flat)
    inj = [next(it) if w is not None else None for w in plan.inject_weights]
    bs, refs = refs[:n_layers], refs[n_layers:]
    return (ws, inj, bs), refs


def _assemble_output(h_out, o_out, combined: bool, classifier_refs=None,
                     h_last_in=None, num_class: int = 0):
    """Pack hand/obj sdf (+ classifier logits) into one (BLK, 128) tile:
    col 0 hand, col 1 obj, cols 2..2+C logits.  Scatter is unsupported in
    Mosaic, so lanes are selected with iota masks and lane-rolls."""
    blk = h_out.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (blk, 128), 1)
    if combined:
        out = jnp.where(lane < 2, h_out, 0.0)
    else:
        out = jnp.where(lane == 0, h_out, 0.0)
        out = out + jnp.where(lane == 1, pltpu.roll(o_out, shift=1, axis=1), 0.0)
    if classifier_refs is not None:
        cw_ref, cb_ref = classifier_refs
        logits = (
            jnp.dot(h_last_in, cw_ref[:], preferred_element_type=jnp.float32)
            + cb_ref[:]
        )
        shifted = pltpu.roll(logits, shift=2, axis=1)
        out = out + jnp.where((lane >= 2) & (lane < 2 + num_class), shifted, 0.0)
    return out


class GridBranchPlan(NamedTuple):
    """Latent-folded trunk for broadcast-latent grid evaluation.

    With a single latent shared by every grid point, the wide input layers
    factor:  [latent, emb(xyz)] @ W  ==  (latent @ W_lat -> folded into the
    bias, one tiny XLA matmul per call)  +  xyz @ (A @ W_emb) + b @ W_emb
    (3 VPU broadcast-FMAs in the kernel + another bias fold), where
    emb(xyz) = xyz @ A + b is the scene's embedding as an affine map —
    exact for raw xyz AND for every kinematic encode style, since the
    pose-aligned embeddings (ops/embeddings.kinematic_embedding, reference
    utils/utils.py:376-430) are compositions of rigid transforms and
    scalings.  The wide layer-0 / inject matmuls disappear from the MXU
    entirely (~40% of the padded FLOPs of the generic kernel).
    """

    mm_weights: Tuple[Optional[jax.Array], ...]  # (in_pad, out_pad); None for layer 0
    xyz_weights: Tuple[Optional[jax.Array], ...]  # (8, out_pad) xyz rows or None
    biases: Tuple[jax.Array, ...]                # (1, out_pad), latent folded in
    out_dim: int


def build_grid_branch_plan(
    branch_params: Dict[str, Any],
    prefix: str,
    latent: jax.Array,
    latent_width: int,
    emb_a: jax.Array,   # (3, n_emb) — branch embedding as affine map of xyz
    emb_b: jax.Array,   # (n_emb,)
    specs: NetworkSpecs,
    out_dim: int,
    dtype=jnp.float32,
) -> GridBranchPlan:
    """Fold the (1, L)-latent and the affine embedding (emb = xyz@A + b) into
    per-layer biases / 3-row xyz weights."""
    n_emb = emb_a.shape[1]
    in_dim = latent_width + n_emb
    dims = (in_dim,) + specs.dims + (out_dim,)
    n_layers = len(dims) - 1
    lat = latent.astype(jnp.float32).reshape(1, latent_width)
    emb_a = emb_a.astype(jnp.float32)
    emb_b = emb_b.astype(jnp.float32).reshape(1, n_emb)

    mm_ws: List[Optional[jax.Array]] = []
    xyz_ws: List[Optional[jax.Array]] = []
    biases: List[jax.Array] = []

    cur_dim = in_dim
    for layer in range(n_layers):
        if layer + 1 in specs.latent_in:
            layer_out = dims[layer + 1] - dims[0]
        else:
            layer_out = dims[layer + 1]
        w, b = _materialize_linear(branch_params[f"{prefix}{layer}"])
        w = w.astype(jnp.float32)
        out_pad = _round_up(layer_out, 128)

        def fold(w_full, b_eff):
            """[latent, emb(xyz)] @ w_full -> (xyz weights, updated bias)."""
            w_lat, w_emb = w_full[:latent_width], w_full[latent_width:in_dim]
            b_eff = b_eff.at[:, :layer_out].add(lat @ w_lat + emb_b @ w_emb)
            z = jnp.zeros((8, out_pad), dtype)
            return z.at[:3, :layer_out].set((emb_a @ w_emb).astype(dtype)), b_eff

        b_eff = jnp.zeros((1, out_pad), jnp.float32).at[0, :layer_out].set(b)
        if layer == 0:
            xyz_w, b_eff = fold(w, b_eff)
            mm_ws.append(None)
            xyz_ws.append(xyz_w)
        elif layer in specs.latent_in:
            # torch layer input was [x (cur_dim), input (in_dim)]
            xyz_w, b_eff = fold(w[cur_dim:cur_dim + in_dim], b_eff)
            wx_pad = jnp.zeros((_round_up(cur_dim, 128), out_pad), dtype)
            mm_ws.append(
                wx_pad.at[:cur_dim, :layer_out].set(w[:cur_dim].astype(dtype)))
            xyz_ws.append(xyz_w)
        else:
            w_pad = jnp.zeros((_round_up(cur_dim, 128), out_pad), dtype)
            mm_ws.append(w_pad.at[:cur_dim, :layer_out].set(w.astype(dtype)))
            xyz_ws.append(None)
        biases.append(b_eff)
        cur_dim = layer_out

    return GridBranchPlan(tuple(mm_ws), tuple(xyz_ws), tuple(biases), out_dim)


def _grid_branch_compute(xf, yf, zf, mm_ws, xyz_ws, bs, n_layers, dtype):
    """One latent-folded trunk inside the kernel.  xf/yf/zf: (BLK, 1) f32
    coordinate columns.  Returns (tanh output f32, last layer's input)."""

    def xyz_contrib(w8_ref):
        w = w8_ref[:]  # (8, out_pad)
        return xf * w[0:1] + yf * w[1:2] + zf * w[2:3]

    x = None
    last_input = None
    for layer in range(n_layers):
        if layer == n_layers - 1:
            last_input = x
        acc = bs[layer][:]
        if mm_ws[layer] is not None:
            acc = acc + jnp.dot(x, mm_ws[layer][:],
                                preferred_element_type=jnp.float32)
        if xyz_ws[layer] is not None:
            acc = acc + xyz_contrib(xyz_ws[layer])
        if layer < n_layers - 1:
            x = jnp.maximum(acc, 0.0).astype(dtype)
        else:
            x = jnp.tanh(acc)
    return x, last_input


def make_fused_grid_kernel(
    hand_plan: GridBranchPlan,
    obj_plan: Optional[GridBranchPlan],
    classifier: Optional[Tuple[jax.Array, jax.Array, int]],
    n: int,
    block: int = 1024,
    combined: bool = False,
    interpret: bool = False,
):
    """Fully fused grid decoder (nerf style, raw xyz, broadcast latent): the
    kernel streams only 4-byte linear grid indices; coordinates are derived
    in-kernel from the index (reference utils/mesh.py:27-40 convention:
    z fastest, x slowest) and enter the latent-folded trunks as three VPU
    broadcast-FMAs (GridBranchPlan).  Per-point HBM traffic drops from
    ~2 input tiles + 1 output tile (generic kernel) to 4 B in + 1 tile out,
    and the MXU runs only the square hidden layers.

    Returns run(idx (M,) int32, origin (3,) f32, voxel () f32)
      -> (sdf_hand (M,1), sdf_obj (M,1), logits (M,C)|None).
    """
    n_hand = len(hand_plan.mm_weights)
    num_class = classifier[2] if classifier is not None else 0
    compute_dtype = next(w.dtype for w in hand_plan.mm_weights if w is not None)
    n_sq = n * n

    def plan_ops(plan):
        ops = [w for w in plan.mm_weights if w is not None]
        ops += [w for w in plan.xyz_weights if w is not None]
        ops += list(plan.biases)
        return ops

    def take_plan_refs(refs, plan):
        n_mm = sum(1 for w in plan.mm_weights if w is not None)
        n_xyz = sum(1 for w in plan.xyz_weights if w is not None)
        n_l = len(plan.mm_weights)
        mm_flat, refs = refs[:n_mm], refs[n_mm:]
        xyz_flat, refs = refs[:n_xyz], refs[n_xyz:]
        bs, refs = refs[:n_l], refs[n_l:]
        it_m, it_x = iter(mm_flat), iter(xyz_flat)
        mm = [next(it_m) if w is not None else None for w in plan.mm_weights]
        xyz = [next(it_x) if w is not None else None for w in plan.xyz_weights]
        return (mm, xyz, bs), refs

    def flatten_ops():
        ops = plan_ops(hand_plan)
        if obj_plan is not None:
            ops += plan_ops(obj_plan)
        if classifier is not None:
            ops += list(classifier[:2])
        return ops

    def kernel(scal_ref, base_ref, *op_refs):
        out_ref = op_refs[-1]
        refs = list(op_refs[:-1])

        # linear grid indices derived in-kernel: the chunk is always a
        # contiguous ascending range (grid.py evaluates arange(N^3) slabs),
        # so only its first index rides in as a scalar — no index array is
        # streamed or layout-converted at all
        p = (base_ref[0] + pl.program_id(0) * block
             + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0))
        voxel = scal_ref[3]
        xf = (p // n_sq % n).astype(jnp.float32) * voxel + scal_ref[0]
        yf = (p // n % n).astype(jnp.float32) * voxel + scal_ref[1]
        zf = (p % n).astype(jnp.float32) * voxel + scal_ref[2]

        (h_mm, h_xyz, h_bs), refs = take_plan_refs(refs, hand_plan)
        h_out, h_last_in = _grid_branch_compute(
            xf, yf, zf, h_mm, h_xyz, h_bs, n_hand, compute_dtype)
        o_out = None
        if obj_plan is not None:
            (o_mm, o_xyz, o_bs), refs = take_plan_refs(refs, obj_plan)
            o_out, _ = _grid_branch_compute(
                xf, yf, zf, o_mm, o_xyz, o_bs, len(obj_plan.mm_weights),
                compute_dtype)

        cls_refs = tuple(refs[:2]) if classifier is not None else None
        out_ref[:] = _assemble_output(h_out, o_out, combined, cls_refs,
                                      h_last_in, num_class)

    def run(idx: jax.Array, origin: jax.Array, voxel: jax.Array):
        m = idx.shape[0]
        m_pad = _round_up(m, block)
        scal = jnp.concatenate(
            [origin.astype(jnp.float32).reshape(3),
             jnp.asarray(voxel, jnp.float32).reshape(1)])
        base = idx[0].astype(jnp.int32).reshape(1)  # chunk base index

        ops = flatten_ops()
        op_specs = [
            pl.BlockSpec(op.shape, partial(lambda nd, i: (0,) * nd, len(op.shape)),
                         memory_space=pltpu.VMEM)
            for op in ops
        ]
        out = pl.pallas_call(
            kernel,
            grid=(m_pad // block,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # scal (4,)
                pl.BlockSpec(memory_space=pltpu.SMEM),  # base (1,) int32
                *op_specs,
            ],
            out_specs=pl.BlockSpec((block, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, 128), jnp.float32),
            interpret=interpret,
        )(scal, base, *ops)

        out = out[:m]
        logits = out[:, 2:2 + num_class] if num_class else None
        return out[:, 0:1], out[:, 1:2], logits

    return run


def make_fused_grid_kernel_t(
    hand_plan: GridBranchPlan,
    obj_plan: Optional[GridBranchPlan],
    classifier: Optional[Tuple[jax.Array, jax.Array, int]],
    n: int,
    block: int = 1024,
    combined: bool = False,
    interpret: bool = False,
):
    """Lanes-major variant of ``make_fused_grid_kernel``: activations live as
    (features, points) tiles instead of (points, features).

    Two wins over the points-major layout:
      * the final layers collapse into one (8, hidden) x (hidden, BLK) matmul
        whose 8 output rows are [hand, obj, class x C] directly — the padded
        (BLK, hidden) x (hidden, 128) per-branch matmuls (~11% of the kernel's
        MXU work) and the iota-mask/lane-roll output assembly disappear;
      * the output block is a dense (8, BLK) tile = 32 B/point HBM write
        instead of a (BLK, 128) tile with 2-8 live lanes = 512 B/point, and
        the downstream row slices are contiguous (no strided column gather).

    Same contract as make_fused_grid_kernel:
    run(idx (M,) int32, origin (3,), voxel ()) -> (sdf_h (M,1), sdf_o (M,1),
    logits (M,C)|None).
    """
    num_class = classifier[2] if classifier is not None else 0
    compute_dtype = next(w.dtype for w in hand_plan.mm_weights if w is not None)
    n_sq = n * n
    n_hidden_h = len(hand_plan.mm_weights) - 1
    n_hidden_o = len(obj_plan.mm_weights) - 1 if obj_plan is not None else 0

    def hidden_ops_t(plan):
        last = len(plan.mm_weights) - 1
        mm = [None if w is None else w.T for w in plan.mm_weights[:last]]
        xyz = [None if w is None else w.T for w in plan.xyz_weights[:last]]
        bias = [b.T for b in plan.biases[:last]]  # (out_pad, 1) f32
        return mm, xyz, bias

    def final_ops_t(plan, row):
        """Place the final layer's out_dim rows at ``row`` of an 8-row mat."""
        w_last = plan.mm_weights[-1]          # (cur_pad, 128), cols < out_dim
        d = plan.out_dim
        fin = jnp.zeros((8, w_last.shape[0]), w_last.dtype)
        fin = fin.at[row:row + d, :].set(w_last[:, :d].T)
        bias = jnp.zeros((8, 1), jnp.float32)
        bias = bias.at[row:row + d, 0].set(plan.biases[-1][0, :d])
        xyz = plan.xyz_weights[-1]
        fxyz = None
        if xyz is not None:  # final layer folded xyz (latent_in at last layer)
            fxyz = jnp.zeros((8, 8), jnp.float32)
            fxyz = fxyz.at[row:row + d, :3].set(xyz[:3, :d].T)
        return fin, bias, fxyz

    # flat operand list + static tag map so the kernel can rebind refs
    ops: List[jax.Array] = []
    tags: List[Tuple[str, int]] = []

    def add(tag: str, i: int, op: jax.Array):
        tags.append((tag, i))
        ops.append(op)

    h_mm, h_xyz, h_bias = hidden_ops_t(hand_plan)
    for i, w in enumerate(h_mm):
        if w is not None:
            add("h_mm", i, w)
    for i, w in enumerate(h_xyz):
        if w is not None:
            add("h_xyz", i, w)
    for i, b in enumerate(h_bias):
        add("h_b", i, b)
    if obj_plan is not None:
        o_mm, o_xyz, o_bias = hidden_ops_t(obj_plan)
        for i, w in enumerate(o_mm):
            if w is not None:
                add("o_mm", i, w)
        for i, w in enumerate(o_xyz):
            if w is not None:
                add("o_xyz", i, w)
        for i, b in enumerate(o_bias):
            add("o_b", i, b)

    fin_h, b_sdf, fxyz_h = final_ops_t(hand_plan, 0)
    fxyz_o = None
    if obj_plan is not None:
        fin_o, b_o, fxyz_o = final_ops_t(obj_plan, 1)
        b_sdf = b_sdf + b_o
    add("fin_h", 0, fin_h)
    add("b_sdf", 0, b_sdf)
    if obj_plan is not None:
        add("fin_o", 0, fin_o)
    if fxyz_h is not None:
        add("fxyz_h", 0, fxyz_h)
    if fxyz_o is not None:
        add("fxyz_o", 0, fxyz_o)
    if classifier is not None:
        cw, cb, _ = classifier
        cls_t = jnp.zeros((8, cw.shape[0]), cw.dtype)
        cls_t = cls_t.at[2:2 + num_class, :].set(cw[:, :num_class].T)
        b_cls = jnp.zeros((8, 1), jnp.float32)
        b_cls = b_cls.at[2:2 + num_class, 0].set(cb[0, :num_class])
        add("cls", 0, cls_t)
        add("b_cls", 0, b_cls)

    none_h = [None] * max(n_hidden_h, 1)
    none_o = [None] * max(n_hidden_o, 1)

    def bind(refs):
        bound = {
            "h_mm": list(none_h), "h_xyz": list(none_h), "h_b": list(none_h),
            "o_mm": list(none_o), "o_xyz": list(none_o), "o_b": list(none_o),
        }
        for (tag, i), ref in zip(tags, refs):
            if tag in bound:
                bound[tag][i] = ref
            else:
                bound[tag] = ref
        return bound

    def hidden_compute(xf, yf, zf, mm, xyz, bias, n_hidden):
        """Hidden chain in (features, points) layout; returns the input of the
        final layer as a (last_hidden_pad, BLK) tile."""
        x = None
        for layer in range(n_hidden):
            acc = bias[layer][:]
            if mm[layer] is not None:
                acc = acc + jnp.dot(mm[layer][:], x,
                                    preferred_element_type=jnp.float32)
            if xyz[layer] is not None:
                w = xyz[layer][:]
                acc = acc + w[:, 0:1] * xf + w[:, 1:2] * yf + w[:, 2:3] * zf
            x = jnp.maximum(acc, 0.0).astype(compute_dtype)
        return x

    def kernel(scal_ref, base_ref, *op_refs):
        out_ref = op_refs[-1]
        b = bind(op_refs[:-1])

        p = (base_ref[0] + pl.program_id(0) * block
             + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1))
        voxel = scal_ref[3]
        xf = (p // n_sq % n).astype(jnp.float32) * voxel + scal_ref[0]
        yf = (p // n % n).astype(jnp.float32) * voxel + scal_ref[1]
        zf = (p % n).astype(jnp.float32) * voxel + scal_ref[2]

        a_h = hidden_compute(xf, yf, zf, b["h_mm"], b["h_xyz"], b["h_b"],
                             n_hidden_h)
        acc = jnp.dot(b["fin_h"][:], a_h, preferred_element_type=jnp.float32)
        acc = acc + b["b_sdf"][:]
        if obj_plan is not None:
            a_o = hidden_compute(xf, yf, zf, b["o_mm"], b["o_xyz"], b["o_b"],
                                 n_hidden_o)
            acc = acc + jnp.dot(b["fin_o"][:], a_o,
                                preferred_element_type=jnp.float32)
        for key in ("fxyz_h", "fxyz_o"):
            if key in b:
                w = b[key][:]
                acc = acc + w[:, 0:1] * xf + w[:, 1:2] * yf + w[:, 2:3] * zf
        out = jnp.tanh(acc)  # sdf rows; zero rows stay zero through tanh
        if classifier is not None:
            out = out + jnp.dot(b["cls"][:], a_h,
                                preferred_element_type=jnp.float32)
            out = out + b["b_cls"][:]
        out_ref[:] = out

    def run(idx: jax.Array, origin: jax.Array, voxel: jax.Array):
        m = idx.shape[0]
        m_pad = _round_up(m, block)
        scal = jnp.concatenate(
            [origin.astype(jnp.float32).reshape(3),
             jnp.asarray(voxel, jnp.float32).reshape(1)])
        base = idx[0].astype(jnp.int32).reshape(1)

        op_specs = [
            pl.BlockSpec(op.shape, partial(lambda nd, i: (0,) * nd, len(op.shape)),
                         memory_space=pltpu.VMEM)
            for op in ops
        ]
        out = pl.pallas_call(
            kernel,
            grid=(m_pad // block,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # scal (4,)
                pl.BlockSpec(memory_space=pltpu.SMEM),  # base (1,) int32
                *op_specs,
            ],
            out_specs=pl.BlockSpec((8, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, m_pad), jnp.float32),
            interpret=interpret,
        )(scal, base, *ops)

        logits = out[2:2 + num_class, :m].T if num_class else None
        return out[0, :m].reshape(m, 1), out[1, :m].reshape(m, 1), logits

    return run


def make_fused_grid_decode_fn(specs: Specs, n: int, block: int = 1024,
                              interpret: bool = False, dtype=jnp.float32,
                              layout: str = "lanes"):
    """grid_decode(ctx, idx, origin, voxel) for inference/grid.py, or None if
    the config can't use the fully fused path.

    Eligible: a single broadcast latent, with raw-xyz features (nerf style,
    point_feat_size 3) or any kinematic encode style — the pose-aligned
    embeddings are affine in xyz per scene, recovered exactly by probing
    kinematic_embedding at 4 points and folded into the plans.  NeRF
    positional encoding (point_feat_size > 3 with nerf style) is nonlinear
    and stays on the generic kernel.

    ``layout`` selects the kernel data layout: "lanes" (default) computes the
    trunks feature-major (make_fused_grid_kernel_t — compact (8, M) output,
    final layers as one 8-row matmul); "points" is the point-major original.
    """
    from alignsdf_tpu.ops.embeddings import kinematic_embedding

    style, pfs = specs.encode_style, specs.point_feat_size
    kinematic = style in ("hand", "obj", "both")
    if not kinematic and pfs != 3:
        return None
    ls, ns = specs.latent_size, specs.network_specs
    combined = specs.model_type == "1encoder1decoder"
    if layout == "lanes" and specs.classifier_branch and ns.num_class > 6:
        # The lanes-major output tile has 8 rows: [hand, obj, class x C] — only
        # 6 class rows fit.  The points-major kernel's (BLK, 128) tile carries
        # up to 126 classes, so fall back to it rather than tripping an opaque
        # shape error at trace time.
        layout = "points"

    cols_h, cols_o = branch_columns(specs)

    def emb_affine(ctx):
        """The scene's embedding as emb(xyz) = xyz @ A + b, by probing."""
        if not kinematic:
            return jnp.eye(3), jnp.zeros((3,))
        probes = jnp.concatenate([jnp.zeros((1, 3)), jnp.eye(3)], axis=0)
        emb = kinematic_embedding(
            probes, 4, pfs, specs.sdf_scale_factor, style,
            rot_center=ctx.get("rot_center"),
            global_trans=ctx.get("global_trans"),
            obj_trans=ctx.get("obj_trans"),
        )
        return emb[1:4] - emb[0][None], emb[0]

    def grid_decode(ctx, idx, origin, voxel):
        dp = ctx["decoder_params"]
        latent = ctx["latent"]
        a_full, b_full = emb_affine(ctx)
        a_h, b_h = a_full[:, cols_h], b_full[cols_h]
        if combined:
            hand_plan = build_grid_branch_plan(dp["trunk"], "lin", latent, ls,
                                               a_h, b_h, ns, 2, dtype)
            obj_plan = None
            classifier = (
                _classifier_pad(dp["trunk"], hand_plan.mm_weights[-1].shape[0],
                                ns, dtype)
                if specs.classifier_branch else None
            )
        else:
            a_o, b_o = a_full[:, cols_o], b_full[cols_o]
            hand_plan = build_grid_branch_plan(dp["hand"], "linh", latent, ls,
                                               a_h, b_h, ns, 1, dtype)
            obj_plan = build_grid_branch_plan(dp["obj"], "lino", latent, ls,
                                              a_o, b_o, ns, 1, dtype)
            classifier = (
                _classifier_pad(dp["hand"], hand_plan.mm_weights[-1].shape[0],
                                ns, dtype)
                if specs.classifier_branch and "classifier_head" in dp["hand"]
                else None
            )
        make = (make_fused_grid_kernel_t if layout == "lanes"
                else make_fused_grid_kernel)
        run = make(
            hand_plan, obj_plan, classifier, n, block=block,
            combined=combined, interpret=interpret)
        return run(idx, origin, voxel)

    return grid_decode


# ---------------------------------------------------------------------------
# Pixel-aligned fused grid kernel (lanes-major).
#
# With pixel-aligned latents every grid point carries its OWN latent: the
# bicubic sample of the 64x64xC HeadNet map at the point's camera projection
# (reference utils/utils.py:536-558 + utils/mesh.py:47-55).  The latent can't
# fold into biases, but the gather-free TPU formulation of bicubic sampling is
# a matmul: the Keys cubic K (A=-0.75) has support (-2, 2), so evaluating
# K(cx - x_pix) for ALL 64 columns yields exactly the 4 tap weights (zeros
# elsewhere — and out-of-image taps get zero, matching padding_mode='zeros').
# The (HW, BLK) separable weight tile  W[cy*64+cx, p] = Ky[cy,p] * Kx[cx,p]
# never leaves VMEM; one (C, HW+128) x (HW+128, BLK) MXU matmul produces the
# per-point latent tile, with the out-of-image mean-feature fallback folded
# in as an extra F column whose W row holds (1 - in_image).
# ---------------------------------------------------------------------------


class PixelGridBranchPlan(NamedTuple):
    """Lanes-major (pre-transposed) trunk for pixel-aligned grid eval: xyz
    affine-folded like GridBranchPlan, latent kept as explicit per-layer
    weights consumed against the in-kernel latent tile."""

    mm_t: Tuple[Optional[jax.Array], ...]   # (out_pad, in_pad) or None (layer 0)
    xyz_t: Tuple[Optional[jax.Array], ...]  # (out_pad, 8) xyz cols or None
    lat_t: Tuple[Optional[jax.Array], ...]  # (out_pad, L_pad) or None
    bias_t: Tuple[jax.Array, ...]           # (out_pad, 1) f32
    out_dim: int


def build_pixel_grid_branch_plan(
    branch_params: Dict[str, Any],
    prefix: str,
    latent_width: int,
    emb_a: jax.Array,   # (3, n_emb) — branch embedding as affine map of xyz
    emb_b: jax.Array,   # (n_emb,)
    specs: NetworkSpecs,
    out_dim: int,
    dtype=jnp.float32,
) -> PixelGridBranchPlan:
    n_emb = emb_a.shape[1]
    in_dim = latent_width + n_emb
    lat_pad = _round_up(latent_width, 128)
    dims = (in_dim,) + specs.dims + (out_dim,)
    n_layers = len(dims) - 1
    emb_a = emb_a.astype(jnp.float32)
    emb_b = emb_b.astype(jnp.float32).reshape(1, n_emb)

    mm_t: List[Optional[jax.Array]] = []
    xyz_t: List[Optional[jax.Array]] = []
    lat_t: List[Optional[jax.Array]] = []
    bias_t: List[jax.Array] = []

    cur_dim = in_dim
    for layer in range(n_layers):
        if layer + 1 in specs.latent_in:
            layer_out = dims[layer + 1] - dims[0]
        else:
            layer_out = dims[layer + 1]
        w, b = _materialize_linear(branch_params[f"{prefix}{layer}"])
        w = w.astype(jnp.float32)
        out_pad = _round_up(layer_out, 128)

        def fold(w_full, b_eff):
            """[latent, emb(xyz)] @ w_full -> (lat_t, xyz_t, updated bias)."""
            w_lat, w_emb = w_full[:latent_width], w_full[latent_width:in_dim]
            b_eff = b_eff.at[:layer_out, 0].add((emb_b @ w_emb)[0])
            lt = jnp.zeros((out_pad, lat_pad), dtype)
            lt = lt.at[:layer_out, :latent_width].set(w_lat.T.astype(dtype))
            xz = jnp.zeros((out_pad, 8), jnp.float32)
            xz = xz.at[:layer_out, :3].set((emb_a @ w_emb).T)
            return lt, xz, b_eff

        b_eff = jnp.zeros((out_pad, 1), jnp.float32).at[:layer_out, 0].set(b)
        if layer == 0:
            lt, xz, b_eff = fold(w, b_eff)
            mm_t.append(None)
            lat_t.append(lt)
            xyz_t.append(xz)
        elif layer in specs.latent_in:
            lt, xz, b_eff = fold(w[cur_dim:cur_dim + in_dim], b_eff)
            wx = jnp.zeros((out_pad, _round_up(cur_dim, 128)), dtype)
            mm_t.append(
                wx.at[:layer_out, :cur_dim].set(w[:cur_dim].T.astype(dtype)))
            lat_t.append(lt)
            xyz_t.append(xz)
        else:
            wx = jnp.zeros((out_pad, _round_up(cur_dim, 128)), dtype)
            mm_t.append(wx.at[:layer_out, :cur_dim].set(w.T.astype(dtype)))
            lat_t.append(None)
            xyz_t.append(None)
        bias_t.append(b_eff)
        cur_dim = layer_out

    return PixelGridBranchPlan(tuple(mm_t), tuple(xyz_t), tuple(lat_t),
                               tuple(bias_t), out_dim)


def _keys_cubic(t: jax.Array) -> jax.Array:
    """Keys cubic convolution kernel, A=-0.75 (torch bicubic), support (-2,2).
    Same closed forms as ops.geometry._cubic_weights, evaluated at arbitrary
    tap distance."""
    a = -0.75
    s = jnp.abs(t)
    near = ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0
    far = (((s - 5.0) * s + 8.0) * s - 4.0) * a
    return jnp.where(s <= 1.0, near, jnp.where(s < 2.0, far, 0.0))


def make_fused_pixel_grid_kernel_t(
    hand_plan: Optional[PixelGridBranchPlan],
    obj_plan: Optional[PixelGridBranchPlan],
    classifier: Optional[Tuple[jax.Array, jax.Array, int]],
    feat_ext: jax.Array,    # (L_pad, HW + 128): cols 0..HW-1 map, col HW mean
    feat_hw: Tuple[int, int],   # (Hf, Wf) of the feature map
    proj: jax.Array,        # (28,) f32 projection scalars (layout below)
    n: int,
    block: int = 128,
    interpret: bool = False,
    band: Optional[int] = None,
):
    """Lanes-major fused grid decoder with in-kernel pixel-aligned latents.

    run(idx (M,), origin (3,), voxel ()) -> (sdf_h, sdf_o, logits) like
    make_fused_grid_kernel_t.  ``proj`` layout (all f32):
      [0:9]   A3 row-major — emb3 = A3^T? no: e_j = sum_i c_i * A3[i*3+j]
      [9:12]  b3
      [12:21] cam K rows
      [21:24] root
      [24]    2 / sdf_scale_factor
      [25]    (Wf - 1) / image_size
      [26]    (Hf - 1) / image_size
      [27]    image_size

    ``band``: optional BANDED sampling contraction.  A kernel block is a run
    of consecutive grid indices = a few z-lines; along a z-line the projected
    feature row yp is a Moebius function of z (monotone while the camera
    depth zh keeps its sign), so per-line endpoint projections bound every
    in-image row the block's bicubic taps can touch.  The kernel then
    contracts only ``band`` rows of the (transposed) feature table — the
    sampling matmul is the dominant MXU cost at 2.1 MFLOP/query for a 64x64
    map (BASELINE.md r5 roofline), and shrinks by Hf/band.  Excluded rows
    carry exactly-zero Keys weights (support (-2,2)), so the banded result
    is exact.  A traced ``fits`` flag falls back to the full kernel whenever
    the bound fails (zh sign change inside a line, band too narrow for the
    span), so correctness never depends on camera geometry.
    """
    num_class = classifier[2] if classifier is not None else 0
    plans = [p for p in (hand_plan, obj_plan) if p is not None]
    compute_dtype = next(
        w.dtype for p in plans for w in p.mm_t if w is not None)
    n_sq = n * n
    hf, wf = feat_hw
    hw = hf * wf
    n_hidden_h = len(hand_plan.mm_t) - 1 if hand_plan is not None else 0
    n_hidden_o = len(obj_plan.mm_t) - 1 if obj_plan is not None else 0

    ops: List[jax.Array] = []
    tags: List[Tuple[str, int]] = []

    def add(tag: str, i: int, op: jax.Array):
        tags.append((tag, i))
        ops.append(op)

    def add_plan(plan, pre):
        last = len(plan.mm_t) - 1
        for i in range(last):
            if plan.mm_t[i] is not None:
                add(f"{pre}_mm", i, plan.mm_t[i])
            if plan.xyz_t[i] is not None:
                add(f"{pre}_xyz", i, plan.xyz_t[i])
            if plan.lat_t[i] is not None:
                add(f"{pre}_lat", i, plan.lat_t[i])
            add(f"{pre}_b", i, plan.bias_t[i])

    def final_ops(plan, row):
        """Final layer packed into 8-row mats at ``row``."""
        last = len(plan.mm_t) - 1
        d = plan.out_dim
        fin = jnp.zeros((8, plan.mm_t[last].shape[1]), plan.mm_t[last].dtype)
        fin = fin.at[row:row + d].set(plan.mm_t[last][:d])
        bias = jnp.zeros((8, 1), jnp.float32)
        bias = bias.at[row:row + d].set(plan.bias_t[last][:d])
        fxyz = flat = None
        if plan.xyz_t[last] is not None:
            fxyz = jnp.zeros((8, 8), jnp.float32)
            fxyz = fxyz.at[row:row + d].set(plan.xyz_t[last][:d])
        if plan.lat_t[last] is not None:
            flat = jnp.zeros((8, plan.lat_t[last].shape[1]),
                             plan.lat_t[last].dtype)
            flat = flat.at[row:row + d].set(plan.lat_t[last][:d])
        return fin, bias, fxyz, flat

    if hand_plan is not None:
        add_plan(hand_plan, "h")
        fin_h, b_sdf, fxyz_h, flat_h = final_ops(hand_plan, 0)
    if obj_plan is not None:
        add_plan(obj_plan, "o")
        fin_o, b_o, fxyz_o, flat_o = final_ops(obj_plan, 1)
        if hand_plan is not None:
            b_sdf = b_sdf + b_o
        else:
            fin_h = None
            b_sdf = b_o
    add("fin_h", 0, fin_h) if hand_plan is not None else None
    add("b_sdf", 0, b_sdf)
    if obj_plan is not None:
        add("fin_o", 0, fin_o)
    for key, val in (("fxyz_h", fxyz_h if hand_plan is not None else None),
                     ("fxyz_o", fxyz_o if obj_plan is not None else None),
                     ("flat_h", flat_h if hand_plan is not None else None),
                     ("flat_o", flat_o if obj_plan is not None else None)):
        if val is not None:
            add(key, 0, val)
    if classifier is not None:
        cw, cb, _ = classifier
        cls_t = jnp.zeros((8, cw.shape[0]), cw.dtype)
        cls_t = cls_t.at[2:2 + num_class].set(cw[:, :num_class].T)
        b_cls = jnp.zeros((8, 1), jnp.float32)
        b_cls = b_cls.at[2:2 + num_class, 0].set(cb[0, :num_class])
        add("cls", 0, cls_t)
        add("b_cls", 0, b_cls)
    feat_c = (feat_ext.astype(compute_dtype)
              if compute_dtype != jnp.float32 else feat_ext)
    # banded variant operands: transposed map (hw, L_pad) so the band is a
    # dynamic SUBLANE slice (the train kernel's proven layout,
    # decoder_train_pixel._fwd_kernel), plus the 8 mean-fallback rows
    if band is not None:
        assert 0 < band < hf, (band, hf)
        feat_t = feat_c[:, :hw].T          # (hw, L_pad)
        feat_m = feat_c[:, hw:hw + 8].T    # (8, L_pad)
        # r0*wf must sit on a VMEM tile boundary (32 sublanes covers both
        # f32 and bf16 tiles)
        row_align = max(1, -(-32 // wf))

    none_h = [None] * max(n_hidden_h, 1)
    none_o = [None] * max(n_hidden_o, 1)

    def bind(refs, tags_v):
        bound = {
            "h_mm": list(none_h), "h_xyz": list(none_h), "h_b": list(none_h),
            "h_lat": list(none_h),
            "o_mm": list(none_o), "o_xyz": list(none_o), "o_b": list(none_o),
            "o_lat": list(none_o),
        }
        for (tag, i), ref in zip(tags_v, refs):
            if tag in bound:
                bound[tag][i] = ref
            else:
                bound[tag] = ref
        return bound

    def hidden_compute(xf, yf, zf, lat, mm, xyz, lw, bias, n_hidden):
        x = None
        for layer in range(n_hidden):
            acc = bias[layer][:]
            if mm[layer] is not None:
                acc = acc + jnp.dot(mm[layer][:], x,
                                    preferred_element_type=jnp.float32)
            if lw[layer] is not None:
                acc = acc + jnp.dot(lw[layer][:], lat,
                                    preferred_element_type=jnp.float32)
            if xyz[layer] is not None:
                w = xyz[layer][:]
                acc = acc + w[:, 0:1] * xf + w[:, 1:2] * yf + w[:, 2:3] * zf
            x = jnp.maximum(acc, 0.0).astype(compute_dtype)
        return x

    def kernel(banded, tags_v, *all_refs):
        if banded:
            rlo_ref, scal_ref, base_ref = all_refs[:3]
            op_refs = all_refs[3:]
        else:
            scal_ref, base_ref = all_refs[:2]
            op_refs = all_refs[2:]
        out_ref = op_refs[-1]
        b = bind(op_refs[:-1], tags_v)

        p = (base_ref[0] + pl.program_id(0) * block
             + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1))
        voxel = scal_ref[3]
        xf = (p // n_sq % n).astype(jnp.float32) * voxel + scal_ref[0]
        yf = (p // n % n).astype(jnp.float32) * voxel + scal_ref[1]
        zf = (p % n).astype(jnp.float32) * voxel + scal_ref[2]

        # ---- projection (reference utils/utils.py:536-549)
        pr = lambda i: scal_ref[4 + i]  # noqa: E731 — proj scalars
        e = [pr(0 + j) * xf + pr(3 + j) * yf + pr(6 + j) * zf + pr(9 + j)
             for j in range(3)]
        s2 = pr(24)
        xc = e[0] * s2 + pr(21)
        yc = e[1] * s2 + pr(22)
        zc = e[2] * s2 + pr(23)
        xh = pr(12) * xc + pr(13) * yc + pr(14) * zc
        yh = pr(15) * xc + pr(16) * yc + pr(17) * zc
        zh = pr(18) * xc + pr(19) * yc + pr(20) * zc
        inv = 1.0 / zh
        xi = xh * inv
        yi = yh * inv
        imgsz = pr(27)
        in_img = ((xi >= 0.0) & (xi <= imgsz) & (yi >= 0.0) & (yi <= imgsz)
                  & (zh != 0.0))
        mask = in_img.astype(jnp.float32)              # (1, BLK)
        # NaN/inf-safe pixel coords for the masked-out lanes
        xp = jnp.where(in_img, xi * pr(25), 0.0)
        yp = jnp.where(in_img, yi * pr(26), 0.0)

        # ---- separable bicubic weight tile (HW, BLK) + 8-row mean selector.
        # The 0/1 mask folds into the 1-D kx taps (bit-exact: a*1 = a,
        # finite*0 = 0) and the mean-fallback column block stays separate, so
        # no (HW+128, BLK) concatenated tile is ever copied in VMEM; the
        # split matmul is bit-exact (masked taps accumulate exact zeros).
        # tpu.iota is integer-only; convert for the tap-distance arithmetic
        cxi = jax.lax.broadcasted_iota(jnp.int32, (wf, block), 0).astype(
            jnp.float32)
        kx = _keys_cubic(cxi - xp) * mask              # (Wf, BLK), masked
        mrow8 = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (8, block), 0) == 0,
            1.0 - mask, 0.0).astype(compute_dtype)

        if banded:
            # contract only the block's tap-reachable rows: excluded rows
            # have exactly-zero Keys weights, so the result is exact
            r0 = rlo_ref[pl.program_id(0)]
            cyi = (jax.lax.broadcasted_iota(jnp.int32, (band, block), 0)
                   + r0).astype(jnp.float32)
            ky = _keys_cubic(cyi - yp)                 # (band, BLK)
            wxy = (ky[:, None, :] * kx[None, :, :]).reshape(band * wf, block)
            wxy = wxy.astype(compute_dtype)
            f_band = b["FT"][pl.ds(r0 * wf, band * wf), :]
            lat = jax.lax.dot_general(
                f_band, wxy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (L_pad, BLK)
            lat = lat + jax.lax.dot_general(
                b["FM"][:], mrow8, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            cyi = jax.lax.broadcasted_iota(jnp.int32, (hf, block), 0).astype(
                jnp.float32)
            ky = _keys_cubic(cyi - yp)                 # (Hf, BLK)
            wxy = (ky[:, None, :] * kx[None, :, :]).reshape(hw, block)
            wxy = wxy.astype(compute_dtype)
            fref = b["F"][:]
            lat = jnp.dot(fref[:, :hw], wxy,
                          preferred_element_type=jnp.float32)  # (L_pad, BLK)
            lat = lat + jnp.dot(fref[:, hw:hw + 8], mrow8,
                                preferred_element_type=jnp.float32)
        lat = lat.astype(compute_dtype)

        acc = b["b_sdf"][:]
        a_h = None
        if hand_plan is not None:
            a_h = hidden_compute(xf, yf, zf, lat, b["h_mm"], b["h_xyz"],
                                 b["h_lat"], b["h_b"], n_hidden_h)
            acc = acc + jnp.dot(b["fin_h"][:], a_h,
                                preferred_element_type=jnp.float32)
        if obj_plan is not None:
            a_o = hidden_compute(xf, yf, zf, lat, b["o_mm"], b["o_xyz"],
                                 b["o_lat"], b["o_b"], n_hidden_o)
            acc = acc + jnp.dot(b["fin_o"][:], a_o,
                                preferred_element_type=jnp.float32)
        for key in ("fxyz_h", "fxyz_o"):
            if key in b:
                w = b[key][:]
                acc = acc + w[:, 0:1] * xf + w[:, 1:2] * yf + w[:, 2:3] * zf
        for key in ("flat_h", "flat_o"):
            if key in b:
                acc = acc + jnp.dot(b[key][:], lat,
                                    preferred_element_type=jnp.float32)
        out = jnp.tanh(acc)
        if classifier is not None:
            out = out + jnp.dot(b["cls"][:], a_h,
                                preferred_element_type=jnp.float32)
            out = out + b["b_cls"][:]
        out_ref[:] = out

    projf = proj.astype(jnp.float32)

    def _band_plan(origin, voxel, base, m_pad):
        """Per-kernel-block feature-row band starts + a global fits flag.

        Replicates the kernel's exact f32 projection sequence at each
        z-line's two endpoints; while zh keeps its sign along a line, yp is
        monotone in z, so the (image-clamped) endpoint values bound every
        in-image row the line can touch.  A +-2-row margin absorbs ulp-level
        reassociation between XLA and Mosaic."""
        n_blocks = m_pad // block
        n_lines = m_pad // n + 3
        lin = base // n + jnp.arange(n_lines, dtype=jnp.int32)
        voxf = jnp.asarray(voxel, jnp.float32)
        orif = origin.astype(jnp.float32)
        xf = (lin // n % n).astype(jnp.float32) * voxf + orif[0]
        yf = (lin % n).astype(jnp.float32) * voxf + orif[1]

        def yp_zh(zf):
            e = [projf[0 + j] * xf + projf[3 + j] * yf + projf[6 + j] * zf
                 + projf[9 + j] for j in range(3)]
            s2 = projf[24]
            xc = e[0] * s2 + projf[21]
            yc = e[1] * s2 + projf[22]
            zc = e[2] * s2 + projf[23]
            yh = projf[15] * xc + projf[16] * yc + projf[17] * zc
            zh = projf[18] * xc + projf[19] * yc + projf[20] * zc
            return (yh * (1.0 / zh)) * projf[26], zh

        yp0, zh0 = yp_zh(jnp.float32(0.0) * voxf + orif[2])
        yp1, zh1 = yp_zh(jnp.float32(n - 1) * voxf + orif[2])
        same_sign = zh0 * zh1 > 0.0        # False on NaN / zero / pole
        lo = jnp.maximum(jnp.minimum(yp0, yp1), 0.0)
        hi = jnp.minimum(jnp.maximum(yp0, yp1), jnp.float32(hf - 1))
        empty = hi < lo                    # line fully out of image in y
        big = jnp.float32(1e9)
        lo = jnp.where(empty, big, lo)
        hi = jnp.where(empty, -big, hi)

        # fold lines into per-block windows: block i touches line offsets
        # [i*block//n, ((i+1)*block-1)//n + 1] (the +1 covers base % n != 0)
        k = block // n + 2
        lo_p = jnp.concatenate([lo, jnp.full((k,), big, jnp.float32)])
        hi_p = jnp.concatenate([hi, jnp.full((k,), -big, jnp.float32)])
        starts = (jnp.arange(n_blocks, dtype=jnp.int32) * block) // n
        blo = jax.vmap(
            lambda s: jnp.min(jax.lax.dynamic_slice(lo_p, (s,), (k,))))(starts)
        bhi = jax.vmap(
            lambda s: jnp.max(jax.lax.dynamic_slice(hi_p, (s,), (k,))))(starts)
        blk_empty = bhi < blo
        r_raw = jnp.floor(jnp.minimum(blo, big)).astype(jnp.int32) - 2
        r_hi = (hf - band) // row_align * row_align
        r0 = jnp.clip(r_raw // row_align * row_align, 0, r_hi)
        r0 = jnp.where(blk_empty, 0, r0)
        req_top = jnp.minimum(
            jnp.floor(jnp.clip(bhi, -big, big)).astype(jnp.int32) + 3, hf - 1)
        fits = (jnp.all(same_sign)
                & jnp.all(blk_empty | (req_top < r0 + band)))
        return r0.astype(jnp.int32), fits

    def run(idx: jax.Array, origin: jax.Array, voxel: jax.Array):
        m = idx.shape[0]
        m_pad = _round_up(m, block)
        scal = jnp.concatenate(
            [origin.astype(jnp.float32).reshape(3),
             jnp.asarray(voxel, jnp.float32).reshape(1),
             proj.astype(jnp.float32).reshape(-1)])
        base = idx[0].astype(jnp.int32).reshape(1)

        kwargs = {}
        if not interpret:
            # resident F (4.3 MB f32) + both trunks + the (HW, BLK) weight
            # tile overflow the default scoped-VMEM budget; v5e has 128 MB
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)

        def call(banded, rlo):
            if banded:
                tags_v = tags + [("FT", 0), ("FM", 0)]
                ops_v = ops + [feat_t, feat_m]
                pre = [rlo, scal, base]
            else:
                tags_v = tags + [("F", 0)]
                ops_v = ops + [feat_c]
                pre = [scal, base]
            op_specs = [
                pl.BlockSpec(op.shape,
                             partial(lambda nd, i: (0,) * nd, len(op.shape)),
                             memory_space=pltpu.VMEM)
                for op in ops_v
            ]
            return pl.pallas_call(
                partial(kernel, banded, tags_v),
                grid=(m_pad // block,),
                in_specs=[
                    *([pl.BlockSpec(memory_space=pltpu.SMEM)] * len(pre)),
                    *op_specs,
                ],
                out_specs=pl.BlockSpec((8, block), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, m_pad), jnp.float32),
                interpret=interpret,
                **kwargs,
            )(*pre, *ops_v)

        if band is None:
            out = call(False, None)
        else:
            rlo, fits = _band_plan(origin, voxel, idx[0].astype(jnp.int32),
                                   m_pad)
            out = jax.lax.cond(fits,
                               lambda: call(True, rlo),
                               lambda: call(False, None))

        logits = out[2:2 + num_class, :m].T if num_class else None
        h_col = out[0, :m].reshape(m, 1)
        o_col = out[1, :m].reshape(m, 1)
        return h_col, o_col, logits

    if band is not None:
        run.band_plan = _band_plan      # introspection for tests/benchmarks
    return run


def make_fused_pixel_grid_decode_fn(specs: Specs, n: int, block: int = 128,
                                    interpret: bool = False,
                                    dtype=jnp.float32,
                                    ref_projection: bool = False,
                                    band="auto"):
    """grid_decode(ctx, idx, origin, voxel) for pixel-aligned configs, or None
    when ineligible.  ctx must hold the NCHW feature map in ctx['latent'],
    plus 'cam_intr' and 'pred_root' (inference/reconstruct.py Reconstructor).

    ``ref_projection``: project the kinematic embedding's first 3 columns
    (the reference mesh path's behavior, a train/inference inconsistency —
    see inference/grid.make_grid_evaluator docstring).  Default False
    projects the RAW grid coords like the train path.

    ``band``: banded sampling contraction (make_fused_pixel_grid_kernel_t):
    "auto" picks Hf//2 for maps of 16+ rows (runtime fallback to the full
    contraction keeps any camera correct), an int forces a band height,
    None disables.
    """
    from alignsdf_tpu.ops.embeddings import kinematic_embedding

    if not specs.pixel_align:
        return None
    style, pfs = specs.encode_style, specs.point_feat_size
    kinematic = style in ("hand", "obj", "both")
    if not kinematic and pfs != 3:
        return None   # NeRF PE is nonlinear in xyz
    ls, ns = specs.latent_size, specs.network_specs
    combined = specs.model_type == "1encoder1decoder"
    if specs.classifier_branch and ns.num_class > 6:
        # only 6 class rows fit the 8-row output tile; callers fall back to
        # the chunked XLA pixel path
        return None

    cols_h, cols_o = branch_columns(specs)

    def emb_affine(ctx):
        if not kinematic:
            return jnp.eye(3), jnp.zeros((3,))
        probes = jnp.concatenate([jnp.zeros((1, 3)), jnp.eye(3)], axis=0)
        emb = kinematic_embedding(
            probes, 4, pfs, specs.sdf_scale_factor, style,
            rot_center=ctx.get("rot_center"),
            global_trans=ctx.get("global_trans"),
            obj_trans=ctx.get("obj_trans"),
        )
        return emb[1:4] - emb[0][None], emb[0]

    def grid_decode(ctx, idx, origin, voxel):
        dp = ctx["decoder_params"]
        fmap = ctx["latent"]            # (1, C, Hf, Wf) NCHW f32
        _, c, hf, wf = fmap.shape
        lat_pad = _round_up(ls, 128)
        hw = hf * wf
        flat = fmap.reshape(c, hw)
        mean = flat.mean(axis=1, keepdims=True)
        feat_ext = jnp.zeros((lat_pad, hw + 128), jnp.float32)
        feat_ext = feat_ext.at[:c, :hw].set(flat)
        feat_ext = feat_ext.at[:c, hw:hw + 1].set(mean)

        a_full, b_full = emb_affine(ctx)
        cam = ctx["cam_intr"][0, :3, :3].astype(jnp.float32)
        root = ctx["pred_root"].reshape(3).astype(jnp.float32)
        # the projection input: raw grid coords (train-consistent, identity
        # affine) unless reproducing the reference mesh path's embedded-
        # column projection
        if ref_projection:
            a_proj, b_proj = a_full[:, :3], b_full[:3]
        else:
            a_proj, b_proj = jnp.eye(3), jnp.zeros((3,))
        proj = jnp.concatenate([
            a_proj.reshape(9), b_proj.reshape(3),
            cam.reshape(9), root,
            jnp.asarray([2.0 / specs.sdf_scale_factor,
                         (wf - 1) / specs.image_size[0],
                         (hf - 1) / specs.image_size[0],
                         float(specs.image_size[0])], jnp.float32),
        ])

        a_h, b_h = a_full[:, cols_h], b_full[cols_h]
        if combined:
            hand_plan = build_pixel_grid_branch_plan(
                dp["trunk"], "lin", ls, a_h, b_h, ns, 2, dtype)
            obj_plan = None
            classifier = (
                _classifier_pad(dp["trunk"], hand_plan.mm_t[-1].shape[1], ns,
                                dtype)
                if specs.classifier_branch else None
            )
        else:
            a_o, b_o = a_full[:, cols_o], b_full[cols_o]
            hand_plan = build_pixel_grid_branch_plan(
                dp["hand"], "linh", ls, a_h, b_h, ns, 1, dtype)
            obj_plan = build_pixel_grid_branch_plan(
                dp["obj"], "lino", ls, a_o, b_o, ns, 1, dtype)
            classifier = (
                _classifier_pad(dp["hand"], hand_plan.mm_t[-1].shape[1], ns,
                                dtype)
                if specs.classifier_branch and "classifier_head" in dp["hand"]
                else None
            )
        band_i = (hf // 2 if hf >= 16 else None) if band == "auto" else band
        run = make_fused_pixel_grid_kernel_t(
            hand_plan, obj_plan, classifier, feat_ext, (hf, wf), proj, n,
            block=block, interpret=interpret, band=band_i)
        return run(idx, origin, voxel)

    return grid_decode


def pad_inputs(x: jax.Array, in_dim_pad: int) -> jax.Array:
    """Zero-pad the feature axis to the kernel's padded input width."""
    pad = in_dim_pad - x.shape[1]
    return jnp.pad(x, ((0, 0), (0, pad))) if pad else x


def branch_columns(specs: Specs) -> Tuple[np.ndarray, np.ndarray]:
    """Per-branch embedding column subsets, the column-index form of
    separate_decoder_inputs (reference networks/model.py:285-299): which
    columns of the full pfs-wide embedding each trunk consumes."""
    pfs, style = specs.point_feat_size, specs.encode_style
    if specs.model_type == "1encoder1decoder" or style == "nerf":
        cols = np.arange(pfs)
        return cols, cols
    if style == "hand":
        return np.arange(pfs), np.arange(3)
    if style == "obj":
        return np.arange(3), np.arange(pfs)
    if style == "both":
        return (np.arange(pfs - 3),
                np.array([0, 1, 2, pfs - 3, pfs - 2, pfs - 1]))
    raise ValueError(style)


def separate_decoder_inputs(specs: Specs, latent_and_embed: jax.Array):
    """Slice the concatenated [latent, embed] input into per-branch inputs
    (reference networks/model.py:285-299)."""
    ls, pfs = specs.latent_size, specs.point_feat_size
    x = latent_and_embed
    style = specs.encode_style
    if style == "nerf":
        return x, x
    if style == "hand":
        return x, x[:, : ls + 3]
    if style == "obj":
        return x[:, : ls + 3], x
    if style == "both":
        return x[:, :-3], jnp.concatenate([x[:, : ls + 3], x[:, -3:]], axis=1)
    raise ValueError(style)


def _classifier_pad(branch_params: Dict[str, Any], last_in_pad: int, ns,
                    dtype) -> Tuple[jax.Array, jax.Array, int]:
    cw, cb = _materialize_linear(branch_params["classifier_head"])
    c_pad = jnp.zeros((last_in_pad, _round_up(ns.num_class, 128)), dtype)
    return (
        c_pad.at[: cw.shape[0], : ns.num_class].set(cw.astype(dtype)),
        jnp.zeros((1, _round_up(ns.num_class, 128)), jnp.float32)
        .at[0, : ns.num_class].set(cb),
        ns.num_class,
    )


def make_pallas_decode_fn(specs: Specs, block: int = 512,
                          interpret: bool = False, dtype=jnp.float32):
    """Build a decode_fn(ctx, inputs) for inference/grid.py backed by the
    fused kernel.

    The decoder's flax params are read from ``ctx["decoder_params"]`` at trace
    time, so the weights enter the compiled program as *arguments* — never as
    inline constants (large literals make axon-TPU compiles/dispatches
    pathologically slow; see tests/conftest note).  Plan construction
    (weight-norm materialization, padding, injection splitting) is a handful
    of cheap XLA ops fused into the surrounding program.
    """
    ls, pfs = specs.latent_size, specs.point_feat_size
    ns = specs.network_specs

    if specs.model_type == "1encoder1decoder":

        def decode(ctx, inputs):
            trunk = ctx["decoder_params"]["trunk"]
            plan = build_branch_plan(trunk, "lin", ls + pfs, ns, 2, dtype)
            classifier = (
                _classifier_pad(trunk, plan.weights[-1].shape[0], ns, dtype)
                if specs.classifier_branch else None
            )
            fused = make_fused_decoder(plan, None, classifier, block,
                                       combined=True, interpret=interpret)
            xh = pad_inputs(inputs, plan.weights[0].shape[0])
            return fused(xh, xh)

        return decode

    style = specs.encode_style
    if style == "nerf":
        in_hand, in_obj = ls + pfs, ls + pfs
    elif style == "hand":
        in_hand, in_obj = ls + pfs, ls + 3
    elif style == "obj":
        in_hand, in_obj = ls + 3, ls + pfs
    else:
        in_hand, in_obj = ls + pfs - 3, ls + 6

    def decode(ctx, inputs):
        dp = ctx["decoder_params"]
        hand_plan = build_branch_plan(dp["hand"], "linh", in_hand, ns, 1, dtype)
        obj_plan = build_branch_plan(dp["obj"], "lino", in_obj, ns, 1, dtype)
        classifier = (
            _classifier_pad(dp["hand"], hand_plan.weights[-1].shape[0], ns, dtype)
            if specs.classifier_branch and "classifier_head" in dp["hand"] else None
        )
        fused = make_fused_decoder(hand_plan, obj_plan, classifier, block,
                                   combined=False, interpret=interpret)
        xh, xo = separate_decoder_inputs(specs, inputs)
        return fused(
            pad_inputs(xh, hand_plan.weights[0].shape[0]),
            pad_inputs(xo, obj_plan.weights[0].shape[0]),
        )

    return decode
