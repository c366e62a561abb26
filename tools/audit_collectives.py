#!/usr/bin/env python
"""Collective-traffic audit of the compiled multi-chip programs (VERDICT r4
item 7: 2-host scaling evidence without 2 hosts).

Compiles the production-shaped programs over an N-device mesh (virtual CPU
devices — GSPMD partitioning is identical to TPU for the same mesh), parses
the optimized HLO, and sums the bytes moved by every collective
(all-reduce / all-gather / reduce-scatter / collective-permute / all-to-all).
Those byte volumes + the single-chip step times measured in BASELINE.md give
a defensible scaling model for 2 hosts over ICI (same v5e pod slice) and DCN
(multi-slice): efficiency = t_compute / (t_compute + t_comm_exposed).

Usage:  python tools/audit_collectives.py [n_devices] [--train-only|--grid-only]
Prints one JSON line per program.
"""

import json
import os
import re
import sys

N_DEV = next((int(a) for a in sys.argv[1:] if a.isdigit()), 8)
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={N_DEV}")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1, "s16": 2,
                "u16": 2}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def _shape_bytes(shape_str: str) -> int:
    """'f32[64,512]{1,0}' -> byte size (tuple shapes summed by the caller)."""
    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def audit_hlo(hlo: str):
    """Collective ops in optimized HLO -> [(kind, out_bytes)]."""
    out = []
    for line in hlo.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\([^)]*\)|\S+)\s+"
                     r"([\w\-]+)\(", line)
        if not m:
            continue
        shape_str, op = m.groups()
        kind = next((c for c in _COLLECTIVES
                     if op == c or op.startswith(c + ".")), None)
        if kind is None:
            continue
        if shape_str.startswith("("):
            # tuple shapes: commas also appear INSIDE dim lists, so extract
            # whole shape atoms instead of splitting on commas
            size = sum(_shape_bytes(s)
                       for s in re.findall(r"[a-z0-9]+\[[0-9,]*\]",
                                           shape_str))
        else:
            size = _shape_bytes(shape_str)
        out.append((kind, size))
    return out


def summarize(name: str, hlo: str, notes: str = ""):
    cols = audit_hlo(hlo)
    by_kind = {}
    for kind, size in cols:
        by_kind.setdefault(kind, [0, 0])
        by_kind[kind][0] += 1
        by_kind[kind][1] += size
    rec = {
        "program": name,
        "n_devices": N_DEV,
        "collective_count": len(cols),
        "total_collective_mb": round(sum(s for _, s in cols) / 1e6, 3),
        "by_kind": {k: {"count": c, "mb": round(b / 1e6, 3)}
                    for k, (c, b) in sorted(by_kind.items())},
    }
    if notes:
        rec["notes"] = notes
    print(json.dumps(rec), flush=True)
    return rec


def audit_train_step():
    """The production DP train step at global batch 64: the only cross-chip
    traffic GSPMD inserts is the gradient/BN all-reduce."""
    from alignsdf_tpu.config import NetworkSpecs, Specs
    from alignsdf_tpu.data.synthetic import synthetic_train_batch
    from alignsdf_tpu.models.alignsdf import build_model
    from alignsdf_tpu.parallel.mesh import make_mesh
    from alignsdf_tpu.training.train_state import make_optimizer
    from alignsdf_tpu.training.train_step import (init_train_state,
                                                  make_train_step)
    from alignsdf_tpu.cli.train import batch_shardings

    specs = Specs(
        dataset="obman", sdf_scale_factor=7.018621123357809,
        mano_branch=True, object_pose_branch=True, encode_style="both",
        point_feat_size=9, penetration_loss=True, contact_loss=True,
        scenes_per_batch=64, network_specs=NetworkSpecs(),
        image_size=(256, 256), samples_per_scene=2000,
    )
    model = build_model(specs)
    opt = make_optimizer(specs)
    state = init_train_state(model, specs, jax.random.PRNGKey(0), opt)
    mesh = make_mesh()
    replicate = NamedSharding(mesh, P())
    step = jax.jit(make_train_step(model, specs, opt, None),
                   in_shardings=(replicate, batch_shardings(mesh) | {},
                                 replicate),
                   donate_argnums=(0,))
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_train_batch(specs, batch_size=64).items()}
    state = jax.device_put(state, replicate)
    hlo = step.lower(state, batch, jax.random.PRNGKey(1)).compile().as_text()
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(state.params))
    rec = summarize(
        "train_step_b64_dp", hlo,
        notes=f"{n_params / 1e6:.2f}M params; the all-reduce volume is the "
              "gradient+BN-stat psum (reference analogue: NCCL DDP "
              "all-reduce, train.py:220-228)")
    return rec


def audit_grid(n=256):
    """The point-sharded two-pass grid program (the 256^3 north star)."""
    from alignsdf_tpu.config import NetworkSpecs, Specs
    from alignsdf_tpu.inference.grid import make_grid_evaluator
    from alignsdf_tpu.models.decoder import SeparateDecoder
    from alignsdf_tpu.parallel.mesh import make_mesh

    specs = Specs(model_type="1encoder2decoder", encode_style="nerf",
                  point_feat_size=3, latent_size=256,
                  sdf_scale_factor=7.018621123357809,
                  network_specs=NetworkSpecs())
    dec = SeparateDecoder(specs.latent_size, specs.point_feat_size,
                          specs.encode_style, specs.network_specs,
                          use_classifier=False)
    variables = dec.init(jax.random.PRNGKey(0),
                         jnp.zeros((8, specs.latent_size + 3)))

    def decode_fn(ctx, inputs):
        h, o, _ = dec.apply({"params": ctx["params"]}, inputs)
        return h, o, None

    mesh = make_mesh()
    ev = make_grid_evaluator(decode_fn, specs, n, chunk=n ** 3 // N_DEV,
                             mesh=mesh, two_pass=True)
    ctx = {"params": variables["params"],
           "decoder_params": variables["params"],
           "latent": jnp.zeros((1, specs.latent_size))}
    hlo = ev.run_jit.lower(ctx, ev.idx_dev).compile().as_text()
    return summarize(
        f"grid_{n}cubed_two_pass_point_sharded", hlo,
        notes="per-image field program; images shard across hosts at the "
              "file level (reference: one GPU per image, multi-GPU by file "
              "sharding)")


def main():
    if "--grid-only" not in sys.argv:
        audit_train_step()
    if "--train-only" not in sys.argv:
        audit_grid(256)


if __name__ == "__main__":
    main()
