#!/usr/bin/env python
"""Benchmark: SDF queries/s/chip during dense grid evaluation (the
BASELINE.json headline metric).

Workload: the canonical AlignSDF decoder config (SeparateDecoder, twin
5-layer 512-wide MLPs, latent 256, nerf/pfs-3 inputs — reference
experiments/obman/30k_1e2d_mlp5.json) evaluated over the full two-pass
coarse-to-fine N^3 grid (reference utils/mesh.py:17-123), via the fused
Pallas decoder kernel with weights resident in VMEM.

Prints ONE json line:
  {"metric": "sdf_queries_per_sec_per_chip", "value": ..., "unit": "queries/s",
   "vs_baseline": ...}

``vs_baseline`` is measured throughput divided by the PyTorch reference's
A100 grid-eval throughput.  The reference repo publishes no numbers
(BASELINE.md), so the denominator is MEASURED + DERIVED
(tools/bench_reference_decoder.py): the reference SeparateDecoder measured on
this host's CPU sustains 44.1k q/s = 139 GFLOP/s at 3.148 MFLOP/query;
scaling to an A100's 19.5 TFLOP/s fp32 peak at a generous 50% utilization
(eager fp32 torch does not use TF32 tensor cores on this code path) gives
3.1e6 q/s.  vs_baseline >= 10 is the BASELINE.json target.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from alignsdf_tpu.config import NetworkSpecs, Specs
from alignsdf_tpu.inference.grid import make_grid_evaluator
from alignsdf_tpu.models.decoder import SeparateDecoder
from alignsdf_tpu.ops.decoder_kernel import (
    make_fused_grid_decode_fn,
    make_pallas_decode_fn,
)

A100_TORCH_REF_QPS = 3.1e6  # measured-CPU + derived-A100 (module docstring)


def bench_train():
    """Secondary metric: train samples/s/chip on the full AlignSDF ObMan
    config (batch 64, 2000 pts/scene, 256^2; reference README.md:68-73)."""
    from alignsdf_tpu.config import NetworkSpecs as NS, Specs as SP
    from alignsdf_tpu.models.alignsdf import build_model
    from alignsdf_tpu.training.train_state import make_optimizer
    from alignsdf_tpu.training.train_step import init_train_state, make_train_step
    from alignsdf_tpu.data.synthetic import synthetic_train_batch

    b = 64
    for a in sys.argv:
        if a.startswith("--batch="):  # per-chip batch (global batch is a
            b = int(a.split("=")[1])  # cluster-level choice; BASELINE.md r4)
    specs = SP(
        dataset="obman", sdf_scale_factor=7.018621123357809,
        mano_branch=True, object_pose_branch=True, encode_style="both",
        point_feat_size=9, penetration_loss=True, contact_loss=True,
        scenes_per_batch=b, hand_sdf_weight=0.5, obj_sdf_weight=0.5,
        joint_weight=0.5, shape_reg_weight=5e-7, pose_reg_weight=5e-5,
        network_specs=NS(),
        pixel_align="--pixel" in sys.argv,  # reference --pa_feat family
        compute_dtype="bfloat16" if "--bf16" in sys.argv else "float32",
    )
    model = build_model(specs)
    opt = make_optimizer(specs)
    rng = jax.random.PRNGKey(0)
    state = init_train_state(model, specs, rng, opt)
    decoder_override = None
    use_band = False
    if "--fused-decoder" in sys.argv:
        from alignsdf_tpu.ops.decoder_train_kernel import (
            make_fused_train_decoder,
            make_fused_train_decoder_factored,
        )
        from alignsdf_tpu.ops.decoder_train_pixel import (
            make_fused_train_decoder_pixel,
        )

        # banded pixel train kernel with host-side row ordering (--band):
        # measured ~neutral end-to-end (BASELINE.md r5 — the banded kernels
        # save ~2.5 ms/step over full-at-block-400 but block 400 + the
        # fits cond give most of it back vs the default block-2000 kernel,
        # and an untrained model's drifting root defeats the host sort),
        # kept as a certified lever
        use_band = specs.pixel_align and "--band" in sys.argv
        if "--no-factored" in sys.argv:
            use_band = False
            decoder_override = make_fused_train_decoder(specs)
        elif use_band:
            decoder_override = make_fused_train_decoder_pixel(
                specs, band="auto", presorted=True)
        else:
            decoder_override = (make_fused_train_decoder_pixel(specs)
                                or make_fused_train_decoder_factored(specs)
                                or make_fused_train_decoder(specs))
        assert decoder_override is not None
    from alignsdf_tpu.training.train_step import make_multi_step

    ms = 1
    for a in sys.argv:
        if a.startswith("--multistep="):
            ms = int(a.split("=")[1])
    batch_np = synthetic_train_batch(specs, batch_size=b)
    if "--fused-decoder" in sys.argv and use_band:
        from alignsdf_tpu.data.pixel_sort import pixel_row_sort_batch

        # the loader sorts by its best root estimate; in production (GT
        # root ~= a trained model's predicted root) the bands fit.  The
        # bench model is UNTRAINED, so sorting by the GT root would fail
        # the runtime fits check against the model's far-off predicted
        # root and time only the fallback — emulate steady state by
        # sorting with the model's own predicted root
        cond_in = {
            "cam_intr": jnp.asarray(batch_np["cam_intr"]),
            "mano_root": jnp.asarray(batch_np["mano_root"]),
            "rest_obj_corners": jnp.asarray(batch_np["rest_obj_corners"]),
        }
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if state.consts:
            variables["consts"] = state.consts
        _, _, mano_res, _ = model.apply(
            variables, jnp.asarray(batch_np["image"]),
            jnp.asarray(batch_np["xyz"]), cond_in, train=False,
            method=model.decoder_inputs_pixel)
        sb = dict(batch_np)
        sb["mano_root"] = np.asarray(mano_res["joints"][:, 0])
        sb = pixel_row_sort_batch(sb, float(specs.image_size[0]),
                                  specs.sdf_scale_factor,
                                  feat_rows=specs.image_size[0] // 4)
        sb["mano_root"] = batch_np["mano_root"]
        batch_np = sb
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    # the production loader ships uint8 images normalized on device
    # (data/loader.py raw_image=True path); feed the bench the same way
    batch["image"] = jnp.asarray(
        np.clip(np.asarray(batch["image"]) * 255.0, 0, 255).astype(np.uint8))
    rng = jax.random.key(0, impl="rbg")  # TPU-native dropout stream (cli/train.py)
    train_step = make_train_step(model, specs, opt, decoder_override)
    if ms > 1:
        # device-side step chaining (lax.scan over a stacked batch): one
        # dispatch per ms steps — removes the relay's ~3 ms/step dispatch
        # latency from the measurement (and from production loops via
        # cli/train --multistep)
        step = jax.jit(make_multi_step(train_step, ms), donate_argnums=(0,))
        batch = jax.tree.map(lambda x: jnp.stack([x] * ms), batch)
        keys0 = jnp.stack([jax.random.fold_in(rng, j) for j in range(ms)])
        state, losses = step(state, batch, keys0)
        float(losses["total"][-1])
        times = []
        for i in range(3):
            t0 = time.time()
            state, losses = step(state, batch, keys0)
            float(losses["total"][-1])
            times.append((time.time() - t0) / ms)
    else:
        step = jax.jit(train_step, donate_argnums=(0,))
        keys = [jax.random.fold_in(rng, j) for j in range(40)]
        jax.block_until_ready(keys)
        state, losses = step(state, batch, keys[0])
        float(losses["total"])
        # chain K steps with no host fetch in between (the sandbox relay
        # costs ~100ms per fetch round-trip, which would dominate a per-step
        # timing); one reduction fetch at the end forces the whole chain
        k = 10
        times = []
        for i in range(3):
            t0 = time.time()
            for j in range(k):
                state, losses = step(state, batch, keys[(i * k + j) % 40])
            float(losses["total"])
            times.append((time.time() - t0) / k)
    sps = b / min(times)
    # reference anchor: torch DDP on A100 for this model/batch is ~250
    # samples/s/GPU (estimate; repo publishes none — BASELINE.md)
    print(json.dumps({
        "metric": "train_samples_per_sec_per_chip", "value": round(sps, 1),
        "unit": "samples/s", "vs_baseline": round(sps / 250.0, 2),
    }))


def main():
    if "--train" in sys.argv:
        bench_train()
        return
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n = int(args[0]) if args else 256
    use_pallas = "--no-pallas" not in sys.argv
    use_bf16 = "--bf16" in sys.argv

    specs = Specs(
        model_type="1encoder2decoder",
        encode_style="nerf",
        point_feat_size=3,
        latent_size=256,
        sdf_scale_factor=7.018621123357809,
        network_specs=NetworkSpecs(),
    )

    dec = SeparateDecoder(
        specs.latent_size, specs.point_feat_size, specs.encode_style,
        specs.network_specs, use_classifier=False,
    )
    dummy = jnp.zeros((8, specs.latent_size + specs.point_feat_size))
    variables = dec.init(jax.random.PRNGKey(0), dummy)

    grid_decode_fn = None
    if use_pallas:
        kdtype = jnp.bfloat16 if use_bf16 else jnp.float32
        decode_fn = make_pallas_decode_fn(specs, block=512, dtype=kdtype)
        if "--no-fused" not in sys.argv:
            # block 4096 = lanes-major sweet spot on v5e: (512, 4096) f32
            # activation tiles fill scoped VMEM without spilling (measured
            # 1024/2048/4096 -> 67.6/70.0/71.3 M q/s)
            grid_decode_fn = make_fused_grid_decode_fn(
                specs, n, block=4096, dtype=kdtype)
    else:
        def decode_fn(ctx, inputs):
            h, o, _ = dec.apply({"params": ctx["params"]}, inputs)
            return h, o, None

    latent = jax.random.normal(jax.random.PRNGKey(1), (1, specs.latent_size))
    ctx = {"params": variables["params"],
           "decoder_params": variables["params"], "latent": latent}

    evaluate = make_grid_evaluator(
        decode_fn, specs, n, chunk=1 << 18, mesh=None, two_pass=True,
        grid_decode_fn=grid_decode_fn,
    )

    # Warm up the execution path: the axon tunnel's first real execution
    # round-trip costs minutes; also block_until_ready does not synchronize
    # on this backend, so all timings force a host fetch.
    t0 = time.time()
    float(jnp.sum(jnp.ones((8, 128)) @ jnp.ones((128, 8))))
    warm_s = time.time() - t0
    print(f"# warmup {warm_s:.1f}s", file=sys.stderr, flush=True)

    t0 = time.time()
    result = evaluate(ctx)
    float(jnp.sum(result.sdf_hand))
    compile_s = time.time() - t0
    print(f"# compile+first {compile_s:.1f}s", file=sys.stderr, flush=True)

    # Device-side throughput (the headline): a 4-byte reduction fetch forces
    # execution without measuring the dev->host link, which in this sandbox is
    # a ~50 MB/s relay rather than the production PCIe/DMA path.  The full
    # field fetch is reported separately on stderr.
    times, fetch_times = [], []
    for it in range(3):
        ctx_i = dict(ctx, latent=jax.random.normal(jax.random.PRNGKey(it), (1, specs.latent_size)))
        t0 = time.time()
        result = evaluate(ctx_i)
        float(jnp.sum(result.sdf_hand) + jnp.sum(result.sdf_obj))
        times.append(time.time() - t0)
        t0 = time.time()
        np.asarray(result.sdf_hand.astype(jnp.float16))
        np.asarray(result.sdf_obj.astype(jnp.float16))
        fetch_times.append(time.time() - t0)
        print(f"# iter {it}: device {times[-1]:.2f}s + f16 fetch {fetch_times[-1]:.2f}s",
              file=sys.stderr, flush=True)
    best = min(times)
    best_fetch = min(fetch_times)

    queries = 2 * n ** 3  # two passes
    qps = queries / best
    print(
        json.dumps(
            {
                "metric": "sdf_queries_per_sec_per_chip",
                "value": round(qps),
                "unit": "queries/s",
                "vs_baseline": round(qps / A100_TORCH_REF_QPS, 2),
            }
        )
    )
    print(
        f"# n={n} pallas={use_pallas} bf16={use_bf16} "
        f"fused_grid={grid_decode_fn is not None} "
        f"device={best:.3f}s (+fetch {best_fetch:.3f}s) "
        f"compile={compile_s:.1f}s warmup={warm_s:.1f}s "
        f"chip={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
