"""Phase ablation of the train step on the real chip: encoder trunk, HeadNet,
MANO, decoder (XLA vs fused Pallas), losses — each timed as a jitted
forward+backward in isolation to locate the step-time budget
(BASELINE.md cost-structure table).

Usage: python tools/bench_phases.py [--bf16]
Prints one JSON line per phase.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alignsdf_tpu.config import NetworkSpecs, Specs  # noqa: E402


def timeit(fn, *args, k=10, reps=3):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).ravel()[0] if hasattr(x, "ravel") else x,
                 jax.device_get(jax.tree.leaves(out)[0]))
    times = []
    for _ in range(reps):
        t0 = time.time()
        o = None
        for _ in range(k):
            o = fn(*args)
        np.asarray(jax.device_get(jax.tree.leaves(o)[0])).ravel()[:1]
        times.append((time.time() - t0) / k)
    return min(times)


def main():
    bf16 = "--bf16" in sys.argv
    specs = Specs(
        dataset="obman", sdf_scale_factor=7.018621123357809,
        mano_branch=True, object_pose_branch=True, encode_style="both",
        point_feat_size=9, penetration_loss=True, contact_loss=True,
        scenes_per_batch=64, network_specs=NetworkSpecs(),
        compute_dtype="bfloat16" if bf16 else "float32",
    )
    from alignsdf_tpu.models.resnet import HeadNet, make_encoder
    from alignsdf_tpu.data.synthetic import synthetic_train_batch

    b, n = specs.scenes_per_batch, specs.samples_per_scene
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_train_batch(specs, batch_size=b).items()}
    dtype = jnp.dtype(specs.compute_dtype)
    rng = jax.random.PRNGKey(0)

    results = {}

    # --- encoder trunk (+ heads) fwd+bwd
    enc = make_encoder(specs.backbone, specs.latent_size, True, True, False,
                       dtype=dtype)
    ev = enc.init(rng, batch["image"][:2], train=True)

    @jax.jit
    def enc_fb(params, stats, img):
        def loss(p):
            (s, m, a), mut = enc.apply(
                {"params": p, "batch_stats": stats}, img, train=True,
                mutable=["batch_stats"])
            return jnp.sum(s.astype(jnp.float32) ** 2) + jnp.sum(a.astype(jnp.float32) ** 2)
        return jax.grad(loss)(params)

    results["encoder_fwd_bwd_ms"] = timeit(
        enc_fb, ev["params"], ev["batch_stats"], batch["image"]) * 1e3

    # --- HeadNet alone fwd+bwd (512ch 8x8 -> 256ch 64x64)
    head = HeadNet(dtype=dtype)
    x8 = jnp.zeros((b, 8, 8, 512), dtype)
    hv = head.init(rng, x8, train=True)

    @jax.jit
    def head_fb(params, stats, x):
        def loss(p):
            out, _ = head.apply({"params": p, "batch_stats": stats}, x,
                                train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jax.grad(loss)(params)

    results["headnet_fwd_bwd_ms"] = timeit(
        head_fb, hv["params"], hv["batch_stats"], x8) * 1e3

    # --- decoder fwd+bwd: XLA vs fused kernel
    from alignsdf_tpu.models.decoder import make_decoder
    from alignsdf_tpu.ops.decoder_train_kernel import make_fused_train_decoder

    dec = make_decoder(specs.model_type, specs.latent_size,
                       specs.point_feat_size, specs.encode_style,
                       specs.network_specs, False, dtype=dtype)
    din = jax.random.normal(rng, (b * n, specs.latent_size +
                                  specs.point_feat_size)) * 0.5
    dparams = dec.init(rng, din[:8])["params"]

    @jax.jit
    def dec_xla(params, x, key):
        def loss(p):
            h, o, _ = dec.apply({"params": p}, x, train=True, dropout_rng=key)
            return jnp.sum(h ** 2) + jnp.sum(o ** 2)
        return jax.grad(loss)(params)

    key = jax.random.key(0, impl="rbg")
    results["decoder_xla_fwd_bwd_ms"] = timeit(dec_xla, dparams, din, key) * 1e3

    fused = make_fused_train_decoder(specs, interpret=False)
    if fused is not None and jax.default_backend() != "cpu":
        @jax.jit
        def dec_fused(params, x):
            def loss(p):
                h, o, _ = fused(p, x, jnp.int32(7), train=True)
                return jnp.sum(h ** 2) + jnp.sum(o ** 2)
            return jax.grad(loss)(params)

        results["decoder_fused_fwd_bwd_ms"] = timeit(dec_fused, dparams, din) * 1e3

    from alignsdf_tpu.ops.decoder_train_kernel import (
        make_fused_train_decoder_factored,
    )

    factored = make_fused_train_decoder_factored(specs, interpret=False)
    if factored is not None and jax.default_backend() != "cpu":
        latent = din[:b, : specs.latent_size]
        emb = din[:, specs.latent_size:]

        @jax.jit
        def dec_factored(params, lat, e):
            def loss(p):
                h, o, _ = factored(p, lat, e, jnp.int32(7), train=True)
                return jnp.sum(h ** 2) + jnp.sum(o ** 2)
            return jax.grad(loss)(params)

        results["decoder_factored_fwd_bwd_ms"] = timeit(
            dec_factored, dparams, latent, emb) * 1e3

    for k, v in results.items():
        print(json.dumps({"metric": k, "value": round(v, 2), "unit": "ms",
                          "batch": b, "points": b * n,
                          "dtype": specs.compute_dtype}), flush=True)


if __name__ == "__main__":
    main()
