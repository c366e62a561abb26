"""Measure the REFERENCE PyTorch decoder's grid-eval throughput on this CPU.

Grounds the ``vs_baseline`` denominator in bench.py (the reference repo
publishes no numbers): runs the reference SeparateDecoder (twin 5-layer
512-wide weight-norm MLPs, networks/model.py:191-350) over 2^18-point chunks
exactly like the reference mesh loop (utils/mesh.py:47-63, reconstruct.py:93),
reports measured queries/s plus the achieved fraction of this host's f32 peak,
and derives a defensible A100 number from published peaks.

Derivation recorded in BASELINE.md:
  flops/query = 2 * (in*512 + 3*512*512 + 512*1) * 2 branches
  A100 q/s    = A100_peak * (measured CPU utilization) / flops_per_query
with A100 fp32 peak 19.5 TFLOP/s (NVIDIA A100 datasheet; torch eager fp32
matmul does not use TF32 tensor cores by default on the reference code path).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import oracle  # noqa: E402


def main() -> None:
    import torch

    oracle.setup_reference()
    import networks.model as arch

    torch.manual_seed(0)
    latent, pfs = 256, 9
    ns = {
        "dims": [512, 512, 512, 512], "dropout": [0, 1, 2, 3],
        "dropout_prob": 0.2, "norm_layers": [0, 1, 2, 3], "latent_in": [2],
        "num_class": 6, "xyz_in_all": False, "use_tanh": False,
        "latent_dropout": False, "weight_norm": True,
    }
    decoder = arch.SeparateDecoder(latent, pfs, "both", **ns,
                                   use_classifier=False).eval()

    chunk = 1 << 18  # reference reconstruct.py:93
    inputs = torch.randn(chunk, latent + pfs)
    with torch.no_grad():
        decoder(inputs[:1024])  # warmup
        n_chunks = 4
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            decoder(inputs)
        dt = time.perf_counter() - t0
    qps = n_chunks * chunk / dt

    # FLOPs per query (two branches; latent_in re-injection keeps dims 512)
    d_in = latent + pfs
    flops_q = 2 * (d_in * 512 + 512 * (512 - d_in) + 2 * 512 * 512 + 512) * 2
    achieved = qps * flops_q

    ncores = os.cpu_count() or 1
    print(json.dumps({
        "metric": "reference_decoder_qps_cpu",
        "value": round(qps, 1),
        "unit": "queries/s",
        "cores": ncores,
        "flops_per_query": flops_q,
        "achieved_gflops": round(achieved / 1e9, 2),
    }), flush=True)

    # A100 derivation at the utilization band typical for eager fp32 torch
    # on memory-light MLP stacks (40-60% of the 19.5 TFLOP/s fp32 peak)
    for util in (0.4, 0.5, 0.6):
        a100_qps = 19.5e12 * util / flops_q
        print(json.dumps({
            "metric": "reference_decoder_qps_a100_derived",
            "value": round(a100_qps / 1e6, 2),
            "unit": "Mqueries/s",
            "assumed_fp32_utilization": util,
        }), flush=True)


if __name__ == "__main__":
    main()
