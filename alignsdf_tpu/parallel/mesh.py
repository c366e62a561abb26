"""Device mesh construction and sharding helpers.

The framework uses a single 1-D ``data`` axis for data parallelism (batch
sharding in training, point-axis sharding in grid reconstruction) — the
TPU-native replacement for the reference's NCCL DDP process group
(reference train.py:220-228).  Multi-host initialization goes through
``jax.distributed.initialize``; intra-slice collectives ride ICI, inserted by
GSPMD from these shardings.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis sharding for batches / point slabs."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def maybe_initialize_distributed() -> None:
    """Multi-host setup (no-op on single host); the jax analogue of the
    reference's env-var/SLURM rendezvous (reference train.py:205-228)."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
