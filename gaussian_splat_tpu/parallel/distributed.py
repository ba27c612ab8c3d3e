"""Multi-host bootstrap: jax.distributed + DCN-aware meshes (north-star config 5).

The reference has no distributed backend (SURVEY §2.3); this is the TPU-native
equivalent of standing up NCCL: `jax.distributed.initialize` forms the
multi-process runtime, and the mesh helpers lay the primitive/tile axes so the
heavy all_gather of projected features rides ICI within a slice while only the
(small) scalar reductions cross DCN.

Single-process usage is unaffected — `init_distributed()` is a no-op when the
environment carries no coordinator address.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or the standard environment
    (JAX_COORDINATOR_ADDRESS / TPU pod env). Returns True if multi-process.

    Safe to call unconditionally: returns False in single-process settings.
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    in_pod = "TPU_WORKER_HOSTNAMES" in os.environ and os.environ.get(
        "TPU_WORKER_ID"
    ) not in (None, "")
    if addr is None and not in_pod:
        return False
    kwargs = {}
    if addr is not None:
        kwargs["coordinator_address"] = addr
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


def make_pod_mesh(axis_name: str = "dev") -> Mesh:
    """1D mesh over ALL devices of all processes, ordered so consecutive mesh
    positions are intra-host first (ICI-contiguous): the render pipeline's
    all_gather then maximizes ICI hops over DCN hops."""
    devices = sorted(
        jax.devices(), key=lambda d: (d.process_index, d.id)
    )
    return Mesh(np.asarray(devices), (axis_name,))


def local_batch_slice(total: int) -> slice:
    """This process's contiguous shard of a length-`total` leading axis
    (equal split across processes; total must divide evenly)."""
    p = jax.process_count()
    i = jax.process_index()
    assert total % p == 0, f"{total} not divisible by {p} processes"
    per = total // p
    return slice(i * per, (i + 1) * per)
