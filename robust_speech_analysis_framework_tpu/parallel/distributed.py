"""Multi-host initialization and cross-host utilities.

The reference has no distributed backend at all (SURVEY.md §2.5); here
multi-chip scaling inside one host is pure `jax.sharding` over ICI, and
multi-host pods initialize through `jax.distributed` — XLA's collectives
replace NCCL/MPI entirely. This module wraps the initialization handshake
and provides the small host-coordination helpers the pipelines use.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or the TPU pod metadata when present.
    Returns True when a multi-process runtime was initialized.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if not coordinator_address or not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id or 0,
    )
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None


def shard_file_list(paths: Sequence[str]) -> list:
    """This process's slice of a corpus file list (contiguous block split
    over jax.process_count()) — the cross-host half of data-parallel
    extraction; the within-host half is the dp mesh axis."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    bounds = np.linspace(0, len(paths), n_proc + 1).astype(int)
    return list(paths[bounds[pid] : bounds[pid + 1]])


def all_gather_host_objects(obj):
    """Gather a small Python object from every process (host-level metadata
    exchange built on a device all-gather of serialized bytes)."""
    import pickle

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    n = jax.process_count()
    if n == 1:
        return [obj]
    # Pad to a fixed max so shapes agree across hosts.
    max_len = int(
        jax.experimental.multihost_utils.process_allgather(
            np.asarray(len(payload))
        ).max()
    )
    padded = np.zeros(max_len + 8, np.uint8)
    padded[:8] = np.frombuffer(np.int64(len(payload)).tobytes(), np.uint8)
    padded[8 : 8 + len(payload)] = payload
    gathered = jax.experimental.multihost_utils.process_allgather(padded)
    out = []
    for row in np.asarray(gathered):
        ln = int(np.frombuffer(row[:8].tobytes(), np.int64)[0])
        out.append(pickle.loads(row[8 : 8 + ln].tobytes()))
    return out
