"""Determinism checks and failure-tolerant execution.

The reference's reliability story is per-file exception walls (NaN rows) and
CUDA cache cleanup (SURVEY.md §5). The TPU-native equivalents:

* :func:`deterministic_check` — same input ⇒ bitwise-identical output under
  jit (XLA single-device programs are deterministic; this is the framework's
  replacement for race detection — any nondeterminism is a bug);
* :func:`with_oom_downshift` — run a batched device function, and on
  resource-exhaustion errors retry with the batch split in half (bucket
  downshift), preserving output order. Host-side control, device-side work.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np


def deterministic_check(fn: Callable, *args, runs: int = 2) -> bool:
    """True iff ``fn(*args)`` produces bitwise-identical results on repeat."""
    import jax

    outs = []
    for _ in range(runs):
        out = fn(*args)
        outs.append(jax.tree.map(lambda a: np.asarray(a), out))
    first = outs[0]
    for other in outs[1:]:
        leaves_a = jax.tree_util.tree_leaves(first)
        leaves_b = jax.tree_util.tree_leaves(other)
        for a, b in zip(leaves_a, leaves_b):
            if not np.array_equal(a, b, equal_nan=True):
                return False
    return True


_TRANSIENT_MARKERS = ("UNIMPLEMENTED", "UNAVAILABLE", "DEADLINE_EXCEEDED", "INTERNAL")


def retry_transient(fn: Callable, retries: int = 2, markers=_TRANSIENT_MARKERS):
    """Call ``fn()``, retrying on transient backend/RPC errors.

    Remote-attached accelerators (tunneled TPU backends) occasionally fail a
    transfer or dispatch under load with status-code errors that succeed on
    retry; genuine errors re-raise after ``retries`` attempts.
    """
    last = None
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - filtered below
            msg = str(e)
            if not any(m in msg for m in markers):
                raise
            last = e
    raise last


_OOM_MARKERS = ("RESOURCE_EXHAUSTED", "Out of memory", "OOM")


def _is_oom(err: Exception) -> bool:
    return any(m.lower() in str(err).lower() for m in _OOM_MARKERS)


def with_oom_downshift(
    fn: Callable[[Sequence], List],
    items: Sequence,
    min_batch: int = 1,
) -> List:
    """Apply ``fn`` to ``items`` as one batch, splitting in half on OOM.

    ``fn`` receives a list of items and returns a list of per-item results
    in order. Non-OOM exceptions propagate.
    """
    items = list(items)
    if not items:
        return []
    try:
        return list(fn(items))
    except Exception as e:  # noqa: BLE001 - filtered below
        if not _is_oom(e) or len(items) <= min_batch:
            raise
    mid = len(items) // 2
    return with_oom_downshift(fn, items[:mid], min_batch) + with_oom_downshift(
        fn, items[mid:], min_batch
    )
