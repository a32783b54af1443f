"""Sharding rules: map parameter pytrees and batches onto the (dp, mp) mesh.

Rules are (path-regex → PartitionSpec) pairs applied to flattened parameter
paths; the default table shards the large "output feature" dimension of
matmul weights on ``mp`` when divisible and replicates everything else.
Batches shard their leading dimension on ``dp``. XLA GSPMD derives all
collective communication from these annotations.
"""

from __future__ import annotations

import re
from typing import Any, Iterable, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (regex over 'a/b/c' param path, partition spec builder given ndim)
DEFAULT_PARAM_RULES: Sequence[Tuple[str, Any]] = (
    # LSTM input/recurrent projections: (in, 4H) → shard gate dim.
    (r".*(wx|wh)$", lambda nd: P(*([None] * (nd - 1) + ["mp"]))),
    # Transformer blocks (wav2vec2): megatron-style tensor parallelism —
    # q/k/v/ff1 column-parallel (output dim + bias live on 'mp'), the
    # following out/ff2 row-parallel (input dim on 'mp'; XLA inserts the
    # all-reduce). Without these the encoder's ~95M params silently
    # replicated on every device (the old conv\d* pattern matches none of
    # its parameter names).
    (r".*/(q|k|v|ff1)/kernel$", lambda nd: P(*([None] * (nd - 1) + ["mp"]))),
    (r".*/(q|k|v|ff1)/bias$", lambda nd: P("mp")),
    (r".*/(out|ff2)/kernel$", lambda nd: P(*(["mp"] + [None] * (nd - 1)))),
    # Feature-encoder convs (k, in, out) + the 512→768 projection: shard out.
    (r".*/(conv_\d+|feature_projection/projection)/kernel$",
     lambda nd: P(*([None] * (nd - 1) + ["mp"]))),
    # Conv kernels (k, in, out) and Dense kernels (in, out): shard out.
    (r".*(conv\d*|shortcut_conv|Dense_\d+|fc|score)/kernel$",
     lambda nd: P(*([None] * (nd - 1) + ["mp"]))),
)


def _spec_for(path: str, ndim: int, shape, mesh: Mesh, rules) -> P:
    mp_size = mesh.shape.get("mp", 1)
    for pattern, builder in rules:
        if re.match(pattern, path):
            spec = builder(ndim)
            # Only shard if the sharded dim is divisible by the axis size.
            dims = list(spec)
            ok = True
            for axis_i, name in enumerate(dims):
                if name == "mp" and shape[axis_i] % mp_size != 0:
                    ok = False
            if ok:
                return spec
    return P()


def shard_params(params: Any, mesh: Mesh, rules=DEFAULT_PARAM_RULES) -> Any:
    """NamedSharding pytree matching ``params`` under the rule table."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = []
    for path, leaf in flat:
        path_str = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        spec = _spec_for(path_str, leaf.ndim, leaf.shape, mesh, rules)
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def batch_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Leading-axis dp sharding for a batch of rank ``ndim``."""
    return NamedSharding(mesh, P(*(["dp"] + [None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
