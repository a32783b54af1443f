"""Disk-backed AOT cache for device-fold programs via ``jax.export``.

The device-resident fold program (one XLA program per (config, fold-shape)
tuple — see :func:`loops._build_device_fold`) is the dominant first-pass
cost of a CV run in a fresh process: XLA's persistent compilation cache
removes the *compile*, but the Python *tracing* of the epoch
``while_loop``/scan pyramid is GIL-bound and repeats every process
(measured: the 3-fold CV round spent ~20 s re-tracing against ~1 s of
steady-state compute). ``jax.export`` serializes the traced program
(StableHLO + in/out trees) so later processes deserialize in milliseconds
and go straight to the cache-hit compile.

Artifacts live next to the persistent XLA cache (same machine-scoped dir,
see package ``__init__``) keyed by everything that could change the traced
program: jax version, backend platform + device kind, the model's config
repr, the fold statics, every argument's pytree/aval signature, and a
digest of the source files that define the program. Any miss or failure
falls back to plain ``jax.jit`` tracing — the cache is an accelerator,
never a correctness dependency.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
from typing import Any, Callable, Optional, Sequence

import jax

logger = logging.getLogger(__name__)

_REGISTERED = False

# bumping invalidates every artifact (e.g. if the wrapper semantics change)
_SCHEMA_VERSION = 1


def _register_export_serializations() -> None:
    """Register the custom pytree node types that appear in fold-program
    arguments (idempotent). TrainState is a flax struct; the optimizer
    state is optax namedtuples."""
    global _REGISTERED
    if _REGISTERED:
        return
    import optax
    from jax import export as jexport
    from optax.schedules._inject import InjectStatefulHyperparamsState

    from .loops import TrainState

    for nt, name in (
        (InjectStatefulHyperparamsState, "optax.InjectStatefulHyperparamsState"),
        (optax._src.transform.ScaleByAdamState, "optax.ScaleByAdamState"),
        (optax._src.base.EmptyState, "optax.EmptyState"),
    ):
        try:
            jexport.register_namedtuple_serialization(nt, serialized_name=name)
        except ValueError:
            pass  # already registered (e.g. by a parallel test module)
    try:
        jexport.register_pytree_node_serialization(
            TrainState,
            serialized_name="rsaf.TrainState",
            serialize_auxdata=pickle.dumps,
            deserialize_auxdata=pickle.loads,
        )
    except ValueError:
        pass
    _REGISTERED = True


def _source_digest(
    rels: Sequence[str] = (
        "train/loops.py", "models/cnn_lstm.py", "ops/pallas/lstm.py"
    ),
) -> str:
    """Digest of the source files that define a cached program, so editing
    them invalidates stale artifacts."""
    h = hashlib.sha256()
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rel in rels:
        p = os.path.join(base, rel)
        try:
            with open(p, "rb") as f:
                h.update(f.read())
        except OSError:
            h.update(rel.encode())
    return h.hexdigest()[:16]


_SOURCE_DIGEST: Optional[str] = None
_DIGEST_CACHE: dict = {}


def program_cache_key(
    tag: str, statics: tuple, args: Sequence[Any], sources: Sequence[str]
) -> str:
    """Cache key for an arbitrary exported program: like
    :func:`fold_cache_key` but with caller-chosen source files (e.g. the
    batched SMO solver keys on models/svm_device.py)."""
    srcs = tuple(sources)
    digest = _DIGEST_CACHE.get(srcs)
    if digest is None:
        digest = _DIGEST_CACHE[srcs] = _source_digest(srcs)
    dev = jax.devices()[0]
    raw = "\x00".join(
        (
            str(_SCHEMA_VERSION),
            jax.__version__,
            dev.platform,
            getattr(dev, "device_kind", ""),
            _config_sig(),
            digest,
            tag,
            repr(statics),
            _aval_sig(args),
        )
    )
    return hashlib.sha256(raw.encode()).hexdigest()[:32]


def _aval_sig(args: Sequence[Any]) -> str:
    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten(args)
    parts = [str(treedef)]
    for leaf in leaves:
        # host leaves read dtype/shape via numpy — jnp.asarray would upload
        # them to the device just to inspect metadata
        dtype = getattr(leaf, "dtype", None) or np.asarray(leaf).dtype
        parts.append(f"{dtype}{jax.numpy.shape(leaf)}")
    return "|".join(parts)


def _config_sig() -> str:
    """Runtime JAX config that changes the lowered program: an artifact
    exported under one setting must not be served to a process running
    another."""
    vals = []
    for name in ("jax_enable_x64", "jax_default_matmul_precision",
                 "jax_numpy_dtype_promotion", "jax_default_dtype_bits"):
        try:
            vals.append(f"{name}={getattr(jax.config, name)}")
        except AttributeError:
            vals.append(f"{name}=?")
    return ";".join(vals)


def _cache_dir() -> Optional[str]:
    xla_dir = jax.config.jax_compilation_cache_dir
    if not xla_dir:
        return None
    return os.path.join(xla_dir, "exports")


def fold_cache_key(model_repr: str, statics: tuple, args: Sequence[Any]) -> str:
    global _SOURCE_DIGEST
    if _SOURCE_DIGEST is None:
        _SOURCE_DIGEST = _source_digest()
    dev = jax.devices()[0]
    raw = "\x00".join(
        (
            str(_SCHEMA_VERSION),
            jax.__version__,
            dev.platform,
            getattr(dev, "device_kind", ""),
            _config_sig(),
            _SOURCE_DIGEST,
            model_repr,
            repr(statics),
            _aval_sig(args),
        )
    )
    return hashlib.sha256(raw.encode()).hexdigest()[:32]


def load_or_export(
    build_fn: Callable[[], Callable],
    key: str,
    args: tuple,
    tag: str = "fold",
):
    """Return a callable for the program ``build_fn()`` specialized to
    ``args``' shapes, backed by an on-disk ``jax.export`` artifact.

    Hit: deserialize (ms) and skip Python tracing entirely. Miss: trace
    once via export (same cost as plain jit tracing), persist atomically,
    and use the exported call so the compiled artifact is byte-identical
    across processes (one persistent-XLA-cache entry, not two). Any
    failure → plain ``jax.jit`` path.

    Arguments committed to more than one device (mesh-sharded/replicated
    runs) bypass the cache entirely: exported programs bake the device
    assignment in, and a multi-device artifact must never be served to a
    single-device caller of the same shapes (or vice versa).
    """
    from ..utils.profiling import span

    for leaf in jax.tree_util.tree_leaves(args):
        sharding = getattr(leaf, "sharding", None)
        if sharding is not None and len(getattr(sharding, "device_set", ())) > 1:
            return build_fn()
    d = _cache_dir()
    path = os.path.join(d, f"{tag}_{key}.jexp") if d else None

    if path and os.path.exists(path):
        try:
            with span(f"aot/{tag}/deserialize"):
                _register_export_serializations()
                with open(path, "rb") as f:
                    exp = jax.export.deserialize(f.read())
                return jax.jit(exp.call)
        except Exception as e:  # stale/corrupt artifact → re-trace
            logger.warning("AOT fold artifact %s unusable (%s); re-tracing",
                           os.path.basename(path), e)

    fn = build_fn()
    if path is None:
        return fn
    try:
        with span(f"aot/{tag}/trace_export"):
            _register_export_serializations()
            exp = jax.export.export(fn)(*args)
            blob = exp.serialize()
        os.makedirs(d, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return jax.jit(exp.call)
    except Exception as e:
        logger.warning("AOT fold export failed (%s); using plain jit", e)
        return fn
