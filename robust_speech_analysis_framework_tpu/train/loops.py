"""Jitted training/eval engine for sequence classifiers.

Capability parity with the reference's torch loop (src/dl_cv_strategies.py:
87-194): epoch training with Adam + cross-entropy, per-epoch validation,
``ReduceLROnPlateau(factor=0.1, patience=5)``, early stopping with best-weight
restore, and an eval pass returning (labels, preds, positive-class probs).

TPU-first structure: the train/eval steps are pure jitted functions over a
``TrainState`` pytree; the learning-rate plateau logic runs host-side between
epochs and feeds the LR in as a state field (so LR changes don't recompile).
Batches arrive bucket-padded (data/batching.py), bounding compile count; the
same compiled step is reused across folds/trials of equal model shape.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from ..ops.framing import Deferred


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    lr: jnp.ndarray  # current learning rate (host-adjustable, no recompile)


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-3
    epochs: int = 100
    patience: int = 25
    batch_size: int = 8
    seed: int = 0
    plateau_factor: float = 0.1
    plateau_patience: int = 5
    # Mask padded timesteps (attention/LSTM/conv reads). The torch reference
    # is unmasked, but it pads only to the BATCH max; our bucket ladder pads
    # further, so unmasked here would amplify padding effects beyond the
    # reference and make logits depend on co-batched sequence lengths.
    # Masked logits are padding-invariant (except train-mode BN batch stats)
    # and deterministic per sequence — set False for strict unmasked parity
    # experiments.
    use_length_masking: bool = True
    min_bucket: int = 64
    # runtime dropout rate passed into the model as a TRACED scalar: one
    # compiled step serves every sampled rate of a hyperparameter search
    # (None -> the model's static attribute, recompiling per architecture)
    dropout_rate: Optional[float] = None
    # the reference's inner Optuna objective trains plain fixed-epoch Adam
    # and scores FINAL weights (src/dl_cv_strategies.py:197-254); its outer
    # training uses plateau decay + best-weight restore (:87-165). Both
    # behaviors are selectable so each loop matches its reference twin.
    use_plateau: bool = True
    restore_best: bool = True
    # rematerialize the forward under the loss gradient (jax.checkpoint):
    # activations are recomputed in the backward pass instead of stored —
    # the standard long-sequence memory lever (reference-scale sessions at
    # 8 trial lanes × T≈16k frames otherwise exceed one chip's HBM).
    # Numerically identical; ~30% extra forward compute.
    remat: bool = False
    # compile every (batch, time-bucket) step shape concurrently before the
    # epoch loop: XLA compiles release the GIL (and go through a remote
    # compile service on the tunneled chip), so threads overlap what would
    # otherwise be one serial multi-second compile per shape
    parallel_warmup: bool = True
    # Device-resident fold: the WHOLE training run (epoch while_loop, batch
    # scans, val pass, plateau decay, early stop, best-weight tracking) as
    # ONE jitted XLA program — zero host round trips until the fold ends.
    # "auto" engages it when the padded train+val arrays fit the budget
    # below; "on"/"off" force it. Padding is to the fold-global bucket (one
    # compiled shape), vs the streaming path's per-batch buckets — identical
    # numerics when all sequences share a bucket, slightly different
    # train-mode BatchNorm statistics otherwise (the torch reference's
    # pad-to-batch-max has the same composition dependence,
    # src/dl_cv_strategies.py:64-84).
    device_fold: str = "auto"
    device_fold_budget_bytes: int = 4 << 30


class ReduceLROnPlateau:
    """Multiply LR by ``factor`` after ``patience`` epochs without val-loss
    improvement (torch ReduceLROnPlateau semantics, mode='min', as configured
    at src/dl_cv_strategies.py:330)."""

    def __init__(self, factor: float = 0.1, patience: int = 5, min_lr: float = 0.0,
                 threshold: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float, lr: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                lr = max(lr * self.factor, self.min_lr)
                self.num_bad = 0
        return lr


class Trainer:
    """Owns the jitted step functions for one model architecture.

    Re-used across folds and hyperparameter trials that share a model config,
    so XLA compiles each (batch, time) bucket shape once.
    """

    def __init__(self, model, adam_eps: float = 1e-8):
        self.model = model
        self.tx = optax.inject_hyperparams(optax.adam)(learning_rate=1.0, eps=adam_eps)
        self._train_step = jax.jit(self._train_step_impl,
                                   static_argnums=(3, 5))
        self._eval_step = jax.jit(self._eval_step_impl, static_argnums=(3,))
        self.warmed_shapes: set = set()  # step shapes compiled on THIS trainer
        self._fold_cache: Dict[tuple, Any] = {}  # device-fold programs

    def init_state(self, rng: jax.Array, example: jnp.ndarray, lr: float) -> TrainState:
        from ..utils.profiling import span

        # jitted: flax's eager init would otherwise run the whole forward
        # (LSTM scan included) one dispatch at a time — seconds per fold on
        # a tunneled chip, and folds/trials re-init constantly. (NOT disk-
        # export-backed: exporting the init program segfaulted the virtual
        # 8-device CPU test env — r5; the ~seconds of per-arch init trace
        # per fresh process is acceptable.)
        if not hasattr(self, "_init_fn"):
            self._init_fn = jax.jit(
                lambda r, ex: self.model.init(
                    {"params": r, "dropout": r}, ex, train=False
                )
            )
        with span("train/init_state"):
            variables = self._init_fn(rng, example)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        opt_state = self.tx.init(params)
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            lr=jnp.asarray(lr, jnp.float32),
        )

    # --- steps -------------------------------------------------------------

    def _apply(self, params, batch_stats, batch, lengths, train, rng=None,
               dropout_rate=None):
        variables = {"params": params, "batch_stats": batch_stats}
        kwargs = dict(train=train)
        if lengths is not None:
            kwargs["lengths"] = lengths
        if dropout_rate is not None:
            kwargs["dropout_rate"] = dropout_rate
        if train:
            out, updates = self.model.apply(
                variables,
                batch,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
                **kwargs,
            )
            return out, updates["batch_stats"]
        out = self.model.apply(variables, batch, **kwargs)
        return out, batch_stats

    def _train_step_impl(self, state: TrainState, batch_and_labels, rng, masked,
                         dropout_rate=None, remat=False):
        batch, lengths, labels = batch_and_labels
        if not masked:
            lengths = None

        apply = self._apply
        if remat:
            # recompute the forward during the backward pass instead of
            # storing its activations (TrainConfig.remat); lengths/
            # dropout_rate ride as closed-over values so None stays static
            def apply(params, batch_stats, batch_, lengths_, train, rng_,
                      rate_):
                f = jax.checkpoint(
                    lambda p, bs, b: self._apply(
                        p, bs, b, lengths_, train, rng_, rate_
                    )
                )
                return f(params, batch_stats, batch_)

        def loss_fn(params):
            logits, new_stats = apply(
                params, state.batch_stats, batch, lengths, True, rng,
                dropout_rate,
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = state.lr
        updates, opt_state = self.tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(params=params, batch_stats=new_stats, opt_state=opt_state),
            loss,
        )

    def _eval_step_impl(self, state: TrainState, batch, lengths, masked):
        if not masked:
            lengths = None
        logits, _ = self._apply(state.params, state.batch_stats, batch, lengths, False)
        return logits

    # --- epoch-level API ---------------------------------------------------

    def eval_logits(
        self,
        state: TrainState,
        sequences: Sequence[np.ndarray],
        cfg: TrainConfig,
    ) -> np.ndarray:
        from ..data.batching import pad_batch, length_sorted_batches

        logits_out = np.zeros((len(sequences), self.model.num_classes), np.float32)
        pending = []  # bounded in-flight window: overlap without keeping
        # every padded batch resident on device at once
        max_inflight = 16

        def drain(item):
            idx, out = item
            logits_out[idx] = np.asarray(jax.device_get(out))

        if isinstance(sequences, SeqView):
            # zero-upload: gather rows from the resident corpus buffer
            corpus = sequences.corpus
            n = len(sequences)
            for start in range(0, n, cfg.batch_size):
                loc = np.arange(start, min(start + cfg.batch_size, n))
                args = (
                    state, corpus.x, corpus.lengths,
                    jnp.asarray(sequences.idx[loc].astype(np.int32)),
                )
                fn = self._eval_gather_fn(cfg.use_length_masking, args)
                pending.append((loc, fn(*args)))
                if len(pending) > max_inflight:
                    drain(pending.pop(0))
            for item in pending:
                drain(item)
            return logits_out

        for idx in length_sorted_batches(sequences, cfg.batch_size):
            batch, lengths = pad_batch(
                [sequences[i] for i in idx], min_bucket=cfg.min_bucket
            )
            pending.append((idx, self._eval_step(
                state, jnp.asarray(batch), jnp.asarray(lengths),
                cfg.use_length_masking,
            )))
            if len(pending) > max_inflight:
                drain(pending.pop(0))
        for item in pending:
            drain(item)
        return logits_out

    def eval_logits_deferred(
        self,
        state: TrainState,
        sequences: Sequence[np.ndarray],
        cfg: TrainConfig,
    ) -> Deferred:
        """Dispatch the whole eval pass and return a :class:`Deferred` whose
        result is the (N, num_classes) logits array.

        Nothing blocks here: callers (the CV engines) dispatch every fold's
        training + eval back-to-back and fetch all of them in one collect,
        instead of paying a tunnel round trip per fold. Per-batch logits are
        tiny (B × classes), so keeping them on device until the collect
        costs nothing; on the list path the padded INPUT batches of
        dispatched-but-unexecuted programs do stay resident, so oversized
        eval sets fall back to the bounded eager pass.
        """
        from ..data.batching import bucket_length

        n = len(sequences)
        if not isinstance(sequences, SeqView):
            d = int(np.asarray(sequences[0]).shape[1]) if n else 0
            pad_bytes = sum(
                4 * d * bucket_length(len(s), cfg.min_bucket)
                for s in sequences
            )
            if pad_bytes > (1 << 30):
                return Deferred.ready(self.eval_logits(state, sequences, cfg))

        idx_groups: List[np.ndarray] = []
        outs = []
        if isinstance(sequences, SeqView):
            corpus = sequences.corpus
            for start in range(0, n, cfg.batch_size):
                loc = np.arange(start, min(start + cfg.batch_size, n))
                idx_groups.append(loc)
                args = (
                    state, corpus.x, corpus.lengths,
                    jnp.asarray(sequences.idx[loc].astype(np.int32)),
                )
                fn = self._eval_gather_fn(cfg.use_length_masking, args)
                outs.append(fn(*args))
        else:
            from ..data.batching import length_sorted_batches, pad_batch

            for idx in length_sorted_batches(sequences, cfg.batch_size):
                batch, lengths = pad_batch(
                    [sequences[i] for i in idx], min_bucket=cfg.min_bucket
                )
                idx_groups.append(idx)
                outs.append(self._eval_step(
                    state, jnp.asarray(batch), jnp.asarray(lengths),
                    cfg.use_length_masking,
                ))

        def finalize(host):
            logits_out = np.zeros((n, self.model.num_classes), np.float32)
            for idx, out in zip(idx_groups, host):
                logits_out[idx] = np.asarray(out)
            return logits_out

        return Deferred(outs, finalize)

    def _eval_gather_fn(self, masked: bool, args: tuple):
        """Per-shape eval program for the resident-corpus gather path,
        backed by the disk AOT cache: a fresh process otherwise re-traces
        the eval forward per (batch-index length) shape — part of the
        dl_3fold first-pass wall the fold-program cache doesn't cover."""
        # exported programs are fixed-shape, so the key carries the resident
        # corpus buffer's shape too — two DeviceCorpus instances with the
        # same batch-index length but different (N, T, D) buffers (e.g. the
        # battery's reading vs combined sets) are different programs
        idx_len = int(args[3].shape[0])
        key = ("eval_gather", masked, idx_len,
               tuple(args[1].shape), str(getattr(args[1], "dtype", "")),
               tuple(args[2].shape))
        fn = self._fold_cache.get(key)
        if fn is None:
            def build():
                return jax.jit(
                    lambda st, x, ln, idx: self._eval_step_impl(
                        st, x[idx].astype(jnp.float32), ln[idx], masked
                    )
                )

            try:
                from .aot_cache import load_or_export, program_cache_key

                disk_key = program_cache_key(
                    repr(self.model), key, args,
                    sources=("train/loops.py", "models/cnn_lstm.py",
                             "ops/pallas/lstm.py"),
                )
                fn = load_or_export(build, disk_key, args, tag="eval")
            except Exception:  # cache infra must never block the eval pass
                fn = build()
            self._fold_cache[key] = fn
        return fn

    def _trials_eval_fn(self, masked: bool, gather: bool, args=None):
        """Jitted lane-vmapped eval step for a stacked trial TrainState.

        With ``args`` (single-device callers), the program is backed by the
        disk ``jax.export`` cache keyed on the argument shapes — the
        lane-batched trial eval was the one battery program still re-traced
        per fresh process (r4 VERDICT item 2). Multi-device/sharded args
        (or args=None) fall back to plain jit, which re-specializes freely.
        """

        if gather:
            f = lambda st, x, ln, idx: self._eval_step_impl(  # noqa: E731
                st, x[idx].astype(jnp.float32), ln[idx], masked
            )
            axes = (0, None, None, None)
        else:
            f = lambda st, x, ln: self._eval_step_impl(st, x, ln, masked)  # noqa: E731
            axes = (0, None, None)
        build = lambda: jax.jit(jax.vmap(f, in_axes=axes))  # noqa: E731

        if args is None:
            key = ("trials_eval", masked, gather)
            fn = self._fold_cache.get(key)
            if fn is None:
                fn = self._fold_cache[key] = build()
            return fn
        key = ("trials_eval", masked, gather,
               tuple(tuple(jnp.shape(a)) for a in jax.tree_util.tree_leaves(args)))
        fn = self._fold_cache.get(key)
        if fn is None:
            try:
                from .aot_cache import load_or_export, program_cache_key

                disk_key = program_cache_key(
                    repr(self.model), key[:3], args,
                    sources=("train/loops.py", "models/cnn_lstm.py",
                             "ops/pallas/lstm.py"),
                )
                fn = load_or_export(build, disk_key, args, tag="trials_eval")
            except Exception:  # cache infra must never block the eval pass
                fn = build()
            self._fold_cache[key] = fn
        return fn

    def eval_logits_trials_deferred(
        self,
        states: TrainState,
        sequences: Sequence[np.ndarray],
        cfg: TrainConfig,
    ) -> Deferred:
        """Eval pass for a lane-stacked trial state (train_trials_device):
        Deferred resolving to (K, N, num_classes) logits — every lane scores
        the same validation batch, so the batch uploads/gathers once and the
        model applies lane-batched. Inputs are passed as host numpy (never
        pre-committed) so the program follows the states' sharding: on a
        mesh, each chip evaluates its own trial's lane."""
        n = len(sequences)
        k = int(states.lr.shape[0])
        outs, idx_groups = [], []
        if isinstance(sequences, SeqView):
            corpus = sequences.corpus
            for start in range(0, n, cfg.batch_size):
                loc = np.arange(start, min(start + cfg.batch_size, n))
                idx_groups.append(loc)
                args = (
                    states, corpus.x, corpus.lengths,
                    sequences.idx[loc].astype(np.int32),
                )
                fn = self._trials_eval_fn(
                    cfg.use_length_masking, gather=True, args=args
                )
                outs.append(fn(*args))
        else:
            from ..data.batching import length_sorted_batches, pad_batch

            for idx in length_sorted_batches(sequences, cfg.batch_size):
                batch, lengths = pad_batch(
                    [sequences[i] for i in idx], min_bucket=cfg.min_bucket
                )
                idx_groups.append(idx)
                args = (states, batch, lengths)
                fn = self._trials_eval_fn(
                    cfg.use_length_masking, gather=False, args=args
                )
                outs.append(fn(*args))

        def finalize(host):
            logits_out = np.zeros((k, n, self.model.num_classes), np.float32)
            for idx, out in zip(idx_groups, host):
                logits_out[:, idx] = np.asarray(out)
            return logits_out

        return Deferred(outs, finalize)


def _warmup_step_shapes(trainer, state, cfg, train_lens, val_lens, dim) -> None:
    """Compile every step shape the epoch loop can encounter, concurrently.

    ``batch_iterator`` bounds padded time lengths to the bucket ladder, so the
    realizable shapes are (B, T) with B ∈ {batch_size, n mod batch_size} and
    T in the bucket set of the data. Serially, each first encounter blocks the
    loop for a multi-second XLA compile (on the tunneled chip, a remote
    compile-service round trip); compiling them up front from a thread pool
    overlaps those waits. Shapes already warmed on this ``trainer`` are
    skipped, so later folds/trials of the same dataset cost nothing.
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..data.batching import bucket_length

    shapes = set()
    t_buckets = {bucket_length(t, cfg.min_bucket) for t in train_lens}
    train_bs = {min(cfg.batch_size, len(train_lens))}
    if len(train_lens) % cfg.batch_size:
        train_bs.add(len(train_lens) % cfg.batch_size)
    for b in train_bs:
        for t in t_buckets:
            shapes.add(("train", int(b), int(t), cfg.use_length_masking))
    # the val pass is unshuffled, so its batch shapes are exactly enumerable
    for start in range(0, len(val_lens), cfg.batch_size):
        group = val_lens[start : start + cfg.batch_size]
        shapes.add(
            ("eval", len(group), int(bucket_length(max(group), cfg.min_bucket)),
             cfg.use_length_masking)
        )
    # per-trainer memo: the compiled-step caches live on each Trainer's jit
    # wrappers, so a process-global architecture key would skip warmup for a
    # FRESH trainer holding a cold cache (retraces would then serialize
    # inside the epoch loop); shapes warmed on this trainer cost nothing on
    # later folds/trials that reuse it
    rate_tag = cfg.dropout_rate is None
    shapes = {s for s in shapes if (rate_tag, s) not in trainer.warmed_shapes}
    if not shapes:
        return

    rng = jax.random.PRNGKey(0)  # separate key: must not consume the
    # training rng stream (warmup on/off yields identical histories)

    rate_arg = (
        None if cfg.dropout_rate is None
        else jnp.asarray(cfg.dropout_rate, jnp.float32)
    )

    def compile_one(spec):
        kind, b, t, _ = spec
        batch = jnp.zeros((b, t, dim), jnp.float32)
        lengths = jnp.full((b,), t, jnp.int32)
        if kind == "train":
            trainer._train_step(
                state,
                (batch, lengths, jnp.zeros((b,), jnp.int32)),
                rng,
                cfg.use_length_masking,
                rate_arg,
                cfg.remat,
            )
        else:
            trainer._eval_step(state, batch, lengths, cfg.use_length_masking)

    with ThreadPoolExecutor(max_workers=min(8, max(len(shapes), 1))) as ex:
        list(ex.map(compile_one, sorted(shapes)))
    # memoize only after every compile succeeded: a transient compile-service
    # failure must not permanently disable warmup for these shapes on a
    # cached Trainer (the jit caches keep whatever did compile, so a retry
    # only re-dispatches the cheap already-compiled calls)
    trainer.warmed_shapes.update((rate_tag, s) for s in shapes)


def _mean_val_loss(trainer, state, sequences, labels, cfg) -> float:
    """Batch-averaged validation loss (mean of per-batch means, matching the
    reference's ``val_loss / len(val_loader)`` at src/dl_cv_strategies.py:141)."""
    from ..data.batching import batch_iterator

    losses = []  # device scalars; ONE fetch for the whole pass
    for batch, lengths, labs in batch_iterator(
        sequences, labels, cfg.batch_size, shuffle=False, min_bucket=cfg.min_bucket
    ):
        logits = trainer._eval_step(
            state, jnp.asarray(batch), jnp.asarray(lengths), cfg.use_length_masking
        )
        losses.append(optax.softmax_cross_entropy_with_integer_labels(
            jnp.asarray(logits), jnp.asarray(labs)
        ).mean())
    return float(np.mean(jax.device_get(losses)))


class DeviceCorpus:
    """A sequence corpus resident on device as one padded (N, T, D) buffer.

    Uploaded ONCE per CV run; folds/trials reference rows through
    :class:`SeqView` index views, so no per-fold host→device transfer
    happens (on a tunneled chip the per-fold upload otherwise dominates the
    whole fold). Padding is to the corpus max length aligned up to
    ``align`` frames — a single compiled shape for every fold and trial.
    """

    def __init__(
        self, sequences: Sequence[np.ndarray], align: int = 128,
        sharding=None, dtype=None,
    ):
        """``dtype`` sets the RESIDENT storage dtype (default f32, or the
        ``RSAF_CORPUS_DTYPE`` env var). ``bfloat16`` halves the HBM
        footprint — the capacity lever for reference-scale session corpora
        (111 × ~12k frames × 768 is 4.2 GB in f32) — at a ~3e-3 relative
        quantization of the stored embeddings; consumers gather rows and
        cast back to f32 on device."""
        import os

        if dtype is None:
            dtype = os.environ.get("RSAF_CORPUS_DTYPE") or np.float32
        self.seqs = [np.asarray(s, dtype=np.float32) for s in sequences]
        lens = [len(s) for s in self.seqs]
        t_pad = max(align, -(-max(lens) // align) * align)
        d = self.seqs[0].shape[1]
        buf = np.zeros((len(self.seqs), t_pad, d), jnp.dtype(dtype))
        for i, s in enumerate(self.seqs):
            buf[i, : len(s)] = s
        from ..utils.profiling import span

        with span("corpus/upload"):
            if sharding is not None:
                # mesh callers replicate the corpus so lane-sharded trial
                # programs (train_trials_device) can read it on every chip
                self.x = jax.device_put(buf, sharding)
                self.lengths = jax.device_put(
                    np.asarray(lens, np.int32), sharding
                )
            else:
                self.x = jnp.asarray(buf)
                self.lengths = jnp.asarray(np.asarray(lens, np.int32))
        self.host_lengths = np.asarray(lens, np.int64)

    def view(self, idx: np.ndarray) -> "SeqView":
        return SeqView(self, np.asarray(idx, np.int64))

    @classmethod
    def from_resident(cls, resident, sharding=None) -> "DeviceCorpus":
        """Zero-copy corpus over an already-device-resident buffer (the
        fused extract→train handoff: features.wav2vec2.ResidentSequences,
        or a :class:`ResidentCorpus` pre-upload).

        No transfer happens here: the extractor's (N+1, T_pad, H) buffer is
        adopted as-is (the scratch row N is never gathered — fold/eval
        index programs only reference real rows). Host-side row access
        (``.seqs[i]``) downloads lazily, used only by streaming-path
        fallbacks."""
        own = getattr(resident, "device_corpus", None)
        if own is not None:  # ResidentCorpus already holds one
            return own()
        self = cls.__new__(cls)
        x = resident.x
        lens = jnp.asarray(np.asarray(resident.lengths, np.int32))
        if sharding is not None:
            x = jax.device_put(x, sharding)
            lens = jax.device_put(lens, sharding)
        self.x = x
        self.lengths = lens
        self.host_lengths = np.asarray(resident.lengths, np.int64)
        self.seqs = _LazyRows(resident)
        return self

    @staticmethod
    def nbytes_estimate(sequences: Sequence[np.ndarray], align: int = 128) -> int:
        t_pad = max(align, -(-max(len(s) for s in sequences) // align) * align)
        return 4 * len(sequences) * t_pad * int(np.asarray(sequences[0]).shape[1])


class ResidentCorpus:
    """A host sequence mapping plus its ONE-TIME device upload, reusable
    across CV calls.

    The CV engines upload a resident corpus per call (`_as_device_corpus`),
    so running the nested AND standard engine over the same corpus — the
    battery / experiments orchestration shape — pays the (N, T, D) upload
    twice. Wrapping the dict once::

        seqs = ResidentCorpus(sequences_dict)
        run_dl_nested_cv(seqs, meta, ...)       # adopts the resident buffer
        run_dl_standard_kfold_cv(seqs, meta, ...)  # zero re-upload

    keeps one buffer for every engine pass (the engines detect it through
    the same duck-type marker as the fused wav2vec2 handoff). Behaves as a
    read-only Mapping for host consumers. The arrays are adopted by
    reference — don't mutate them afterwards.
    """

    is_resident_sequences = True  # duck-type marker for the CV engines

    def __init__(self, sequences_dict, align: int = 128, sharding=None,
                 dtype=None):
        self.names = list(sequences_dict.keys())
        self._index = {n: i for i, n in enumerate(self.names)}
        self._corpus = DeviceCorpus(
            [sequences_dict[n] for n in self.names], align=align,
            sharding=sharding, dtype=dtype,
        )

    def device_corpus(self) -> DeviceCorpus:
        return self._corpus

    def row(self, name: str) -> int:
        return self._index[name]

    def __len__(self) -> int:
        return len(self.names)

    def __iter__(self):
        return iter(self.names)

    def __contains__(self, name) -> bool:
        return name in self._index

    def keys(self):
        return list(self.names)

    def __getitem__(self, name):
        return self._corpus.seqs[self._index[name]]

    def items(self):
        return [(n, self[n]) for n in self.names]


class _LazyRows:
    """List-of-arrays façade over a resident corpus that downloads a row
    only when indexed (and caches it) — host fallbacks stay functional
    without defeating the zero-transfer handoff."""

    def __init__(self, resident):
        self._resident = resident

    def __len__(self) -> int:
        return len(self._resident.names)

    def __getitem__(self, i: int) -> np.ndarray:
        return self._resident[self._resident.names[i]]


class SeqView:
    """List-of-arrays façade over :class:`DeviceCorpus` rows.

    Behaves like ``[corpus.seqs[i] for i in idx]`` for host consumers
    (len/iteration/indexing), while device consumers (the device fold,
    ``eval_logits``) read the resident buffer through ``.corpus``/``.idx``
    without any transfer.
    """

    def __init__(self, corpus: DeviceCorpus, idx: np.ndarray):
        self.corpus = corpus
        self.idx = idx

    def __len__(self) -> int:
        return len(self.idx)

    def __getitem__(self, i: int) -> np.ndarray:
        return self.corpus.seqs[self.idx[i]]

    def subset(self, idx: np.ndarray) -> "SeqView":
        return SeqView(self.corpus, self.idx[np.asarray(idx, np.int64)])


def _epoch_batch_plan(
    n: int, epochs: int, batch_size: int, seed: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Batch index plan mirroring ``batch_iterator``'s shuffles exactly:
    per epoch, a ``RandomState(seed + epoch)`` permutation chunked into
    full batches (E, S_full, B) plus a trailing remainder (E, r)."""
    s_full, r = divmod(n, batch_size)
    full = np.zeros((epochs, s_full, batch_size), np.int32)
    rem = np.zeros((epochs, r), np.int32)
    for e in range(epochs):
        order = np.arange(n)
        np.random.RandomState(seed + e).shuffle(order)
        if s_full:
            full[e] = order[: s_full * batch_size].reshape(s_full, batch_size)
        if r:
            rem[e] = order[s_full * batch_size:]
    return full, rem


def _pad_all(sequences, min_bucket: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a whole split to ONE global bucketed length (single compiled
    shape for every batch gathered from it)."""
    from ..data.batching import pad_batch

    return pad_batch(list(sequences), min_bucket=min_bucket)


def _device_fold_fn(trainer: Trainer, statics: tuple):
    """The raw (unjitted) fold function — one complete training fold.

    Replaces the host epoch loop of :func:`train_model` (reference
    src/dl_cv_strategies.py:87-165) with a ``lax.while_loop`` over epochs —
    each epoch a ``lax.scan`` over gathered minibatches, then a scanned
    validation pass, ReduceLROnPlateau decay, best-weight tracking and the
    early-stop condition, all as traced arithmetic. The host dispatches
    once per fold and fetches once, instead of once per batch: on a
    tunneled chip (~100 ms/round trip) this is the difference between the
    fold running at device speed and at host-latency speed.

    RNG splits mirror the streaming loop's order (one split per batch, full
    batches then remainder), so on uniform-bucket data the two paths are
    numerically identical.
    """
    (masked, has_rate, epochs, patience, batch_size, use_plateau,
     restore_best, remat, plateau_factor, plateau_patience, s_full, r,
     sv_full, rv) = statics
    sce = optax.softmax_cross_entropy_with_integer_labels

    def fold(state, rng, rate, x_tr, len_tr, y_tr, full, rem,
             x_va, len_va, y_va, va_full, va_rem):
        rate_arg = rate if has_rate else None

        def tstep(carry, idx):
            st, key = carry
            key, sk = jax.random.split(key)
            # astype: resident corpora may store bf16 (capacity lever);
            # compute stays f32 (identity for f32 buffers)
            st, loss = trainer._train_step_impl(
                st, (x_tr[idx].astype(jnp.float32), len_tr[idx], y_tr[idx]),
                sk, masked, rate_arg, remat,
            )
            return (st, key), loss

        def val_loss(st):
            # mean of per-batch means over sequential batches — the
            # reference's val_loss / len(val_loader) (:141), as in
            # _mean_val_loss
            def one(idx):
                logits = trainer._eval_step_impl(
                    st, x_va[idx].astype(jnp.float32), len_va[idx], masked
                )
                return sce(logits, y_va[idx]).mean()

            losses = []
            if sv_full:
                _, ls = jax.lax.scan(lambda c, idx: (c, one(idx)), 0.0, va_full)
                losses.append(ls)
            if rv:
                losses.append(one(va_rem)[None])
            return jnp.concatenate(losses).mean()

        def cond(c):
            return (c["epoch"] < epochs) & (c["no_improve"] < patience)

        def body(c):
            e = c["epoch"]
            st, key = c["state"], c["rng"]
            losses = []
            if s_full:
                (st, key), ls = jax.lax.scan(tstep, (st, key), full[e])
                losses.append(ls)
            if r:
                (st, key), lr_loss = tstep((st, key), rem[e])
                losses.append(lr_loss[None])
            tl = jnp.concatenate(losses).mean()
            vl = val_loss(st)
            if use_plateau:
                # torch ReduceLROnPlateau, mode='min', rel threshold 1e-4
                improved = vl < c["sch_best"] * (1.0 - 1e-4)
                sch_best = jnp.where(improved, vl, c["sch_best"])
                sch_bad = jnp.where(improved, 0, c["sch_bad"] + 1)
                decay = sch_bad > plateau_patience
                st = st.replace(
                    lr=jnp.where(decay, st.lr * plateau_factor, st.lr)
                )
                sch_bad = jnp.where(decay, 0, sch_bad)
            else:
                sch_best, sch_bad = c["sch_best"], c["sch_bad"]
            better = vl < c["best_val"]
            keep = lambda b, n_: jnp.where(better, n_, b)
            return {
                "epoch": e + 1,
                "state": st,
                "rng": key,
                "best_val": jnp.where(better, vl, c["best_val"]),
                "best_params": jax.tree.map(keep, c["best_params"], st.params),
                "best_stats": jax.tree.map(keep, c["best_stats"], st.batch_stats),
                "no_improve": jnp.where(better, 0, c["no_improve"] + 1),
                "sch_best": sch_best,
                "sch_bad": sch_bad,
                "train_hist": c["train_hist"].at[e].set(tl),
                "val_hist": c["val_hist"].at[e].set(vl),
            }

        init = {
            "epoch": jnp.int32(0),
            "state": state,
            "rng": rng,
            "best_val": jnp.float32(jnp.inf),
            "best_params": state.params,
            "best_stats": state.batch_stats,
            "no_improve": jnp.int32(0),
            "sch_best": jnp.float32(jnp.inf),
            "sch_bad": jnp.int32(0),
            "train_hist": jnp.full((epochs,), jnp.nan, jnp.float32),
            "val_hist": jnp.full((epochs,), jnp.nan, jnp.float32),
        }
        out = jax.lax.while_loop(cond, body, init)
        final = out["state"]
        if restore_best:
            final = final.replace(
                params=out["best_params"], batch_stats=out["best_stats"]
            )
        return final, out["train_hist"], out["val_hist"], out["epoch"]

    return fold


def _build_device_fold(trainer: Trainer, statics: tuple):
    """Jitted single-fold program (see :func:`_device_fold_fn`)."""
    return jax.jit(_device_fold_fn(trainer, statics))


def _build_device_fold_trials(trainer: Trainer, statics: tuple):
    """K hyperparameter trials of ONE architecture as one vmapped program.

    The reference runs tuning trials strictly sequentially (Optuna
    ``n_jobs=1`` "for GPU safety", src/dl_cv_strategies.py:308-310). Trials
    that share an architecture differ only in learning rate and dropout
    rate — both runtime scalars of the compiled fold — so a whole batch of
    them stacks into one ``jax.vmap``'d fold program: every matmul runs
    lane-batched on the MXU, and under a device mesh the lane axis shards
    across chips so each chip trains its own trial (the only collective is
    the batched while_loop's lane-any predicate reduce).

    Lane-mapped inputs: ``state.lr`` and the dropout ``rate``; everything
    else (initial params, rng stream, fold data, batch plan) is identical
    across lanes, exactly as the sequential path would see it.
    """
    fold = _device_fold_fn(trainer, statics)
    state_axes = TrainState(params=None, batch_stats=None, opt_state=None, lr=0)
    in_axes = (state_axes, None, 0) + (None,) * 10
    return jax.jit(jax.vmap(fold, in_axes=in_axes))


def _fold_statics(cfg: "TrainConfig", n_tr: int, n_va: int) -> tuple:
    s_full, r = divmod(n_tr, cfg.batch_size)
    sv_full, rv = divmod(n_va, cfg.batch_size)
    return (
        cfg.use_length_masking, cfg.dropout_rate is not None, cfg.epochs,
        cfg.patience, cfg.batch_size, cfg.use_plateau, cfg.restore_best,
        bool(cfg.remat), float(cfg.plateau_factor), int(cfg.plateau_patience),
        s_full, r, sv_full, rv,
    )


def _shared_corpus_views(train_sequences, val_sequences) -> bool:
    return (
        isinstance(train_sequences, SeqView)
        and isinstance(val_sequences, SeqView)
        and train_sequences.corpus is val_sequences.corpus
    )


def _fold_operands(
    train_sequences, train_labels, val_sequences, val_labels, cfg, put=None
):
    """The 10 array operands of a device-fold program:
    (x_tr, len_tr, y_tr, full, rem, x_va, len_va, y_va, va_full, va_rem).

    ``put`` places derived host arrays on device (default ``jnp.asarray``);
    mesh callers pass a replicating ``jax.device_put`` so operands coexist
    with lane-sharded trial inputs. Resident-corpus buffers are used as-is —
    their placement is the corpus owner's responsibility.
    """
    put = put or jnp.asarray
    full_l, rem_l = _epoch_batch_plan(
        len(train_sequences), cfg.epochs, cfg.batch_size, cfg.seed
    )
    sv_full, rv = divmod(len(val_sequences), cfg.batch_size)
    if _shared_corpus_views(train_sequences, val_sequences):
        # zero-upload path: gather fold rows from the resident buffer
        corpus = train_sequences.corpus
        tr_idx, va_idx = train_sequences.idx, val_sequences.idx
        x_tr = x_va = corpus.x
        len_tr = len_va = corpus.lengths
        full, rem = tr_idx[full_l], tr_idx[rem_l]
        # labels scattered onto global corpus rows (every gathered id is in
        # exactly one of the two views)
        y_global = np.zeros(len(corpus.seqs), np.int32)
        y_global[tr_idx] = np.asarray(train_labels, np.int32)
        y_global[va_idx] = np.asarray(val_labels, np.int32)
        y_tr = y_va = put(y_global)
        va_full = va_idx[: sv_full * cfg.batch_size].reshape(sv_full, cfg.batch_size)
        va_rem = va_idx[sv_full * cfg.batch_size:]
    else:
        x_tr, len_tr = _pad_all(train_sequences, cfg.min_bucket)
        x_va, len_va = _pad_all(val_sequences, cfg.min_bucket)
        x_tr, len_tr = put(x_tr), put(len_tr)
        x_va, len_va = put(x_va), put(len_va)
        y_tr = put(np.asarray(train_labels, np.int32))
        y_va = put(np.asarray(val_labels, np.int32))
        full, rem = full_l, rem_l
        m = len(val_sequences)
        va_full = np.arange(sv_full * cfg.batch_size, dtype=np.int64
                            ).reshape(sv_full, cfg.batch_size)
        va_rem = np.arange(sv_full * cfg.batch_size, m, dtype=np.int64)
    return (
        x_tr, len_tr, y_tr,
        put(np.asarray(full, np.int32)), put(np.asarray(rem, np.int32)),
        x_va, len_va, y_va,
        put(np.asarray(va_full, np.int32)), put(np.asarray(va_rem, np.int32)),
    )


def _operand_devices(operands) -> int:
    """Max device count any operand is committed to — part of the fold
    cache key, since exported programs bake the device assignment in."""
    n = 1
    for o in operands:
        sharding = getattr(o, "sharding", None)
        if sharding is not None:
            n = max(n, len(getattr(sharding, "device_set", ())))
    return n


def _train_model_device(
    trainer, train_sequences, train_labels, val_sequences, val_labels, cfg,
    state, rng, defer_histories: bool = False,
):
    """Dispatch one device-resident fold program (see _build_device_fold)."""
    operands = _fold_operands(
        train_sequences, train_labels, val_sequences, val_labels, cfg
    )
    statics = _fold_statics(cfg, len(train_sequences), len(val_sequences))
    rate = jnp.float32(cfg.dropout_rate if cfg.dropout_rate is not None else 0.0)
    # exported programs are fixed-shape (unlike jit, which re-specializes),
    # so the cache key carries the operand shapes: a SeqView fold (gathers
    # from the whole corpus buffer) and a host-list fold of the same sizes
    # are different programs
    mem_key = (statics,
               tuple((tuple(jnp.shape(o)), str(getattr(o, "dtype", "")))
                     for o in operands),
               _operand_devices(operands))
    fn = trainer._fold_cache.get(mem_key)
    if fn is None:
        # disk-backed jax.export artifact: a fresh process deserializes the
        # traced program in ms instead of re-tracing the epoch while_loop
        # pyramid (the measured first-pass wall of a CV round)
        from .aot_cache import fold_cache_key, load_or_export

        args = (state, rng, rate) + operands
        key = fold_cache_key(repr(trainer.model), statics, args)
        fn = trainer._fold_cache[mem_key] = load_or_export(
            lambda: _build_device_fold(trainer, statics), key, args
        )
    final, th, vh, n_epochs = fn(state, rng, rate, *operands)

    def _trim(host):
        th_h, vh_h, n = host
        n = int(n)
        return (
            [float(v) for v in np.asarray(th_h)[:n]],
            [float(v) for v in np.asarray(vh_h)[:n]],
        )

    hist = Deferred((th, vh, n_epochs), _trim)
    if defer_histories:
        # the final state stays on device; nothing here blocks, so callers
        # can queue the next fold's programs behind this one
        return final, hist
    th_l, vh_l = hist.result()
    return final, th_l, vh_l


def _device_fold_fits(train_sequences, val_sequences, cfg) -> bool:
    """auto-mode gate: padded train+val arrays must fit the budget."""
    from ..data.batching import bucket_length

    if not len(train_sequences) or not len(val_sequences) or cfg.epochs <= 0:
        return False
    d = int(np.asarray(train_sequences[0]).shape[1])
    t_tr = bucket_length(max(len(s) for s in train_sequences), cfg.min_bucket)
    t_va = bucket_length(max(len(s) for s in val_sequences), cfg.min_bucket)
    n_bytes = 4 * d * (len(train_sequences) * t_tr + len(val_sequences) * t_va)
    return n_bytes <= cfg.device_fold_budget_bytes


def _init_example(train_sequences, cfg) -> np.ndarray:
    """Tiny (1, min_bucket, D) example for parameter init. Param shapes
    depend only on the feature dim, so resident-corpus views read D from
    the device buffer's metadata instead of downloading a row (the
    fused-handoff path must stay zero-transfer)."""
    if isinstance(train_sequences, SeqView):
        d = int(train_sequences.corpus.x.shape[2])
        return np.zeros((1, cfg.min_bucket, d), np.float32)
    from ..data.batching import pad_batch

    example, _ = pad_batch(
        [train_sequences[0][: min(len(train_sequences[0]), 2)]],
        min_bucket=cfg.min_bucket,
    )
    return example


def train_trials_device(
    trainer: Trainer,
    train_sequences: Sequence[np.ndarray],
    train_labels: Sequence[int],
    val_sequences: Sequence[np.ndarray],
    val_labels: Sequence[int],
    cfg: TrainConfig,
    learning_rates: Sequence[float],
    dropout_rates: Sequence[float],
    mesh=None,
    lane_axis: str = "dp",
) -> Tuple[TrainState, Deferred]:
    """Train K same-architecture tuning trials as ONE vmapped fold program.

    Replaces the reference's strictly sequential Optuna trials
    (src/dl_cv_strategies.py:308-310, ``n_jobs=1``) with a lane-batched
    program: lanes differ only in learning rate and dropout rate, which are
    runtime scalars, so one XLA program trains the whole batch — matmuls run
    lane-batched on the MXU on one chip, and with ``mesh`` the lane axis is
    sharded over ``lane_axis`` so each chip trains its own trial.

    Returns ``(states, histories)`` where every leaf of ``states`` has a
    leading lane axis K and ``histories`` is a Deferred resolving to a list
    of per-lane ``(train_hist, val_hist)`` pairs. Nothing blocks; compose
    with :meth:`Trainer.eval_logits_trials_deferred` and fetch once.

    Lane parity: initial params and the rng stream come from ``cfg.seed``
    exactly as in :func:`train_model`, so lane i reproduces what a
    sequential run of trial i would compute.
    """
    if len(learning_rates) != len(dropout_rates):
        raise ValueError("learning_rates and dropout_rates must align")
    k = len(learning_rates)

    rng = jax.random.PRNGKey(cfg.seed)
    example = _init_example(train_sequences, cfg)
    rng, init_rng = jax.random.split(rng)
    state = trainer.init_state(init_rng, jnp.asarray(example), cfg.learning_rate)

    put = jnp.asarray
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        repl = NamedSharding(mesh, PartitionSpec())
        lane = NamedSharding(
            mesh,
            PartitionSpec(lane_axis if k % mesh.shape[lane_axis] == 0 else None),
        )
        put = lambda a: jax.device_put(jnp.asarray(a), repl)  # noqa: E731
        state, rng = jax.device_put((state, rng), repl)
    operands = _fold_operands(
        train_sequences, train_labels, val_sequences, val_labels, cfg, put=put
    )
    lrs = np.asarray(learning_rates, np.float32)
    rates = np.asarray(dropout_rates, np.float32)
    if mesh is not None:
        lrs, rates = jax.device_put((jnp.asarray(lrs), jnp.asarray(rates)), lane)
    state = state.replace(lr=jnp.asarray(lrs))

    statics = _fold_statics(cfg, len(train_sequences), len(val_sequences))
    if not statics[1]:  # has_rate must hold: rates are a lane-mapped operand
        raise ValueError("train_trials_device requires cfg.dropout_rate set")
    key = ("trials", k, statics,
           tuple((tuple(jnp.shape(o)), str(getattr(o, "dtype", "")))
                 for o in operands),
           _operand_devices(operands))
    fn = trainer._fold_cache.get(key)
    if fn is None:
        if mesh is None:
            # single-chip trial batches reuse the disk-backed export cache
            # (sharded programs bake placements in, so mesh runs trace live)
            from .aot_cache import fold_cache_key, load_or_export

            args = (state, rng, jnp.asarray(rates)) + operands
            disk_key = fold_cache_key(repr(trainer.model), key, args)
            fn = load_or_export(
                lambda: _build_device_fold_trials(trainer, statics),
                disk_key, args, tag="trials",
            )
        else:
            fn = _build_device_fold_trials(trainer, statics)
        trainer._fold_cache[key] = fn
    final, th, vh, n_epochs = fn(state, rng, jnp.asarray(rates), *operands)

    def _trim(host):
        th_h, vh_h, n_h = host
        out = []
        for lane_i in range(k):
            n = int(np.asarray(n_h)[lane_i])
            out.append((
                [float(v) for v in np.asarray(th_h)[lane_i, :n]],
                [float(v) for v in np.asarray(vh_h)[lane_i, :n]],
            ))
        return out

    return final, Deferred((th, vh, n_epochs), _trim)


def train_model(
    trainer: Trainer,
    train_sequences: Sequence[np.ndarray],
    train_labels: Sequence[int],
    val_sequences: Sequence[np.ndarray],
    val_labels: Sequence[int],
    cfg: TrainConfig,
    verbose: bool = False,
    defer_histories: bool = False,
):
    """Full training run with early stopping and best-weight restore.

    Returns (best_state, train_loss_history, val_loss_history) — the same
    contract as the reference's _train_eval_loop (src/dl_cv_strategies.py:
    87-165): per-epoch mean train loss, per-epoch val loss, plateau LR decay,
    stop after ``patience`` epochs without val improvement, return the
    best-val-loss weights.

    With ``defer_histories`` the return is ``(best_state, Deferred)`` where
    the Deferred resolves to ``(train_hist, val_hist)`` — on the
    device-resident fold path nothing blocks, so a CV engine can dispatch
    every fold's training + eval and fetch them all in one collect (one
    tunnel round trip instead of one per fold).
    """
    from ..data.batching import batch_iterator, pad_batch

    rng = jax.random.PRNGKey(cfg.seed)
    example = _init_example(train_sequences, cfg)
    rng, init_rng = jax.random.split(rng)
    state = trainer.init_state(init_rng, jnp.asarray(example), cfg.learning_rate)

    if cfg.device_fold != "off" and (
        cfg.device_fold == "on"
        or _shared_corpus_views(train_sequences, val_sequences)
        or _device_fold_fits(train_sequences, val_sequences, cfg)
    ):
        return _train_model_device(
            trainer, train_sequences, train_labels, val_sequences, val_labels,
            cfg, state, rng, defer_histories=defer_histories,
        )

    if cfg.parallel_warmup and train_sequences and val_sequences:
        _warmup_step_shapes(
            trainer,
            state,
            cfg,
            [len(s) for s in train_sequences],
            [len(s) for s in val_sequences],
            int(np.asarray(train_sequences[0]).shape[1]),
        )

    rate_arg = (
        None if cfg.dropout_rate is None
        else jnp.asarray(cfg.dropout_rate, jnp.float32)
    )
    scheduler = ReduceLROnPlateau(cfg.plateau_factor, cfg.plateau_patience)
    best_val = float("inf")
    best_state = state
    epochs_no_improve = 0
    train_hist: List[float] = []
    val_hist: List[float] = []
    lr = cfg.learning_rate

    for epoch in range(cfg.epochs):
        epoch_losses = []
        for batch, lengths, labs in batch_iterator(
            train_sequences,
            train_labels,
            cfg.batch_size,
            shuffle=True,
            seed=cfg.seed + epoch,
            min_bucket=cfg.min_bucket,
        ):
            rng, step_rng = jax.random.split(rng)
            state, loss = trainer._train_step(
                state,
                (jnp.asarray(batch), jnp.asarray(lengths), jnp.asarray(labs)),
                step_rng,
                cfg.use_length_masking,
                rate_arg,
                cfg.remat,
            )
            # keep losses on device: one fetch per EPOCH, not per batch —
            # per-step float() syncs dominate wall time on the tunneled chip
            epoch_losses.append(loss)
        train_hist.append(float(np.mean(jax.device_get(epoch_losses))))

        val_loss = _mean_val_loss(trainer, state, val_sequences, val_labels, cfg)
        val_hist.append(val_loss)
        if cfg.use_plateau:
            lr = scheduler.step(val_loss, lr)
            state = state.replace(lr=jnp.asarray(lr, jnp.float32))

        if val_loss < best_val:
            best_val = val_loss
            best_state = state
            epochs_no_improve = 0
        else:
            epochs_no_improve += 1
        if verbose:
            print(
                f"epoch {epoch + 1}: train {train_hist[-1]:.4f} "
                f"val {val_loss:.4f} lr {lr:.2e}"
            )
        if epochs_no_improve >= cfg.patience:
            if verbose:
                print(f"  > early stop at epoch {epoch + 1}")
            break

    final = best_state if cfg.restore_best else state
    if defer_histories:  # streaming path ran eagerly; wrap for API symmetry
        return final, Deferred.ready((train_hist, val_hist))
    return final, train_hist, val_hist


def evaluate_model_deferred(
    trainer: Trainer,
    state: TrainState,
    sequences: Sequence[np.ndarray],
    labels: Sequence[int],
    cfg: TrainConfig,
) -> Deferred:
    """Deferred :func:`evaluate_model`: dispatches the eval pass and returns
    a Deferred resolving to (y_true, y_pred, p_class1). Composes with
    ``train_model(..., defer_histories=True)`` so CV engines overlap every
    fold's programs and fetch once."""
    d = trainer.eval_logits_deferred(state, sequences, cfg)
    y_true = np.asarray(labels)

    def finalize(host):
        # host-side softmax: finalize runs at collect time and must not
        # dispatch device work (that would re-serialize on round trips)
        logits = d.finalize(host)
        z = np.exp(logits - logits.max(axis=-1, keepdims=True))
        probs = (z / z.sum(axis=-1, keepdims=True))[:, 1]
        preds = np.argmax(logits, axis=-1)
        return y_true, np.asarray(preds), probs.astype(np.float32)

    return Deferred(d.arrays, finalize)


def evaluate_model(
    trainer: Trainer,
    state: TrainState,
    sequences: Sequence[np.ndarray],
    labels: Sequence[int],
    cfg: TrainConfig,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(y_true, y_pred, p_class1) — contract of reference _eval_model
    (src/dl_cv_strategies.py:168-194)."""
    logits = trainer.eval_logits(state, sequences, cfg)
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)[:, 1]
    preds = np.argmax(logits, axis=-1)
    return np.asarray(labels), np.asarray(preds), np.asarray(probs)
