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
    # compile every (batch, time-bucket) step shape concurrently before the
    # epoch loop: XLA compiles release the GIL (and go through a remote
    # compile service on the tunneled chip), so threads overlap what would
    # otherwise be one serial multi-second compile per shape
    parallel_warmup: bool = True


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
        self._train_step = jax.jit(self._train_step_impl, static_argnums=(3,))
        self._eval_step = jax.jit(self._eval_step_impl, static_argnums=(3,))
        self.warmed_shapes: set = set()  # step shapes compiled on THIS trainer

    def init_state(self, rng: jax.Array, example: jnp.ndarray, lr: float) -> TrainState:
        variables = self.model.init(
            {"params": rng, "dropout": rng}, example, train=False
        )
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
                         dropout_rate=None):
        batch, lengths, labels = batch_and_labels
        if not masked:
            lengths = None

        def loss_fn(params):
            logits, new_stats = self._apply(
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


def train_model(
    trainer: Trainer,
    train_sequences: Sequence[np.ndarray],
    train_labels: Sequence[int],
    val_sequences: Sequence[np.ndarray],
    val_labels: Sequence[int],
    cfg: TrainConfig,
    verbose: bool = False,
) -> Tuple[TrainState, List[float], List[float]]:
    """Full training run with early stopping and best-weight restore.

    Returns (best_state, train_loss_history, val_loss_history) — the same
    contract as the reference's _train_eval_loop (src/dl_cv_strategies.py:
    87-165): per-epoch mean train loss, per-epoch val loss, plateau LR decay,
    stop after ``patience`` epochs without val improvement, return the
    best-val-loss weights.
    """
    from ..data.batching import batch_iterator, pad_batch

    rng = jax.random.PRNGKey(cfg.seed)
    # init on a tiny slice: shapes are all that matter, and an eager init on
    # a full-length bucketed sequence dispatches hundreds of ops per call
    example, _ = pad_batch(
        [train_sequences[0][: min(len(train_sequences[0]), 2)]],
        min_bucket=cfg.min_bucket,
    )
    rng, init_rng = jax.random.split(rng)
    state = trainer.init_state(init_rng, jnp.asarray(example), cfg.learning_rate)

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

    return (best_state if cfg.restore_best else state), train_hist, val_hist


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
