"""CNN-LSTM sequence classifier (Flax), TPU-first.

Capability parity with the reference's PyTorch model (src/models.py:109-192):
two residual Conv1d blocks → time max-pool ×2 → 2-layer bidirectional LSTM →
attention pooling → dropout → linear head, with silu/gelu activations
selectable per hyperparameter search (src/models.py:7-25).

TPU-first design differences from the reference (deliberate, not drift):

* Feature-last layout ``(B, T, C)`` everywhere — Flax convs are NWC-native,
  so the reference's two ``permute`` round-trips (src/models.py:172,181)
  disappear.
* The LSTM is a ``lax.scan`` whose input projections for *all four gates and
  the whole sequence* are hoisted out of the scan into one big matmul
  ``x @ W_all`` that lands on the MXU; only the small recurrent ``h @ U``
  matmul runs per step. Bidirectional = the same cell scanned over the
  reversed sequence (a ``jnp.flip``, free under XLA fusion).
* An optional ``lengths`` argument masks padded timesteps in attention
  pooling and freezes the LSTM state past each sequence's end. The reference
  pads batches with zeros and lets padding flow through (its collate_fn,
  src/dl_cv_strategies.py:64-84); ``lengths=None`` reproduces that
  pad-through BEHAVIOR, though not bit-for-bit: the reference pads to each
  batch's max length while this framework pads to the geometric bucket
  ladder (XLA needs stable shapes), so the amount of zero padding flowing
  through conv bias/BN/attention differs. BatchNorm statistics include
  padded frames in BOTH frameworks (torch BN1d does the same), in either
  masking mode — only the attention/LSTM reads are masked by ``lengths``.
* ``dropout_rate`` may also be passed at CALL time as a traced scalar
  (overriding the static attribute): hyperparameter searches then reuse one
  compiled step across trials instead of recompiling per sampled rate.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_activation_fn(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """silu/gelu lookup (same legal set as reference src/models.py:7-25).

    gelu is the EXACT erf form: torch ``F.gelu`` defaults to exact, while
    flax ``nn.gelu`` defaults to the tanh approximation (~1e-3 deviation
    near |x|≈2, which compounds through the conv/BN/LSTM stack).
    """
    if name == "silu":
        return nn.silu
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(f"Unsupported activation function: {name}")


class RateDropout(nn.Module):
    """Dropout whose rate is a RUNTIME value (traced scalar), unlike
    ``nn.Dropout`` whose static rate is baked into the compiled program —
    hyperparameter searches over dropout would otherwise recompile every
    step shape per sampled rate. Paramless; draws from the same 'dropout'
    RNG collection as ``nn.Dropout``."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, rate, deterministic: bool) -> jnp.ndarray:
        if deterministic:
            return x
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
        return jnp.where(keep, x / jnp.maximum(1.0 - rate, 1e-6), 0.0)


class ResidualBlock(nn.Module):
    """Two k=3 same-padded convs with BN, plus a projected skip.

    Structure parity: src/models.py:27-76 (conv→bn→act→dropout→conv→bn,
    1×1-conv+BN shortcut when channel counts differ, post-add activation).
    Operates on (B, T, C).
    """

    out_channels: int
    kernel_size: int = 3
    dropout: float = 0.2
    activation_fn: str = "silu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        act = get_activation_fn(self.activation_fn)
        h = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME", name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, name="bn1")(h)
        h = act(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME", name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn2")(h)
        if x.shape[-1] != self.out_channels:
            s = nn.Conv(self.out_channels, (1,), name="shortcut_conv")(x)
            s = nn.BatchNorm(use_running_average=not train, name="shortcut_bn")(s)
        else:
            s = x
        return act(h + s)


class LSTMCellFused(nn.Module):
    """Single-direction LSTM layer as a scan with hoisted input projections.

    The (T, B, 4H) input-gate pre-activations are computed once outside the
    scan (one MXU matmul over the flattened (B*T, C) input); the scan body
    only does the (B, H) @ (H, 4H) recurrent matmul. Gate order: i, f, g, o.

    ``input_dim`` may be fixed at construction (required for the grouped
    BiLSTM path that reads this cell's parameters directly); otherwise it is
    inferred from the first call.
    """

    hidden_dim: int
    input_dim: Optional[int] = None

    def _params(self, c: int):
        h_dim = self.hidden_dim
        wx = self.param(
            "wx", nn.initializers.xavier_uniform(), (c, 4 * h_dim), jnp.float32
        )
        wh = self.param(
            "wh", nn.initializers.orthogonal(), (h_dim, 4 * h_dim), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (4 * h_dim,), jnp.float32)
        return wx, wh, bias

    @nn.compact
    def gates_and_weights(self, x: jnp.ndarray):
        """(T, B, 4H) hoisted gate pre-activations + the recurrent matrix."""
        b, t, c = x.shape
        wx, wh, bias = self._params(self.input_dim or c)
        gates_x = (x.reshape(b * t, c) @ wx).reshape(b, t, 4 * self.hidden_dim) + bias
        return jnp.swapaxes(gates_x, 0, 1), wh

    def __call__(
        self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        b, t, _ = x.shape
        h_dim = self.hidden_dim
        gates_x, wh = self.gates_and_weights(x)

        # On TPU, the recurrence runs as a Pallas kernel: state and recurrent
        # weights stay in VMEM for the whole sequence instead of bouncing
        # through HBM every step (~2x latency win at flagship shapes). The
        # kernel does NOT freeze state past `lengths`, and a standalone cell
        # caller may read past-length outputs, so this path is gated to
        # lengths=None here. (BiLSTM's grouped path uses the kernel even with
        # lengths because there every consumer provably ignores past-length
        # outputs — see the note there.)
        from ..ops.pallas.lstm import lstm_recurrence, pallas_available

        if pallas_available() and lengths is None:
            hs = lstm_recurrence(gates_x, wh)
            return jnp.swapaxes(hs, 0, 1)

        hs = _lstm_scan(gates_x, wh, lengths)
        return jnp.swapaxes(hs, 0, 1)  # (B, T, H)


def _lstm_scan(
    gates_x: jnp.ndarray, wh: jnp.ndarray, lengths: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """lax.scan LSTM recurrence over (T, B, 4H) gate pre-activations."""
    t, b, four_h = gates_x.shape
    h_dim = four_h // 4

    def step(carry, inputs):
        h_prev, c_prev = carry
        gx, t_idx = inputs
        z = gx + h_prev @ wh
        i, f, g, o = jnp.split(z, 4, axis=-1)
        i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c_prev + i * g
        h_new = o * jnp.tanh(c_new)
        if lengths is not None:
            alive = (t_idx < lengths)[:, None]
            h_new = jnp.where(alive, h_new, h_prev)
            c_new = jnp.where(alive, c_new, c_prev)
        return (h_new, c_new), h_new

    init = (
        jnp.zeros((b, h_dim), gates_x.dtype),
        jnp.zeros((b, h_dim), gates_x.dtype),
    )
    _, hs = jax.lax.scan(step, init, (gates_x, jnp.arange(t)))
    return hs


class BiLSTM(nn.Module):
    """Stacked bidirectional LSTM with inter-layer dropout.

    Parity: torch ``nn.LSTM(bidirectional=True, num_layers=n, dropout=p)``
    (src/models.py:145-152) — dropout applies between layers only.
    """

    hidden_dim: int
    num_layers: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        lengths: Optional[jnp.ndarray] = None,
        dropout_rate=None,  # traced scalar overriding self.dropout
    ) -> jnp.ndarray:
        from ..ops.pallas.lstm import lstm_recurrence_grouped, pallas_available

        h = x
        for layer in range(self.num_layers):
            fwd_cell = LSTMCellFused(self.hidden_dim, name=f"fwd_{layer}")
            bwd_cell = LSTMCellFused(self.hidden_dim, name=f"bwd_{layer}")
            if lengths is None:
                bwd_in = jnp.flip(h, axis=1)
                unflip = lambda y: jnp.flip(y, axis=1)
            else:
                # Reverse only the valid prefix of each sequence.
                t = h.shape[1]
                idx = lengths[:, None] - 1 - jnp.arange(t)[None, :]
                idx = jnp.clip(idx, 0, t - 1)
                bwd_in = jnp.take_along_axis(h, idx[..., None], axis=1)
                unflip = lambda y: jnp.take_along_axis(y, idx[..., None], axis=1)

            if pallas_available():
                # Both directions advance through ONE kernel: the sequential
                # step count halves and the per-step recurrent matmul doubles
                # in size (better MXU shape). Unlike the standalone cell, the
                # kernel is safe here even with `lengths`: the unfrozen state
                # past a sequence's end only affects outputs at past-length
                # positions, which nothing downstream reads (attention masks
                # them; the backward gather stays in the valid prefix; padding
                # is trailing so later layers' valid frames never see it).
                g_f, wh_f = fwd_cell.gates_and_weights(h)
                g_b, wh_b = bwd_cell.gates_and_weights(bwd_in)
                gates = jnp.stack([g_f, g_b], axis=1)  # (T, 2, B, 4H)
                wh = jnp.stack([wh_f, wh_b], axis=0)  # (2, H, 4H)
                hs = lstm_recurrence_grouped(gates, wh)  # (T, 2, B, H)
                fwd = jnp.swapaxes(hs[:, 0], 0, 1)
                bwd = unflip(jnp.swapaxes(hs[:, 1], 0, 1))
            else:
                fwd = fwd_cell(h, lengths)
                bwd = unflip(bwd_cell(bwd_in, lengths))
            h = jnp.concatenate([fwd, bwd], axis=-1)
            if layer < self.num_layers - 1:
                if dropout_rate is not None:
                    h = RateDropout(name=f"drop_{layer}")(
                        h, dropout_rate, deterministic=not train
                    )
                elif self.dropout > 0:
                    h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h


class AttentionPooling(nn.Module):
    """Learned softmax pooling over time (src/models.py:78-107).

    With ``lengths`` given, padded steps are masked to -inf before softmax;
    with ``lengths=None`` the reference's unmasked behavior is reproduced.
    """

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        scores = nn.Dense(1, name="score")(x)  # (B, T, 1)
        if lengths is not None:
            t = x.shape[1]
            mask = jnp.arange(t)[None, :, None] < lengths[:, None, None]
            scores = jnp.where(mask, scores, -jnp.inf)
        probs = nn.softmax(scores, axis=1)
        return jnp.sum(x * probs, axis=1)  # (B, 2H)


class CNNLSTM(nn.Module):
    """Residual CNN front end + biLSTM + attention pooling classifier.

    Hyperparameter surface matches the reference search space
    (src/dl_cv_strategies.py:216-222): cnn_out_channels ∈ {32,64,128},
    lstm_hidden_dim ∈ {64,128}, dropout_rate, activation_fn ∈ {silu,gelu}.
    """

    input_dim: int = 768
    num_classes: int = 2
    cnn_out_channels: int = 128
    lstm_hidden_dim: int = 128
    lstm_layers: int = 2
    dropout_rate: float = 0.5
    activation_fn: str = "silu"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        lengths: Optional[jnp.ndarray] = None,
        dropout_rate=None,  # traced scalar overriding self.dropout_rate
    ) -> jnp.ndarray:
        # (B, T, input_dim) feature-last throughout; no layout permutes needed.
        def mask_pad(h, lens):
            # Zero padded frames so SAME-padded convs can't read garbage and
            # block outputs at padded positions can't leak into valid frames
            # through the next conv. With ``lengths`` this makes logits
            # invariant to padding CONTENT; invariance to padding AMOUNT
            # holds for the attention/LSTM path but NOT for BatchNorm in
            # train mode, whose batch statistics count padded frames (the
            # reference's torch BN1d does the same over its own padding).
            if lens is None:
                return h
            m = jnp.arange(h.shape[1])[None, :, None] < lens[:, None, None]
            return jnp.where(m, h, 0.0)

        h = mask_pad(x, lengths)
        h = ResidualBlock(
            self.cnn_out_channels,
            dropout=0.2,
            activation_fn=self.activation_fn,
            name="res_block1",
        )(h, train)
        h = mask_pad(h, lengths)
        # Non-overlapping max-pool halves T (reference max_pool1d(2),
        # src/models.py:177).
        h = nn.max_pool(h, window_shape=(2,), strides=(2,))
        if lengths is not None:
            # clamp to >=1: a 0/1-frame sequence would otherwise mask EVERY
            # attention score to -inf and NaN the whole batch through softmax
            lengths = jnp.maximum(lengths // 2, 1)
        h = mask_pad(h, lengths)
        h = ResidualBlock(
            self.cnn_out_channels,
            dropout=0.2,
            activation_fn=self.activation_fn,
            name="res_block2",
        )(h, train)
        h = mask_pad(h, lengths)
        h = BiLSTM(
            self.lstm_hidden_dim,
            num_layers=self.lstm_layers,
            dropout=self.dropout_rate if self.lstm_layers > 1 else 0.0,
            name="lstm",
        )(h, train=train, lengths=lengths, dropout_rate=dropout_rate)
        pooled = AttentionPooling(name="attention_pooling")(h, lengths)
        if dropout_rate is not None:
            pooled = RateDropout(name="dropout_rt")(
                pooled, dropout_rate, deterministic=not train
            )
        else:
            pooled = nn.Dropout(self.dropout_rate, deterministic=not train)(pooled)
        return nn.Dense(self.num_classes, name="fc")(pooled)

    def first_conv_kernel(self, params) -> jnp.ndarray:
        """res_block1/conv1 kernel, for the reference's feature-stability
        probe (mean |weight| over output channels per input dim:
        src/dl_cv_strategies.py:336-337). Shape (k, input_dim, out_channels).
        """
        return params["params"]["res_block1"]["conv1"]["kernel"]


def stability_probe(variables) -> jnp.ndarray:
    """Per-input-dim importance = mean |res_block1.conv1 kernel| over taps
    and output channels → (input_dim,) vector, matching the reference's
    768-dim fold-stability vectors (src/dl_cv_strategies.py:336-337)."""
    k = variables["params"]["res_block1"]["conv1"]["kernel"]  # (taps, in, out)
    return jnp.mean(jnp.abs(k), axis=(0, 2))
