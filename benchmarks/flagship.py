"""Shared flagship-model forward program for the driver bench + suite.

The driver's ``bench.py`` measures CNN-LSTM inference throughput under a
hard deadline in a fresh process; round 4 showed a merely-slow device
window blowing that deadline because the measurement subprocess re-traced
and re-compiled the batch-128 forward from scratch (VERDICT r4 item 6).
Both ``bench.py`` and ``benchmarks.suite.bench_cnn_lstm`` now build the
program through this module, so:

* the traced program is persisted via ``jax.export``
  (robust_speech_analysis_framework_tpu.train.aot_cache) — a fresh process
  deserializes in milliseconds instead of re-tracing the LSTM scan pyramid;
* both callers produce byte-identical HLO, so one persistent-XLA-cache
  entry serves suite runs and driver runs alike (a suite run pre-seeds the
  driver bench).

Workload constants mirror BASELINE.json config 4: batch of corpus-shaped
(4378, 768) Wav2Vec2 sequences (the '01_CF56_1.wav' example, SURVEY §6.4)
through the flagship architecture (cnn=128, lstm=128), padded to 4480
frames for clean tiling.
"""

from __future__ import annotations

import numpy as np

FRAMES_PER_SECOND = 49.9
SEQ_LEN = 4378
PAD_LEN = 4480  # padded to a multiple of 128 frames for clean tiling
DIM = 768


def build_forward(batch: int):
    """(forward_fn, variables, lengths) for the flagship inference program.

    ``forward_fn(variables, x, lengths)`` is jitted and, when the package's
    disk export cache is available, backed by a ``jax.export`` artifact so
    fresh processes skip Python tracing. Any cache failure falls back to
    plain ``jax.jit`` — never a correctness dependency.
    """
    import jax
    import jax.numpy as jnp

    from robust_speech_analysis_framework_tpu.models import CNNLSTM

    model = CNNLSTM(input_dim=DIM, cnn_out_channels=128, lstm_hidden_dim=128)
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 256, DIM)), train=False)
    )(jax.random.PRNGKey(0))
    lengths = jnp.full((batch,), SEQ_LEN, jnp.int32)

    def raw(v, x, l):
        return model.apply(v, x, train=False, lengths=l)

    build = lambda: jax.jit(raw)  # noqa: E731
    try:
        from robust_speech_analysis_framework_tpu.train.aot_cache import (
            load_or_export, program_cache_key,
        )

        example = jax.ShapeDtypeStruct((batch, PAD_LEN, DIM), jnp.float32)
        args = (variables, example, lengths)
        key = program_cache_key(
            "flagship_cnnlstm", (batch, PAD_LEN, DIM), args,
            sources=("models/cnn_lstm.py", "ops/pallas/lstm.py"),
        )
        fn = load_or_export(build, key, args, tag="flagship")
    except Exception:
        fn = build()
    return fn, variables, lengths


def export_artifact(batch: int = 128) -> None:
    """Pre-trace/export the flagship program (and warm the XLA compile
    cache) so a later fresh-process bench run pays neither cost. Called by
    ``python bench.py --export`` and at the end of a suite run."""
    import jax.numpy as jnp

    fn, variables, lengths = build_forward(batch)
    x = jnp.zeros((batch, PAD_LEN, DIM), jnp.float32)
    np.asarray(fn(variables, x, lengths))  # compile + execute once
