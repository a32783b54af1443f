"""Device-side frame gathering shared by every corpus-batched DSP op.

A batched short-term analysis gathers (N_frames, win_len) windows out of the
concatenated corpus waveform. Two XLA lowerings exist:

* ``x_cat[starts[:, None] + arange(win_len)]`` — an elementwise gather of
  N·win_len individual samples, which the TPU gather unit executes one
  element at a time (~4× slower, measured on v5e-class hardware);
* a vmapped ``lax.dynamic_slice`` — N *contiguous* slice copies, the form
  the TPU memory system is built for.

Every gathered op routes through :func:`gather_frames` so the fast form is
used everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_frames(x_cat: jnp.ndarray, starts: jnp.ndarray, win_len: int):
    """(N,) start indices → (N, win_len) frames via contiguous slice copies."""
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(x_cat, (s,), (win_len,))
    )(starts)
