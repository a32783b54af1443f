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

from typing import Any, Callable, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Deferred:
    """A dispatched-but-unfetched batched analysis.

    The tunnel to the chip has a high fixed round-trip cost (~100 ms
    observed), so synchronously downloading each stage's result serializes
    the pipeline on latency. Ops that accept ``defer=True`` return one of
    these instead: ``arrays`` holds the still-on-device outputs (dispatch is
    async, so the program is already queued) and ``finalize`` turns their
    host copies into the op's normal return value. :func:`collect` fetches
    a whole level of independent stages with overlapped transfers — one
    round-trip cost for N stages instead of N.
    """

    __slots__ = ("arrays", "finalize")

    def __init__(self, arrays: Any, finalize: "Callable[[Any], Any]"):
        self.arrays = arrays
        self.finalize = finalize

    def result(self):
        return self.finalize(jax.device_get(self.arrays))

    @staticmethod
    def ready(value) -> "Deferred":
        """A Deferred wrapping an already-final value (empty-input paths)."""
        return Deferred((), lambda _: value)


def collect(deferreds: "List[Deferred]") -> "List[Any]":
    """Fetch every Deferred's device arrays in one overlapped transfer, then
    run each finalizer. jax.device_get starts all copies before blocking on
    any, so total latency ≈ the largest transfer, not the sum."""
    host = jax.device_get([d.arrays for d in deferreds])
    return [d.finalize(h) for d, h in zip(deferreds, host)]


def gather_frames(x_cat: jnp.ndarray, starts: jnp.ndarray, win_len: int):
    """(N,) start indices → (N, win_len) frames gathered on device.

    On TPU this runs as a Pallas DMA kernel: XLA lowers the vmapped
    dynamic-slice to an elementwise gather (~1.4 GB/s effective through
    HBM, measured), while one contiguous win_len-sample DMA per frame
    approaches memory bandwidth. Other backends keep the dynamic-slice
    vmap.
    """
    if jax.default_backend() == "tpu":
        return _gather_frames_pallas(x_cat, starts, win_len)
    return _gather_frames_xla(x_cat, starts, win_len)


def _gather_frames_xla(x_cat: jnp.ndarray, starts: jnp.ndarray, win_len: int):
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(x_cat, (s,), (win_len,))
    )(starts)


_GATHER_BF = 16  # frames per grid step (one DMA in flight per row)


def _gather_kernel(starts_ref, x_ref, out_ref, sems):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    w = out_ref.shape[1]

    def dma(j):
        s = starts_ref[i * _GATHER_BF + j]
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(s, w)], out_ref.at[j], sems.at[j]
        )

    for j in range(_GATHER_BF):  # start all row DMAs, then drain
        dma(j).start()
    for j in range(_GATHER_BF):
        dma(j).wait()


def _gather_frames_pallas(
    x_cat: jnp.ndarray, starts: jnp.ndarray, win_len: int,
    interpret: bool = False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = starts.shape[0]
    w_pad = -(-win_len // 128) * 128  # lane-aligned rows
    n_pad = -(-n // _GATHER_BF) * _GATHER_BF
    # every DMA must stay inside the buffer: tail room + clipped starts
    x_ext = jnp.pad(x_cat, (0, w_pad))
    starts_p = jnp.clip(
        jnp.pad(starts, (0, n_pad - n)), 0, x_cat.shape[0]
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // _GATHER_BF,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # x stays in HBM
        out_specs=pl.BlockSpec(
            (_GATHER_BF, w_pad), lambda i, starts: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_GATHER_BF,))],
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, w_pad), x_cat.dtype),
        interpret=interpret,
    )(starts_p, x_ext)
    return out[:n, :win_len]


class CorpusBuffer(NamedTuple):
    """The corpus waveform concatenation, uploaded to the device ONCE and
    shared by every batched analysis stage.

    Each file is zero-padded by ``pad`` samples inside the concatenation so
    any op whose analysis window extends at most ``pad`` samples past a
    file's end (window + max lag) can gather frames without bleeding into
    the next file. Host↔device bandwidth through the per-chip tunnel is the
    scarce resource (~50 MB/s measured); a 10-stage pipeline re-uploading
    the waveforms would spend seconds on uploads alone.
    """

    xs: "List[np.ndarray]"  # original host waveforms (float64)
    offsets: np.ndarray  # (n_files,) start of each file in x_cat
    pad: int
    x_cat: jnp.ndarray  # device-resident concatenation (float32)


def corpus_buffer(xs, pad: int = 4096, align: int = 8) -> CorpusBuffer:
    """Build and upload the shared corpus concatenation.

    ``align`` rounds each file's padded extent up to a multiple, so file
    offsets stay on rational-resampling phase boundaries (offset divisible
    by the down-factor ⇒ a whole-buffer polyphase resample equals per-file
    resampling; see :func:`resample_buffer`)."""
    xs = [np.asarray(x, dtype=np.float64).reshape(-1) for x in xs]
    offsets = np.zeros(len(xs), np.int64)
    pieces = []
    offset = 0
    for i, x in enumerate(xs):
        offsets[i] = offset
        extra = (-(len(x) + pad)) % align
        pieces.append(np.pad(x, (0, pad + extra)).astype(np.float32))
        offset += len(x) + pad + extra
    cat = (
        np.concatenate(pieces) if pieces else np.zeros(0, np.float32)
    )
    return CorpusBuffer(xs, offsets, pad, jnp.asarray(cat))


class _LengthOnly(np.ndarray):
    """Zero-filled stand-in carrying only a length (device-resident corpora
    whose host copies were never materialized)."""


def _length_view(n: int) -> np.ndarray:
    return np.zeros(max(int(n), 0), np.float64).view(_LengthOnly)


def resample_buffer(
    buf: CorpusBuffer, up: int, down: int, preemphasis: float = 0.0
) -> CorpusBuffer:
    """Rational-resample an entire corpus buffer ON DEVICE (one dilated
    conv over the concatenation), with optional preemphasis fused in.

    Requires every file offset divisible by ``down`` (guaranteed by
    ``corpus_buffer(..., align=down·k)``): output sample ``o`` sits at input
    position ``o·down/up``, so file i's resampled region starts at
    ``offsets[i]·up/down`` exactly, and the ≥pad zeros between files make
    each region bit-equal to resampling that file alone. The returned
    buffer's ``xs`` are zero-filled length-only views — host code may use
    their lengths (frame grids) but not their samples.

    Note the preemphasis boundary convention: sample 0 of each file sees a
    zero predecessor (x[0] − k·0 = x[0]), whereas the per-file host path
    (ops.cepstrum.cepstrum_preprocess) uses Praat's x[0]·(1−k); the windows
    taper to ~0 at frame edges so downstream features are unaffected.
    """
    import math as _math

    from ..audio.resample import resample_poly

    g = _math.gcd(up, down)
    up, down = up // g, down // g
    for off in buf.offsets:
        if off % down:
            raise ValueError("buffer offsets not aligned to resample ratio")
    y = resample_poly(buf.x_cat, up, down)
    if preemphasis > 0.0:
        y = y - preemphasis * jnp.concatenate([jnp.zeros(1, y.dtype), y[:-1]])
    new_offsets = (buf.offsets * up) // down
    new_xs = [_length_view(-(-len(x) * up // down)) for x in buf.xs]
    new_pad = (buf.pad * up) // down - up  # conservative: resample tail blur
    return CorpusBuffer(new_xs, new_offsets, new_pad, y)
