"""Device-side frame gathering shared by every corpus-batched DSP op.

A batched short-term analysis gathers (N_frames, win_len) windows out of the
concatenated corpus waveform. Every gathered op routes through
:func:`gather_frames`, which picks the fastest lowering per backend: on TPU
a coarse row gather + shift-select (:func:`_gather_frames_shifted`, ~10×
the throughput of XLA's elementwise gather lowering), elsewhere a vmapped
``lax.dynamic_slice``. This module also owns the shared
:class:`CorpusBuffer` (one waveform upload per corpus) and the
:class:`Deferred`/:func:`collect` machinery for overlapped result fetches.
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
    """(N,) start indices -> (N, win_len) frames gathered on device.

    On TPU the vmapped dynamic-slice lowers to an elementwise gather
    (~75 ms for 20M elements, measured -- the single most expensive op in
    every framed analysis), so the TPU path coarsens the gather to
    32-sample rows and realizes the residual offset with static shifted
    slices + one-hot contractions (:func:`_gather_frames_shifted`, ~10x
    faster, bit-identical). Other backends keep the dynamic-slice vmap.
    (A per-frame Pallas DMA-gather kernel was tried first and measured 9x
    SLOWER than the XLA gather: Mosaic constrains HBM DMA slices to
    1024-aligned offsets, so each row needed an aligned superset DMA plus
    sublane/lane rolls, and thousands of small DMAs serialized.)
    """
    if jax.default_backend() == "tpu":
        return _gather_frames_shifted(x_cat, starts, win_len)
    return _gather_frames_xla(x_cat, starts, win_len)


def _gather_frames_xla(x_cat: jnp.ndarray, starts: jnp.ndarray, win_len: int):
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(x_cat, (s,), (win_len,))
    )(starts)


def _gather_frames_shifted(
    x_cat: jnp.ndarray, starts: jnp.ndarray, win_len: int
):
    """Window gather as 32-sample-row gather + two-stage shift select.

    frame[k] = x[s + k] decomposes as: gather the ceil(win/32)+1 rows of
    the (-1, 32)-reshaped waveform covering [s, s+win) (32x fewer gather
    indices, each a contiguous row the TPU vectorizes), then shift each
    frame's flattened rows by s mod 32 -- first by 8*((s%32)//8) choosing
    among 4 statically shifted slices, then by s mod 8 among 8 -- with
    one-hot einsum contractions (dense VPU/MXU work, no gathers).
    Bit-identical to :func:`_gather_frames_xla`.
    """
    wb = win_len // 32 + 2
    total32 = -(-(x_cat.shape[0] + wb * 32 + 32) // 32) * 32
    x32 = jnp.pad(x_cat, (0, total32 - x_cat.shape[0])).reshape(-1, 32)
    return rows32_gather(x32, starts, win_len)


def rows32_gather(x32: jnp.ndarray, starts: jnp.ndarray, win_len: int):
    """Core of :func:`_gather_frames_shifted` for callers that hold the
    (-1, 32)-reshaped waveform already (e.g. loop bodies that must not
    re-pad per iteration). ``x32`` must extend ≥ win_len//32 + 2 rows past
    the largest start."""
    n = starts.shape[0]
    wb = win_len // 32 + 2
    a = starts // 32
    c = starts % 32
    rows = a[:, None] + jnp.arange(wb)[None, :]
    flat = x32[rows].reshape(n, wb * 32)
    w1 = win_len + 8
    outs1 = jnp.stack([flat[:, 8 * k : 8 * k + w1] for k in range(4)], 0)
    oh1 = ((c // 8)[:, None] == jnp.arange(4)[None, :]).astype(flat.dtype)
    flat2 = jnp.einsum("kNw,Nk->Nw", outs1, oh1)
    outs2 = jnp.stack([flat2[:, k : k + win_len] for k in range(8)], 0)
    oh2 = ((c % 8)[:, None] == jnp.arange(8)[None, :]).astype(flat.dtype)
    return jnp.einsum("kNw,Nk->Nw", outs2, oh2)


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
    # 16-bit-PCM-derived corpora (WAV decode divides by 32768, so every
    # sample is n/32768 exactly) upload as int16 — half the bytes on the
    # ~50 MB/s tunnel — and dequantize on device; scaling by 2^-15 is
    # exact in f32, so x_cat is bit-identical to the f32 upload. Anything
    # else (synthetic floats, resampled audio) takes the f32 path.
    q = cat * 32768.0
    qi = np.round(q)
    if cat.size and abs(float(qi.max(initial=0.0))) <= 32767 \
            and abs(float(qi.min(initial=0.0))) <= 32768 \
            and bool((q == qi).all()):
        x_cat = _dequant_i16(jnp.asarray(qi.astype(np.int16)))
    else:
        x_cat = jnp.asarray(cat)
    return CorpusBuffer(xs, offsets, pad, x_cat)


@jax.jit
def _dequant_i16(i16):
    return i16.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)


def upload_pcm_f32(a: np.ndarray, sharding=None) -> jnp.ndarray:
    """Upload a float32 array over the tunnel at half the bytes when it is
    losslessly int16-quantized (16-bit-PCM-derived audio: every sample is
    n/32768 exactly), dequantizing on device. Falls back to a plain f32
    upload otherwise. Bit-identical either way (2^-15 scaling is exact in
    f32). Same trick as :func:`corpus_buffer`, for stacked batch shapes.

    ``sharding`` places the upload (e.g. batch-axis over a mesh's dp axis
    so each chip receives only its shard); the int16 path uploads the
    quantized buffer with that sharding and dequantizes shard-local."""
    import jax

    put = (lambda v: jax.device_put(v, sharding)) if sharding is not None \
        else jnp.asarray
    a = np.ascontiguousarray(a, np.float32)
    q = a * 32768.0
    qi = np.round(q)
    if a.size and abs(float(qi.max(initial=0.0))) <= 32767 \
            and abs(float(qi.min(initial=0.0))) <= 32768 \
            and bool((q == qi).all()):
        return _dequant_i16(put(qi.astype(np.int16)))
    return put(a)


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
