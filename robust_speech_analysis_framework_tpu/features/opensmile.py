"""openSMILE-equivalent 912-feature summary extractor (Androids config).

Reimplements the full ``Androids.conf`` DAG (reference usage:
src/opensmile_extractor.py:62-75, config /root/reference/Androids.conf)
without the external SMILExtract binary:

framing 25 ms/10 ms → per-frame preemphasis k=0.97 → Hamming → |FFT| →
{HTK mel 26 → MFCC 1-12 · RMS energy · ZCR (pre-window frames) · intensity +
loudness · SHS pitch + Viterbi → F0final/voicingFinalUnclipped (energy-gated)
· waveform jitter/shimmer/logHNR · 16 spectral LLDs} → moving-average
smoothing (``_sma``) → delta regression (``_de``) → 12 functionals per
contour (Extremes/Regression/Moments as enabled in the conf).

Feature count: 38 LLDs × 2 (sma + de) × 12 functionals = 912 columns. The
reference's saved CSV shows 911 (nb02 cell 2 output) — exactly one short.
Most probable cause: the reference drops the CSV's first column assuming it
is the ``-instname`` instance-name column (src/opensmile_extractor.py:83),
but with ``timestamp=0``/``number=0`` cCsvSink may emit no such column, in
which case that code discards the FIRST FEATURE (the first functional of the
first LLD). This module emits the full 912; a real SMILExtract header diff
(binary/corpus not available here) would settle it — column names follow
openSMILE conventions to make that diff mechanical.

Throughput design: all frame-parallel stages run as one jitted program per
padded frame-count bucket; whole batches of files are processed at one
shape. Only the period-marching jitter LLD is host-side sequential.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..audio.frontend import (
    FrontendConfig,
    frame_signal,
    hamming_window,
    mel_filterbank,
    mfcc_from_power,
    preemphasize,
    stft_magnitude,
)
from ..ops.functionals import FUNCTIONAL_NAMES
from ..ops.jitter import jitter_shimmer_llds
from ..ops.lld_spectral import (
    SPECTRAL_NAMES,
    intensity_loudness,
    rms_energy,
    spectral_llds,
    zero_crossing_rate,
)
from ..ops.shs_pitch import ShsParams, shs_pitch

LLD_NAMES: List[str] = (
    ["pcm_RMSenergy"]
    + [f"mfcc[{i}]" for i in range(1, 13)]
    + ["pcm_zcr", "F0final", "voicingFinalUnclipped"]
    + ["pcm_intensity", "pcm_loudness",
       "jitterLocal", "jitterDDP", "shimmerLocal", "logHNR"]
    + SPECTRAL_NAMES
)  # 16 + 6 + 16 = 38


# contour-smoother levels lld / lld2 / lld3 (Androids.conf:284-314) as
# slices of LLD_NAMES; cFunctionals reads lld;lld_de;lld2;lld_de2;lld3;
# lld_de3 (:350), so emission interleaves each group's sma and de blocks
_GROUP_SLICES = ((0, 16), (16, 22), (22, 38))


def _emission_order() -> List[Tuple[int, int, str]]:
    """(start, stop, suffix) blocks in the conf's cFunctionals reader order."""
    return [
        (a, b, suffix)
        for a, b in _GROUP_SLICES
        for suffix in ("_sma", "_sma_de")
    ]


def _functional_vec(f_sma: np.ndarray, f_de: np.ndarray) -> np.ndarray:
    """(12, 38) sma/de functional matrices → flat 912 vector in the conf's
    emission order (matches :func:`feature_columns`)."""
    sma_t, de_t = np.asarray(f_sma).T, np.asarray(f_de).T  # (38, 12)
    parts = []
    for a, b, suffix in _emission_order():
        src = sma_t if suffix == "_sma" else de_t
        parts.append(src[a:b].reshape(-1))
    return np.concatenate(parts)


def feature_columns(reference_compat: bool = False) -> List[str]:
    """Output column names in openSMILE emission order: per smoother group,
    the group's sma functionals then its delta functionals (cFunctionals
    reader ``lld;lld_de;lld2;lld_de2;lld3;lld_de3``, Androids.conf:350);
    within a block, per LLD, the 12 functionals.

    ``reference_compat=True`` reproduces the reference's observed 911-column
    schema: its loader drops the CSV's first column assuming it is the
    ``-instname`` column (src/opensmile_extractor.py:78-86), but with
    ``timestamp=0``/``number=0`` cCsvSink emits no such column, so the FIRST
    FEATURE is what actually gets discarded — downstream dataset shapes
    (111×911 / 109×1822 / 109×2733, nb02 cell 2) depend on it. Default is the
    complete 912-column native schema."""
    cols = []
    for a, b, suffix in _emission_order():
        for lld in LLD_NAMES[a:b]:
            for fn in FUNCTIONAL_NAMES:
                cols.append(f"{lld}{suffix}_{fn}")
    return cols[1:] if reference_compat else cols


@dataclass(frozen=True)
class OpenSmileConfig:
    frontend: FrontendConfig = FrontendConfig(
        sample_rate=16000, frame_seconds=0.025, hop_seconds=0.010,
        preemphasis=0.97, n_mels=26, fmin=20.0, fmax=8000.0,
    )
    n_mfcc: int = 12
    shs: ShsParams = ShsParams()
    energy_gate: float = 0.001
    sma_window: int = 3
    deltawin: int = 2
    jitter_search_range: float = 0.25
    # emit the reference's observed 911-column schema (first feature dropped,
    # see feature_columns) instead of the complete 912-column native schema
    reference_compat: bool = False


class OpenSmileExtractor:
    """Reusable extractor; jitted stages compile once per frame-count bucket."""

    def __init__(self, config: OpenSmileConfig = OpenSmileConfig(),
                 pipeline_rows: int = 4):
        self.config = config
        # sub-batch rows per dispatched bucket chain (see extract_batch);
        # <=0 disables splitting (one chain per whole bucket group)
        self.pipeline_rows = pipeline_rows
        cfg = config.frontend
        self._window = hamming_window(cfg.frame_len)
        self._melfb = mel_filterbank(
            cfg.n_mels, cfg.fft_size, cfg.sample_rate, cfg.fmin, cfg.fmax
        )
        # voicing needs an ALIAS-FREE frame autocorrelation up to
        # sr/min_pitch lags: the shared cfg.fft_size STFT only covers
        # fft_size - frame_len lags (112 @ 512/400 -> pitches >= ~143 Hz),
        # so a dedicated wider power spectrum feeds _voicing_from_power
        max_lag = int(cfg.sample_rate / config.shs.min_pitch)
        self._voicing_nfft = 1 << (cfg.frame_len + max_lag).bit_length()
        self._frame_stage = jax.jit(self._frame_stage_impl)
        self._summary_stage = jax.jit(self._summary_stage_impl)
        self._frame_stage_batch = jax.jit(jax.vmap(self._frame_stage_impl))
        self._summary_stage_batch = jax.jit(jax.vmap(self._summary_stage_impl))
        self._assemble_summary = jax.jit(self._assemble_summary_impl)

    # ---- jitted stages ----------------------------------------------------

    def _frame_stage_impl(self, x: jnp.ndarray):
        """waveform (T,) → dict of frame-level streams (no jitter/pitch)."""
        cfg = self.config.frontend
        raw = frame_signal(x, cfg.frame_len, cfg.hop)
        pre = preemphasize(raw, cfg.preemphasis)
        win = pre * jnp.asarray(self._window, pre.dtype)
        mag = stft_magnitude(win, None, cfg.fft_size)
        mfcc = mfcc_from_power(
            mag, self._melfb, n_ceps=self.config.n_mfcc, first_cep=1,
            spec_is_power=False,
        )
        energy = rms_energy(win)
        zcr = zero_crossing_rate(raw)
        inten = intensity_loudness(win)
        spect = spectral_llds(mag, float(cfg.sample_rate))
        from ..ops.dft import rfft_power

        vpow = rfft_power(win, self._voicing_nfft)
        return mag, mfcc, energy, zcr, inten, spect, vpow

    def _assemble_summary_impl(
        self, energy, mfcc, zcr, f0, voicing, inten, vq, spect, lengths
    ):
        """Concatenate the device-resident LLD streams in schema order and
        run the masked summary stage — one program, no LLD host round trip.
        Frames ≥ length hold padded-silence values; every summary op masks
        by ``lengths`` so they never contribute."""
        lld = jnp.concatenate(
            [
                energy[..., None], mfcc, zcr[..., None], f0[..., None],
                voicing[..., None], inten, vq, spect,
            ],
            axis=-1,
        ).astype(jnp.float32)
        # No padding normalization is needed before the summary stage:
        # smooth_sma_masked zeroes + count-renormalizes past ``length``,
        # delta_regression_masked clamps its reads to length−1, and
        # apply_functionals_masked masks — rows ≥ length never contribute,
        # whatever the bucket padding left there.
        return jax.vmap(self._summary_stage_impl)(lld, lengths)

    def _summary_stage_impl(self, lld: jnp.ndarray, length: jnp.ndarray):
        from ..ops.functionals import (
            apply_functionals_masked,
            delta_regression_masked,
            smooth_sma_masked,
        )

        sma = smooth_sma_masked(lld, length, self.config.sma_window)
        de = delta_regression_masked(sma, length, self.config.deltawin)
        return (
            apply_functionals_masked(sma, length),
            apply_functionals_masked(de, length),
        )

    # ---- public API -------------------------------------------------------

    def extract_llds(self, x: np.ndarray) -> np.ndarray:
        """(T_samples,) 16 kHz mono → (T_frames, 38) raw LLD matrix."""
        from ..audio.frontend import num_frames
        from ..ops.bucketing import bucket_size

        cfg = self.config.frontend
        x = np.asarray(x, np.float32)
        # Bucket the waveform length so every frame-parallel stage compiles
        # once per bucket (appended zeros = silence; the padded frames are
        # sliced away below).
        n_true = num_frames(len(x), cfg.frame_len, cfg.hop)
        n_pad_samples = bucket_size(len(x), min_bucket=cfg.sample_rate // 2)
        if n_pad_samples != len(x):
            x = np.pad(x, (0, n_pad_samples - len(x)))
        xj = jnp.asarray(x)
        mag, mfcc, energy, zcr, inten, spect, vpow = self._frame_stage(xj)
        # SHS + Viterbi run on the padded frames (zero tail = silence, which
        # the energy gate zeroes anyway) so their jits also see one shape per
        # bucket; everything is sliced to the true frame count afterwards.
        f0, voicing = shs_pitch(
            np.asarray(mag), cfg.sample_rate, np.asarray(energy),
            self.config.shs, self.config.energy_gate,
            win_len=cfg.frame_len, voicing_power=vpow,
        )
        f0, voicing = f0[:n_true], voicing[:n_true]
        energy_np = np.asarray(energy)[:n_true]
        mfcc = np.asarray(mfcc)[:n_true]
        zcr = np.asarray(zcr)[:n_true]
        inten = np.asarray(inten)[:n_true]
        spect = np.asarray(spect)[:n_true]
        vq = jitter_shimmer_llds(
            np.asarray(x, np.float64), cfg.sample_rate, f0,
            hop_s=cfg.hop_seconds, frame_s=cfg.frame_seconds,
            search_range_rel=self.config.jitter_search_range,
        )
        lld = np.concatenate(
            [
                energy_np[:, None],
                mfcc,
                zcr[:, None],
                f0[:, None],
                voicing[:, None],
                inten,
                vq[:n_true] if len(vq) > n_true else vq,
                spect,
            ],
            axis=1,
        )
        return lld

    def extract_single(self, x: np.ndarray) -> np.ndarray:
        """One waveform → the 912-dim summary feature vector."""
        from ..ops.bucketing import pad_frames

        lld = self.extract_llds(x)
        lld_pad, n_true = pad_frames(lld.astype(np.float32))
        f_sma, f_de = self._summary_stage(
            jnp.asarray(lld_pad), jnp.asarray(n_true, jnp.int32)
        )
        # (12, 38) each → conf emission order (see _emission_order)
        return _functional_vec(np.asarray(f_sma), np.asarray(f_de))

    def extract_batch(
        self,
        waveforms: Mapping[str, np.ndarray],
        verbose: bool = True,
        mesh=None,
    ) -> pd.DataFrame:
        """Corpus-batched extraction: files grouped by length bucket, each
        group stacked and pushed through vmapped stages as ONE program per
        bucket shape (the TPU-native replacement for the reference's
        one-subprocess-per-file loop, src/opensmile_extractor.py:54-75).

        Buckets are pipelined: up to ``max_inflight`` bucket chains are
        dispatched ahead of the oldest fetch, so bucket k+1's upload and
        device programs overlap bucket k's functional download — on a
        high-RTT link the per-bucket round trip would otherwise serialize
        a ragged corpus (real corpora spread over many length buckets).
        Groups larger than ``pipeline_rows`` are split into fixed-size
        sub-batches so the same overlap applies within one bucket too: a
        uniform-length corpus would otherwise serialize its whole waveform
        upload ahead of any compute (steady state is up to ~70% upload at
        tunnel bandwidth — r5 measurement; the 814→445→614 au-s/s swings
        across rounds tracked the link window, not code).

        With ``mesh`` every bucket stack is sharded over the mesh's ``dp``
        axis (padded with silent rows to a dp multiple; pad rows never
        reach the output), so each vmapped stage partitions file-parallel
        across chips — the multi-chip scaling axis for corpus extraction
        (SURVEY §2.5: batch-of-files data parallelism replacing the
        reference's serial subprocess loop, src/opensmile_extractor.py:54-75).
        """
        from ..audio.frontend import num_frames
        from ..ops.bucketing import bucket_size
        from ..utils.reliability import retry_transient

        cfg = self.config.frontend
        cols = feature_columns(self.config.reference_compat)

        dp, sharding = 1, None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            dp = int(dict(mesh.shape).get("dp", 1))
            sharding = NamedSharding(mesh, PartitionSpec("dp", None))

        groups: Dict[int, List[Tuple[str, np.ndarray]]] = {}
        for name, x in waveforms.items():
            x = np.asarray(x, np.float32).reshape(-1)
            if num_frames(len(x), cfg.frame_len, cfg.hop) < 1:
                # serial-path semantics: a sub-frame clip is dropped with a
                # logged error (the masked functionals would otherwise emit
                # a row of ±inf max/min for a zero-length contour)
                if verbose:
                    print(
                        f"ERROR: '{name}' shorter than one analysis frame "
                        f"({len(x)} samples); row dropped."
                    )
                continue
            b = bucket_size(len(x), min_bucket=cfg.sample_rate // 2)
            groups.setdefault(b, []).append((name, x))

        def prepare(bucket, items):
            names = [n for n, _ in items]
            if dp > 1 and len(items) % dp:
                # silent pad rows make the batch axis dp-divisible so the
                # stack can shard; one frame of zeros each, rows discarded
                # by _rows_from_functionals (which walks real names only)
                items = items + [
                    ("", np.zeros(cfg.frame_len, np.float32))
                ] * (-len(items) % dp)
            stack = np.zeros((len(items), bucket), np.float32)
            n_frames_true = np.zeros(len(items), np.int64)
            for i, (_, x) in enumerate(items):
                stack[i, : len(x)] = x
                n_frames_true[i] = num_frames(len(x), cfg.frame_len, cfg.hop)
            try:
                devs = self._dispatch_bucket(
                    items, names, stack, n_frames_true, sharding=sharding
                )
            except Exception:
                devs = None  # fall through to the synchronous retry path
            return bucket, items, names, stack, n_frames_true, devs

        rows = []
        max_inflight = 3
        pending: List = []
        # fixed sub-batch rows: a power of two keeps the compiled-shape set
        # to {pipeline_rows, one remainder} per bucket
        pipeline_rows = self.pipeline_rows if self.pipeline_rows > 0 else 1 << 30
        if dp > 1:
            pipeline_rows = max(dp, pipeline_rows)

        def finalize(entry):
            bucket, items, names, stack, n_frames_true, devs = entry
            try:
                if devs is None:
                    raise RuntimeError("bucket dispatch failed")
                f_sma, f_de = (np.asarray(a) for a in jax.device_get(devs))
            except Exception:
                # transient device failure: re-run this bucket synchronously
                f_sma, f_de = retry_transient(
                    lambda: tuple(
                        np.asarray(a) for a in jax.device_get(
                            self._dispatch_bucket(
                                items, names, stack, n_frames_true
                            )
                        )
                    )
                )
            return self._rows_from_functionals(names, f_sma, f_de, cols)

        work: List[Tuple[int, List[Tuple[str, np.ndarray]]]] = []
        for bucket, items in sorted(groups.items()):
            for s in range(0, len(items), pipeline_rows):
                work.append((bucket, items[s : s + pipeline_rows]))
        for bucket, items in work:
            pending.append(prepare(bucket, items))
            if len(pending) > max_inflight:
                entry = pending.pop(0)
                try:
                    rows.extend(finalize(entry))
                except Exception as e:
                    if verbose:
                        print(f"ERROR: batch bucket {entry[0]} failed: {e}")
        for entry in pending:
            try:
                rows.extend(finalize(entry))
            except Exception as e:
                if verbose:
                    print(f"ERROR: batch bucket {entry[0]} failed: {e}")
        if not rows:
            return pd.DataFrame()
        return pd.DataFrame(rows)

    def _dispatch_bucket(self, items, names, stack, n_frames_true,
                         sharding=None):
        """One bucket group through all device stages -> device functionals.

        Device-resident pipeline: framing/MFCC/spectral LLDs, SHS+Viterbi
        pitch, the jitter period march AND the period→LLD prefix-sum
        conversion all chain ON DEVICE with no intermediate host round
        trip, so the whole bucket is one dispatch chain; the caller fetches
        the returned (B, 12, 38)×2 functional blocks when ready.
        Idempotent (safe to retry on transient errors).
        """
        import jax

        from ..ops.jitter import mark_periods_batch, periods_to_llds_batch
        from ..ops.shs_pitch import shs_pitch_batch

        from ..ops.framing import upload_pcm_f32

        cfg = self.config.frontend
        # ONE upload, shared with the march; int16 over the tunnel when the
        # audio is 16-bit-PCM-derived (half the bytes, bit-identical). A
        # batch-axis sharding partitions every downstream vmapped stage
        # file-parallel across the mesh.
        stack_j = upload_pcm_f32(stack, sharding=sharding)
        mag, mfcc, energy, zcr, inten, spect, vpow = self._frame_stage_batch(
            stack_j
        )
        f0_dev, voicing_dev = shs_pitch_batch(
            mag, cfg.sample_rate, energy, self.config.shs,
            self.config.energy_gate, as_device=True,
            win_len=cfg.frame_len, voicing_power=vpow,
        )
        nts = [int(v) for v in n_frames_true]
        try:
            march = mark_periods_batch(
                stack_j, cfg.sample_rate, f0_dev,
                [len(x) for _, x in items], nts,
                hop_s=cfg.hop_seconds,
                search_range_rel=self.config.jitter_search_range,
                defer=True,
            )
            vq_dev = periods_to_llds_batch(
                march.arrays, f0_dev, cfg.sample_rate,
                hop_s=cfg.hop_seconds, frame_s=cfg.frame_seconds,
            )
        except Exception:
            # oracle fallback: host NumPy march + prefix sums
            f0 = np.asarray(f0_dev)
            t_pad = f0.shape[1]
            vq = np.zeros((len(items), t_pad, 4), np.float32)
            for i, (name, x) in enumerate(items):
                nt = nts[i]
                v = jitter_shimmer_llds(
                    x.astype(np.float64), cfg.sample_rate, f0[i, :nt],
                    hop_s=cfg.hop_seconds, frame_s=cfg.frame_seconds,
                    search_range_rel=self.config.jitter_search_range,
                )
                vq[i, :nt] = v[:nt]
            vq_dev = jnp.asarray(vq)

        return self._assemble_summary(
            energy, mfcc, zcr, f0_dev, voicing_dev, inten,
            vq_dev, spect,
            jnp.asarray(np.asarray(nts, np.int32)),
        )

    def _rows_from_functionals(self, names, f_sma, f_de, cols):
        rows = []
        for i, name in enumerate(names):
            vec = _functional_vec(f_sma[i], f_de[i])
            if self.config.reference_compat:
                vec = vec[1:]
            row = dict(zip(cols, vec.tolist()))
            row["filename"] = name
            rows.append(row)
        return rows

    def extract(
        self,
        waveforms: Mapping[str, np.ndarray],
        verbose: bool = True,
        batched: bool = True,
        mesh=None,
    ) -> pd.DataFrame:
        """{filename: waveform} → DataFrame['filename' + 912 features]."""
        if batched:
            return self.extract_batch(waveforms, verbose=verbose, mesh=mesh)
        cols = feature_columns(self.config.reference_compat)
        rows = []
        for name, x in waveforms.items():
            try:
                vec = self.extract_single(x)
                if self.config.reference_compat:
                    vec = vec[1:]
                row = dict(zip(cols, vec.tolist()))
                row["filename"] = name
                rows.append(row)
            except Exception as e:
                if verbose:
                    print(f"ERROR: openSMILE-equivalent failed for '{name}': {e}")
        if not rows:
            return pd.DataFrame()
        return pd.DataFrame(rows)


_EXTRACTOR_CACHE: Dict[OpenSmileConfig, "OpenSmileExtractor"] = {}


def _cached_extractor(config: OpenSmileConfig) -> "OpenSmileExtractor":
    """One extractor per config: the jitted stages are instance-bound, so a
    fresh instance per call would recompile every bucket shape (the reading
    and interview passes of one run share all compiled programs this way)."""
    if config not in _EXTRACTOR_CACHE:
        _EXTRACTOR_CACHE[config] = OpenSmileExtractor(config)
    return _EXTRACTOR_CACHE[config]


def extract_opensmile_features(
    input_df: pd.DataFrame,
    config: OpenSmileConfig = OpenSmileConfig(),
    audio_file_column: str = "filepath",
    verbose: bool = True,
    waveforms: Optional[Mapping[str, np.ndarray]] = None,
    extractor: Optional["OpenSmileExtractor"] = None,
    mesh=None,
) -> pd.DataFrame:
    """DataFrame front door with the reference extractor's API shape
    (src/opensmile_extractor.py:9-103): one row per file, 'filename' +
    feature columns; files that fail are dropped with a logged error.
    ``mesh`` shards every bucket batch over the mesh's dp axis."""
    from ..audio.io import load_mono_16k

    if input_df.empty:
        return pd.DataFrame(
            columns=["filename"] + feature_columns(config.reference_compat)
        )

    ex = extractor if extractor is not None else _cached_extractor(config)
    wavs: Dict[str, np.ndarray] = {}
    for path in input_df[audio_file_column]:
        name = os.path.basename(path)
        if name in wavs:
            # two rows sharing a basename would silently collapse to one
            # output row (the reference emits one row per input row, keyed
            # by instname=basename) — surface it instead of losing a file
            if verbose:
                print(
                    f"ERROR: duplicate basename '{name}' "
                    f"(from '{path}'); row dropped — filenames must be "
                    "unique (reference keys rows by basename)."
                )
            continue
        if waveforms is not None and name in waveforms:
            wavs[name] = np.asarray(waveforms[name])
            continue
        try:
            wavs[name] = load_mono_16k(path)
        except Exception as e:
            if verbose:
                print(f"ERROR: could not read '{name}': {e}")
    return ex.extract(wavs, verbose=verbose, mesh=mesh)
