"""Waveform-domain jitter, shimmer and log-HNR (openSMILE ``cPitchJitter``).

Implements the voice-quality LLDs of the Androids configuration
(Androids.conf:231-255): guided by the frame-level F0 contour, exact pitch
periods are located on the raw waveform by maximizing the normalized
cross-correlation of adjacent candidate periods within ±searchRangeRel
(0.25) of the expected length. Per output frame:

* jitterLocal — mean |T_i − T_{i−1}| / mean T over periods in the frame;
* jitterDDP — mean |(T_i−T_{i−1}) − (T_{i−1}−T_{i−2})| / mean T;
* shimmerLocal — mean |A_i − A_{i−1}| / mean A of per-period peak amplitudes;
* logHNR — log of the harmonic/noise energy ratio estimated from the
  waveform correlation ρ of adjacent periods: ln(ρ/(1−ρ)).

Unvoiced frames emit 0 (``onlyVoiced=0`` keeps them in the output stream).
Period marching is sequential through the waveform, but only through the
scalar ``pos`` cursor — so the TPU path (:func:`mark_periods_batch`) runs
it as ONE vmapped ``lax.while_loop`` over every file of a corpus bucket
(fixed-size masked windows stand in for the host version's variable-length
slices), while :func:`mark_periods` remains the NumPy reference/oracle.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


_KSUB = 16  # periods marked per while-loop iteration (see _march_periods_device)
_FUSED_MAX = 1 << 24  # largest padded length whose starts stay exact in f32


class PeriodTrack(NamedTuple):
    starts: np.ndarray  # (P,) sample index of each period start
    lengths: np.ndarray  # (P,) samples
    amplitudes: np.ndarray  # (P,) peak absolute amplitude within the period
    correlations: np.ndarray  # (P,) correlation with the previous period


def mark_periods(
    x: np.ndarray,
    sr: float,
    f0_frames: np.ndarray,
    hop_s: float = 0.010,
    search_range_rel: float = 0.25,
) -> PeriodTrack:
    """March period boundaries through voiced regions.

    For each voiced stretch of the frame-level F0 contour, successive period
    lengths are chosen to maximize the normalized cross-correlation between
    the current period and the next one, searched within
    (1 ± search_range_rel)·T_expected.
    """
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    starts: List[int] = []
    lengths: List[int] = []
    amps: List[float] = []
    corrs: List[float] = []

    n_frames = len(f0_frames)
    hop_samples = max(int(round(hop_s * sr)), 1)
    frame_of = lambda s: s // hop_samples

    pos = 0
    n = len(x)
    while pos < n - 16:
        fi = min(frame_of(pos), n_frames - 1)
        f0 = f0_frames[fi]
        if f0 <= 0:
            pos += max(int(hop_s * sr) // 2, 1)
            continue
        t0 = sr / f0
        lo = max(int(t0 * (1 - search_range_rel)), 8)
        hi = int(t0 * (1 + search_range_rel)) + 1
        if pos + hi * 2 >= n:
            break
        # One vectorized normalized cross-correlation over the whole lag
        # band: template = one expected period, searched against the next.
        w0 = int(round(t0))
        a = x[pos : pos + w0]
        seg = x[pos + lo : pos + hi + w0]
        corr = np.correlate(seg, a, mode="valid")  # corr[j] ↔ lag lo+j
        sq = np.concatenate([[0.0], np.cumsum(seg * seg)])
        e_b = sq[w0:] - sq[: len(sq) - w0]
        e_b = e_b[: len(corr)]
        e_a = float(np.dot(a, a))
        denom = np.sqrt(np.maximum(e_a * e_b, 1e-30))
        ncc = np.where(denom > 0, corr / denom, -2.0)
        j = int(np.argmax(ncc))
        best_corr = float(ncc[j])
        best_len = lo + j
        starts.append(pos)
        lengths.append(best_len)
        amps.append(float(np.max(np.abs(x[pos : pos + best_len]))))
        corrs.append(best_corr)
        pos += best_len

    return PeriodTrack(
        np.asarray(starts, dtype=np.int64),
        np.asarray(lengths, dtype=np.int64),
        np.asarray(amps),
        np.asarray(corrs),
    )


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8))
def _march_periods_device(
    stack,  # (B, N) f32 waveforms, zero-padded
    f0_pad,  # (B, T) f32 frame-level F0, 0 = unvoiced
    ns,  # (B,) per-file true sample counts
    n_frames,  # (B,) per-file true frame counts
    sr: float,
    hop_samples: int,
    srr: float,
    f0_min: float,
    p_max: int,
):
    """One vmapped ``lax.while_loop`` marching pitch periods through every
    file of a bucket simultaneously (cf. host :func:`mark_periods`).

    Sequentiality is only through each file's ``pos`` cursor, so the batch
    runs in lockstep until every lane finishes. Variable-length host slices
    become fixed-size gathered windows with masks; the lag search runs as
    GEMM-native DFT correlations with an exact direct-dot re-derivation of
    the winner. Emits padded (starts, lengths, amps, corrs, count) per file.

    Each while iteration marks ``_KSUB`` consecutive periods (an unrolled
    chain of substeps, each guarded by its own activity mask): the
    per-iteration lockstep dispatch overhead (~100 µs measured on the
    tunneled chip) dwarfs the substep's conv cost, so speculative
    multi-period stepping divides the iteration count — and therefore the
    march wall time — by ``_KSUB`` while computing the EXACT same period
    sequence as one-period-per-iteration marching.
    """
    from .dft import cross_corr
    from .framing import rows32_gather

    B, N = stack.shape
    t0_max = sr / f0_min
    W0 = int(round(t0_max)) + 1  # max template length
    HI = int(t0_max * (1 + srr)) + 2  # max period search upper bound
    GW = HI + W0 + 8  # gathered window covers template + search band
    # linear (non-circular) correlation needs n_fft > (W0-1) + (n_lags-1)
    NFFT = 1 << (GW - 1).bit_length()
    # pad to 32-row granularity for the coarse row gather (see substep):
    # rows32_gather needs >= GW//32 + 2 rows past the largest start
    wb32 = (GW // 32 + 3) * 32
    total = -(-(N + GW + wb32) // 32) * 32
    # starts/lengths ride the fused f32 row write only while exact there;
    # longer waveforms (> 2^24 samples ≈ 17.5 min at 16 kHz) fall back to
    # a split int32 + f32 pair of scatters (static branch — N is a shape)
    fused = total < _FUSED_MAX
    xpad = jnp.pad(stack, ((0, 0), (0, total - N)))
    ns_a = ns.astype(jnp.int32)
    nf_a = n_frames.astype(jnp.int32)

    def one_file(x, f0, n, nf):
        x32 = x.reshape(-1, 32)
        # Next-voiced-frame table for the unvoiced skip collapse: the host
        # oracle crawls pauses ``skip`` samples per iteration, which costs a
        # sequential substep per 5 ms of silence — over a third of all march
        # substeps on real speech. NV[f] = first clamped-voiced frame ≥ f
        # (host clamps frame lookups to nf-1, so padding frames inherit the
        # last true frame's voicing); one jump lands exactly where the
        # host's repeated skipping would, emitting nothing either way.
        T = f0.shape[0]
        fidx = jnp.arange(T, dtype=jnp.int32)
        vmask = f0[jnp.minimum(fidx, nf - 1)] > 0
        nv = jax.lax.cummin(
            jnp.where(vmask, fidx, jnp.int32(T)), reverse=True
        )

        def active(pos, k, broken):
            return (pos < n - 16) & (~broken) & (k < p_max)

        def cond(state):
            pos, k, broken, _ = state
            return active(pos, k, broken)

        def substep(state):
            pos, k, broken, buf = state
            fi = jnp.minimum(pos // hop_samples, nf - 1)
            f0v = f0[fi]
            voiced = f0v > 0
            t0 = sr / jnp.maximum(f0v, f0_min)
            lo = jnp.maximum((t0 * (1 - srr)).astype(jnp.int32), 8)
            hi = (t0 * (1 + srr)).astype(jnp.int32) + 1
            w0 = jnp.round(t0).astype(jnp.int32)
            fits = pos + hi * 2 < n

            # coarse 32-sample-row gather + shift select: the vmapped
            # dynamic_slice lowers to an elementwise gather that measured
            # ~40 ms/march on the tunneled chip (the framing-module fix,
            # reused; bit-identical)
            g = rows32_gather(x32, pos[None], GW)[0]
            ar = jnp.arange(GW)
            tmpl_mask = jnp.arange(W0) < w0
            aw = jnp.where(tmpl_mask, g[:W0], 0.0)
            # Both the lag correlation AND the per-lag window energy run as
            # GEMM-native DFT products (MXU): a 400-tap direct convolve
            # measured ~10× slower per substep, and a cumsum-difference
            # energy measured ~60 ms/march — XLA's prefix-sum lowering is
            # the single most expensive op inside this loop. These values
            # only steer the argmax; the winner is re-derived exactly below.
            n_lags = GW - W0 + 1
            corr_full = cross_corr(
                aw, g, NFFT, n_lags, precision=jax.lax.Precision.HIGHEST
            )
            e_full = jnp.maximum(  # DFT rounding can dip just below zero
                cross_corr(
                    tmpl_mask.astype(g.dtype), g * g, NFFT, n_lags,
                    precision=jax.lax.Precision.HIGHEST,
                ),
                0.0,
            )
            nlag = hi - lo + 1
            lag_ids = jnp.arange(GW - W0 + 1)
            e_a = jnp.sum(aw * aw)
            denom = jnp.sqrt(jnp.maximum(e_a * e_full, 1e-30))
            ncc = jnp.where(denom > 0, corr_full / denom, -2.0)
            # Zero-energy windows: the host oracle's direct products are
            # exactly 0 there, so its NCC is 0 — but the spectral corr_full
            # carries transform rounding noise (~1e-7·e_tot) that the
            # 1e-30-floored denominator amplifies into huge spurious scores
            # (observed: noise-determined lags through gated/trimmed silence
            # the pitch tracker labels voiced). Score 0 when either side's
            # energy is negligible relative to the whole gathered window.
            e_tot = jnp.sum(g * g)
            ethr = 1e-6 * e_tot + 1e-30
            ncc = jnp.where((e_full > ethr) & (e_a > ethr), ncc, 0.0)
            valid = (lag_ids >= lo) & (lag_ids < lo + nlag)
            ncc = jnp.where(valid, ncc, -jnp.inf)
            j = jnp.argmax(ncc)
            best_len = j  # lag_ids are absolute lags already
            # re-derive the winner's correlation from direct dots: the
            # DFT/prefix-sum values above are plenty for the argmax, but
            # logHNR = ln(rho/(1-rho)) downstream amplifies their rounding
            # in the rho -> 1 saturation regime. The winner window comes
            # from the same coarse row gather as g (a vmapped dynamic_slice
            # here would put an elementwise gather back in the loop body).
            gj = jnp.where(
                tmpl_mask,
                rows32_gather(x32, (pos + j)[None].astype(jnp.int32), W0)[0],
                0.0,
            )
            corr_j = jnp.sum(aw * gj)
            e_bj = jnp.sum(gj * gj)
            denom_j = jnp.sqrt(jnp.maximum(e_a * e_bj, 1e-30))
            best_corr = jnp.where(denom_j > 0, corr_j / denom_j, -2.0)
            amp = jnp.max(jnp.where(ar < best_len, jnp.abs(g), 0.0))

            live = active(pos, k, broken)
            emit = voiced & fits & live
            # one fused row write per substep (4 separate scatters measured
            # ~8 ms/march); starts/lengths are exact in f32 below 2^24
            if fused:
                row = jnp.stack([
                    pos.astype(jnp.float32), best_len.astype(jnp.float32),
                    amp, best_corr,
                ])
                buf = (buf[0].at[k].set(jnp.where(emit, row, buf[0][k])),)
            else:
                rowi = jnp.stack([pos, best_len])
                rowf = jnp.stack([amp, best_corr])
                buf = (
                    buf[0].at[k].set(jnp.where(emit, rowi, buf[0][k])),
                    buf[1].at[k].set(jnp.where(emit, rowf, buf[1][k])),
                )
            k = k + emit.astype(jnp.int32)
            skip = max(hop_samples // 2, 1)
            # unvoiced: jump straight to the first skip-grid position whose
            # frame is voiced (or past the n-16 exit when none remains) —
            # identical pos sequence at every voiced entry, zero emissions
            # in between, same loop exit condition (see nv above)
            g = nv[fi]
            target = jnp.where(g >= nf, n - 16, g * hop_samples)
            m = jnp.maximum((target - pos + skip - 1) // skip, 1)
            step = jnp.where(emit, best_len, m * skip)
            pos = pos + jnp.where(live, step, 0)
            broken = jnp.where(live, voiced & (~fits), broken)
            return pos, k, broken, buf

        def body(state):
            for _ in range(_KSUB):
                state = substep(state)
            return state

        if fused:
            buf0 = (jnp.zeros((p_max, 4), jnp.float32),)
        else:
            buf0 = (
                jnp.zeros((p_max, 2), jnp.int32),
                jnp.zeros((p_max, 2), jnp.float32),
            )
        pos, k, _, buf = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0), jnp.bool_(False), buf0)
        )
        if fused:
            return (
                buf[0][:, 0].astype(jnp.int32),
                buf[0][:, 1].astype(jnp.int32),
                buf[0][:, 2],
                buf[0][:, 3],
                k,
            )
        return buf[0][:, 0], buf[0][:, 1], buf[1][:, 0], buf[1][:, 1], k

    return jax.vmap(one_file)(xpad, f0_pad, ns_a, nf_a)


def mark_periods_batch(
    stack: np.ndarray,
    sr: float,
    f0_pad: np.ndarray,
    ns,
    n_frames,
    hop_s: float = 0.010,
    search_range_rel: float = 0.25,
    f0_min: float = 40.0,
    defer: bool = False,
):
    """Batched device period marching over a bucket of files.

    ``stack`` (B, N) zero-padded waveforms; ``f0_pad`` (B, T) padded F0
    contours (may be device-resident — chaining on a device F0 skips a
    host round trip); ``ns``/``n_frames`` true per-file sample/frame
    counts. Matches :func:`mark_periods` up to float32-vs-float64
    lag-argmax ties. ``defer=True`` returns an ``ops.framing.Deferred``.
    """
    from .framing import Deferred

    B, N = stack.shape
    hop_samples = max(int(round(hop_s * sr)), 1)
    p_max = max(N // 16, 4)
    dev = _march_periods_device(
        jnp.asarray(stack, jnp.float32),
        jnp.asarray(f0_pad, jnp.float32),
        jnp.asarray(np.asarray(ns, np.int32)),
        jnp.asarray(np.asarray(n_frames, np.int32)),
        float(sr), hop_samples, float(search_range_rel), float(f0_min),
        p_max,
    )

    def _finalize(host):
        starts, lengths, amps, corrs, counts = host
        out = []
        for i in range(B):
            k = int(counts[i])
            out.append(PeriodTrack(
                starts[i, :k].astype(np.int64),
                lengths[i, :k].astype(np.int64),
                amps[i, :k].astype(np.float64),
                corrs[i, :k].astype(np.float64),
            ))
        return out

    d = Deferred(dev, _finalize)
    return d if defer else d.result()


def periods_to_llds(
    periods: PeriodTrack,
    f0_frames: np.ndarray,
    sr: float,
    hop_s: float = 0.010,
    frame_s: float = 0.025,
) -> np.ndarray:
    """Period track → frame-level [jitterLocal, jitterDDP, shimmerLocal,
    logHNR] (T, 4). Vectorized over frames: period centers are sorted, so
    each frame's member periods are a contiguous [i0, i1] range found by
    searchsorted, and every per-range mean comes from prefix sums."""
    n_frames = len(f0_frames)
    out = np.zeros((n_frames, 4))
    if len(periods.starts) < 3:
        return out

    centers = (periods.starts + periods.lengths / 2) / sr
    T = periods.lengths.astype(np.float64) / sr
    A = periods.amplitudes
    dT = np.abs(np.diff(T))
    ddT = np.abs(np.diff(T, n=2))
    dA = np.abs(np.diff(A))
    rho = np.clip(periods.correlations, 0.0, 0.999999)

    half = frame_s / 2
    t_c = np.arange(n_frames) * hop_s + half
    i0 = np.searchsorted(centers, t_c - half, side="left")
    i1 = np.searchsorted(centers, t_c + half, side="right") - 1
    count = i1 - i0 + 1
    ok = (count >= 2) & (np.asarray(f0_frames[:n_frames]) > 0)
    i0c = np.clip(i0, 0, len(T) - 1)
    i1c = np.clip(i1, 0, len(T) - 1)

    def _cum(v):
        return np.concatenate([[0.0], np.cumsum(v)])

    cT, cA, cR = _cum(T), _cum(A), _cum(rho)
    cdT, cddT, cdA = _cum(dT), _cum(ddT), _cum(dA)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_t = (cT[i1c + 1] - cT[i0c]) / count
        mean_a = np.maximum((cA[i1c + 1] - cA[i0c]) / count, 1e-12)
        n_d = i1c - i0c
        has_d = ok & (n_d > 0) & (mean_t > 0)
        j0 = np.minimum(i0c, len(cdT) - 1)
        j1 = np.minimum(i1c, len(cdT) - 1)
        out[:, 0] = np.where(
            has_d, (cdT[j1] - cdT[j0]) / np.maximum(n_d, 1) / mean_t, 0.0
        )
        out[:, 2] = np.where(
            has_d, (cdA[j1] - cdA[j0]) / np.maximum(n_d, 1) / mean_a, 0.0
        )
        n_dd = i1c - 1 - i0c
        has_dd = ok & (n_dd > 0) & (mean_t > 0)
        k0 = np.minimum(i0c, len(cddT) - 1)
        k1 = np.clip(i1c - 1, 0, len(cddT) - 1)
        out[:, 1] = np.where(
            has_dd,
            (cddT[k1] - cddT[k0]) / np.maximum(n_dd, 1) / mean_t,
            0.0,
        )
        r = (cR[i1c + 1] - cR[i0c]) / count
        out[:, 3] = np.where(
            ok & (r > 0), np.log(r / np.maximum(1.0 - r, 1e-9)), 0.0
        )
    out[~ok] = 0.0
    return np.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0)


@partial(jax.jit, static_argnames=("sr", "hop_s", "frame_s"))
def _periods_to_llds_device(starts, lengths, amps, corrs, counts, f0_pad,
                            *, sr, hop_s, frame_s):
    """Device translation of :func:`periods_to_llds` over a whole bucket.

    Inputs are the padded (B, P) period buffers + (B,) counts that
    :func:`mark_periods_batch` leaves on device, plus the padded (B, T)
    F0 contours. Keeping this stage on device removes the only mid-bucket
    host synchronization in the openSMILE batch pipeline (march download →
    host prefix sums → vq re-upload); the whole LLD chain then runs as one
    dispatch with a single functional fetch at the end. f32 vs the host
    oracle's f64 costs ~1e-5 relative on the vq family — well inside the
    5e-2 envelope the batched-vs-serial test grants it.
    """

    def one(starts, lengths, amps, corrs, k, f0):
        P = starts.shape[0]
        n_frames = f0.shape[0]
        idx = jnp.arange(P)
        valid = idx < k
        centers = jnp.where(valid, (starts + lengths / 2.0) / sr, jnp.inf)
        T = jnp.where(valid, lengths / sr, 0.0)
        A = jnp.where(valid, amps, 0.0)
        rho = jnp.clip(jnp.where(valid, corrs, 0.0), 0.0, 0.999999)
        dT = jnp.where(idx[:-1] < k - 1, jnp.abs(jnp.diff(T)), 0.0)
        ddT = jnp.where(idx[:-2] < k - 2, jnp.abs(jnp.diff(T, n=2)), 0.0)
        dA = jnp.where(idx[:-1] < k - 1, jnp.abs(jnp.diff(A)), 0.0)

        half = frame_s / 2
        t_c = jnp.arange(n_frames) * hop_s + half
        i0 = jnp.searchsorted(centers, t_c - half, side="left")
        i1 = jnp.searchsorted(centers, t_c + half, side="right") - 1
        cnt = i1 - i0 + 1
        ok = (cnt >= 2) & (f0 > 0)
        last = jnp.maximum(k - 1, 0)
        i0c = jnp.clip(i0, 0, last)
        i1c = jnp.clip(i1, 0, last)

        def cum(v):
            return jnp.concatenate([jnp.zeros(1, v.dtype), jnp.cumsum(v)])

        cT, cA = cum(T), cum(A)
        # accumulate rho−1 instead of rho: segment means of values ≈1 lose
        # the (1−rho) information to f32 cumsum rounding, and logHNR =
        # ln(rho/(1−rho)) amplifies exactly that loss
        cRm = cum(jnp.where(valid, rho - 1.0, 0.0))
        cdT, cddT, cdA = cum(dT), cum(ddT), cum(dA)
        cntf = jnp.maximum(cnt, 1).astype(jnp.float32)
        mean_t = (cT[i1c + 1] - cT[i0c]) / cntf
        mean_a = jnp.maximum((cA[i1c + 1] - cA[i0c]) / cntf, 1e-12)
        n_d = i1c - i0c
        has_d = ok & (n_d > 0) & (mean_t > 0)
        # host analogue indexes cdT of length k (= (k-1) diffs + lead 0)
        j0 = jnp.minimum(i0c, last)
        j1 = jnp.minimum(i1c, last)
        nd = jnp.maximum(n_d, 1).astype(jnp.float32)
        out0 = jnp.where(has_d, (cdT[j1] - cdT[j0]) / nd / mean_t, 0.0)
        out2 = jnp.where(has_d, (cdA[j1] - cdA[j0]) / nd / mean_a, 0.0)
        n_dd = i1c - 1 - i0c
        has_dd = ok & (n_dd > 0) & (mean_t > 0)
        last2 = jnp.maximum(k - 2, 0)
        k0 = jnp.minimum(i0c, last2)
        k1 = jnp.clip(i1c - 1, 0, last2)
        ndd = jnp.maximum(n_dd, 1).astype(jnp.float32)
        out1 = jnp.where(has_dd, (cddT[k1] - cddT[k0]) / ndd / mean_t, 0.0)
        one_minus_r = -(cRm[i1c + 1] - cRm[i0c]) / cntf
        r = 1.0 - one_minus_r
        out3 = jnp.where(
            ok & (r > 0), jnp.log(r / jnp.maximum(one_minus_r, 1e-9)), 0.0
        )
        out = jnp.stack([out0, out1, out2, out3], axis=-1)
        out = jnp.where((ok & (k >= 3))[:, None], out, 0.0)
        return jnp.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0)

    return jax.vmap(one)(
        starts.astype(jnp.float32), lengths.astype(jnp.float32),
        amps, corrs, counts, f0_pad,
    )


def periods_to_llds_batch(march_arrays, f0_pad, sr,
                          hop_s: float = 0.010, frame_s: float = 0.025):
    """(starts, lengths, amps, corrs, counts) device buffers + (B, T) F0 →
    device (B, T, 4) [jitterLocal, jitterDDP, shimmerLocal, logHNR]."""
    starts, lengths, amps, corrs, counts = march_arrays
    return _periods_to_llds_device(
        starts, lengths, amps, corrs, counts, jnp.asarray(f0_pad),
        sr=float(sr), hop_s=float(hop_s), frame_s=float(frame_s),
    )


def jitter_shimmer_llds(
    x: np.ndarray,
    sr: float,
    f0_frames: np.ndarray,
    hop_s: float = 0.010,
    frame_s: float = 0.025,
    search_range_rel: float = 0.25,
) -> np.ndarray:
    """Frame-level [jitterLocal, jitterDDP, shimmerLocal, logHNR] (T, 4)."""
    periods = mark_periods(x, sr, f0_frames, hop_s, search_range_rel)
    return periods_to_llds(periods, f0_frames, sr, hop_s, frame_s)
