"""Subharmonic-summation pitch with Viterbi smoothing (openSMILE chain).

Implements the Androids pitch chain (Androids.conf:142-227):

* ``cSpecScale`` — magnitude spectrum interpolated onto an octave (log2)
  frequency grid from minF=25 Hz, with spectral smoothing and peak
  enhancement (:142-159);
* ``cPitchShs`` — subharmonic summation (Hermes 1988): on the octave grid a
  harmonic shift is a constant offset, so H(s) = Σ_h c^{h−1}·S(s + log2 h)
  is a sum of shifted copies; greedy peak picking yields up to 6 candidates
  in [52, 620] Hz with normalized scores and a voicing measure (:161-186);
* ``cPitchSmootherViterbi`` — candidate-level Viterbi with the configured
  weights (wTvv, wTvvd, wTvuv, wThr, wTuu, wLocal, wRange; :190-213),
  emitting F0final and voicingFinalUnclipped;
* ``cValbasedSelector`` — F0 zeroed where frame RMS energy < 0.001 (:216-227).

Spectral work is batched JAX; the Viterbi is a ``lax.scan``.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ShsParams(NamedTuple):
    min_pitch: float = 52.0
    max_pitch: float = 620.0
    n_candidates: int = 6
    n_harmonics: int = 15
    compression: float = 0.85
    voicing_cutoff: float = 0.70
    min_f_scale: float = 25.0
    # Viterbi weights (cPitchSmootherViterbi defaults from Androids.conf)
    w_tvv: float = 10.0
    w_tvvd: float = 5.0
    w_tvuv: float = 10.0
    w_thr: float = 4.0
    w_tuu: float = 0.0
    w_local: float = 2.0
    w_range: float = 1.0


def octave_grid(sr: float, min_f: float, n_points: int) -> Tuple[float, float]:
    """(log2_min, dlog) of the octave-scale grid spanning [min_f, sr/2]."""
    log_min = math.log2(min_f)
    log_max = math.log2(sr / 2.0)
    return log_min, (log_max - log_min) / (n_points - 1)


@lru_cache(maxsize=16)
def _spline_interp_matrix(n_bins: int, pos_key: Tuple[float, ...]) -> np.ndarray:
    """Natural-cubic-spline interpolation MATRIX from a uniform source grid
    (bin coordinates 0..n_bins−1) to the points in ``pos_key``.

    A natural cubic spline is linear in the data, so S with
    spline(y)(pos) = S @ y exists; openSMILE's cSpecScale uses spline
    interpolation (Androids.conf:153 ``interpMethod = spline``), and as a
    matrix the whole scale transform is one GEMM on the MXU instead of
    gathers. Built once per (n_bins, grid) and cached.
    """
    n = n_bins
    pos = np.asarray(pos_key, dtype=np.float64)
    # second-derivative operator: natural BCs (m_0 = m_{n-1} = 0);
    # interior rows solve m_{j-1} + 4 m_j + m_{j+1} = 6·Δ²y (unit spacing)
    a = np.zeros((n - 2, n - 2))
    np.fill_diagonal(a, 4.0)
    np.fill_diagonal(a[1:], 1.0)
    np.fill_diagonal(a[:, 1:], 1.0)
    d2 = np.zeros((n - 2, n))
    rows = np.arange(n - 2)
    d2[rows, rows] = 6.0
    d2[rows, rows + 1] = -12.0
    d2[rows, rows + 2] = 6.0
    m_full = np.zeros((n, n))
    m_full[1:-1] = np.linalg.solve(a, d2)  # (n, n): y -> second derivatives
    j = np.clip(pos.astype(int), 0, n - 2)
    u = pos - j
    s = np.zeros((len(pos), n))
    rows = np.arange(len(pos))
    s[rows, j] += 1.0 - u
    s[rows, j + 1] += u
    cu = ((1.0 - u) ** 3 - (1.0 - u)) / 6.0
    cl = (u**3 - u) / 6.0
    s += cu[:, None] * m_full[j] + cl[:, None] * m_full[j + 1]
    return s.astype(np.float32)


@partial(jax.jit, static_argnums=(1, 2, 3))
def octave_scale_spectrum(
    mag: jnp.ndarray, sr: float, min_f: float, n_points: int
) -> jnp.ndarray:
    """Interpolate (T, F) magnitude onto a log2-frequency grid.

    Grid point i sits at frequency 2^(log2_min + i·dlog) per
    :func:`octave_grid`. Matches cSpecScale (Androids.conf:142-159):
    natural-cubic-SPLINE interpolation (as one GEMM — see
    :func:`_spline_interp_matrix`), spectral smoothing (3-point moving
    average) and peak enhancement (subtract local average, clip ≥0).
    Known gap: ``auditoryWeighting = 1`` (:159) is not applied — openSMILE
    weights the octave spectrum with Hermes' auditory sensitivity curve
    before SHS; its exact curve cannot be validated without a real
    SMILExtract run, so candidate SCORES differ slightly from the
    reference's (peak LOCATIONS, which drive F0, are unaffected by a
    smooth positive weighting within a candidate's neighborhood).
    """
    t, n_bins = mag.shape
    freqs = np.arange(n_bins) * (sr / 2.0) / (n_bins - 1)
    log_min, dlog = octave_grid(sr, min_f, n_points)
    grid_f = 2.0 ** (log_min + np.arange(n_points) * dlog)
    pos = np.interp(grid_f, freqs, np.arange(n_bins))
    s_mat = _spline_interp_matrix(n_bins, tuple(pos.tolist()))
    s = jnp.maximum(mag @ jnp.asarray(s_mat).T, 0.0)
    # smoothing: centered 3-point moving average
    sm = (
        jnp.concatenate([s[:, :1], s[:, :-1]], axis=1)
        + s
        + jnp.concatenate([s[:, 1:], s[:, -1:]], axis=1)
    ) / 3.0
    # peak enhancement: subtract a wide local average, clip at zero
    k = 9
    pad = k // 2
    padded = jnp.pad(sm, ((0, 0), (pad, pad)), mode="edge")
    csum = jnp.cumsum(padded, axis=1)
    csum = jnp.concatenate([jnp.zeros_like(csum[:, :1]), csum], axis=1)
    local_avg = (csum[:, k:] - csum[:, :-k]) / k
    return jnp.maximum(sm - local_avg, 0.0)


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def shs_candidates(
    s_oct: jnp.ndarray,
    log_min: float,
    dlog: float,
    n_harmonics: int,
    compression: float,
    n_candidates: int,
    bounds: Tuple[float, float],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Subharmonic summation + greedy peak picking.

    Returns (freqs (T, C), scores (T, C) in [0,1]).
    """
    t, n = s_oct.shape
    h_sum = jnp.zeros_like(s_oct)
    for h in range(1, n_harmonics + 1):
        shift = int(round(math.log2(h) / dlog))
        shifted = jnp.pad(s_oct, ((0, 0), (0, shift)))[:, shift : shift + n]
        h_sum = h_sum + (compression ** (h - 1)) * shifted

    lo, hi = bounds
    grid_log = log_min + jnp.arange(n) * dlog
    in_band = (grid_log >= math.log2(lo)) & (grid_log <= math.log2(hi))

    prev = jnp.concatenate([h_sum[:, :1], h_sum[:, :-1]], axis=1)
    nxt = jnp.concatenate([h_sum[:, 1:], h_sum[:, -1:]], axis=1)
    is_peak = (h_sum > prev) & (h_sum >= nxt) & in_band[None, :]
    peak_vals = jnp.where(is_peak, h_sum, -jnp.inf)

    top_vals, top_idx = jax.lax.top_k(peak_vals, n_candidates)
    # parabolic refinement in grid coordinates
    rows = jnp.arange(t)[:, None]
    i_l = jnp.clip(top_idx - 1, 0, n - 1)
    i_r = jnp.clip(top_idx + 1, 0, n - 1)
    dl = top_vals - h_sum[rows, i_l]
    dr = top_vals - h_sum[rows, i_r]
    denom = jnp.maximum(dl + dr, 1e-12)
    delta = jnp.clip(0.5 * (dl - dr) / denom, -0.5, 0.5)
    log_f = log_min + (top_idx + delta) * dlog
    freqs = 2.0**log_f
    valid = jnp.isfinite(top_vals) & (top_vals > 0)
    freqs = jnp.where(valid, freqs, 0.0)

    # normalized candidate scores (best = 1)
    best = jnp.maximum(top_vals[:, :1], 1e-30)
    scores = jnp.where(valid, top_vals / best, 0.0)
    return freqs, scores


@partial(jax.jit, static_argnums=(1, 2, 3))
def _voicing_from_power(
    power: jnp.ndarray, sr: float, min_pitch: float, win_len: int = 0
) -> jnp.ndarray:
    """Voicing probability per frame from the normalized autocorrelation,
    recovered from a power spectrum (Wiener–Khinchin: r = irfft(|S|²)).

    ``power`` should come from a transform with n_fft ≥ win_len + sr/min_pitch
    (the extractor computes a dedicated wide one): the irfft of an n_fft-point
    power spectrum is the frame's CIRCULAR autocorrelation, alias-free only
    for lags ≤ n_fft − win_len — with the shared 512-point STFT of 400-sample
    frames, every lag past 112 samples (pitches below ~143 Hz) folds in
    wrap-around products. With a narrow input the wrapped region is used
    as-is (legacy behavior) and low-pitch voicing is approximate.

    The raw r(τ)/r(0) of a WINDOWED frame is depressed by the window's own
    taper — Hamming alone caps a 120 Hz frame (lag 133 @ 16 kHz) at ~0.54,
    and after the 0.97 preemphasis even strongly periodic frames read
    0.6–0.75, straddling openSMILE's 0.70 voicing cutoff (measured: pulse
    train 0.64, harmonic sum 0.75 — genuinely voiced frames were zeroed).
    Boersma's correction divides by the window's autocorrelation ratio; the
    divisor is floored at its value at half the window so long lags (> W/2,
    where the window overlap carries no information) can't amplify noise.
    Corrected: periodic frames ≈ 1.0, white noise ≤ ~0.3."""
    from .dft import autocorr_via_power
    from ..audio.frontend import hamming_window

    n_fft = 2 * (power.shape[1] - 1)
    max_lag = int(sr / min_pitch)
    r = autocorr_via_power(power, n_fft, max_lag + 1)
    r0 = jnp.maximum(r[:, :1], 1e-30)
    band = r[:, 2:] / r0
    W = win_len if win_len else int(round(0.025 * sr))
    w = hamming_window(W)
    rw = np.correlate(w, w, "full")[W - 1:]
    rw_ratio = rw / rw[0]
    lags = np.minimum(np.arange(2, max_lag + 1), W - 1)
    div = np.maximum(rw_ratio[lags], rw_ratio[W // 2]).astype(np.float32)
    band = band / jnp.asarray(div)
    return jnp.clip(jnp.max(band, axis=1), 0.0, 1.0)


def _voicing_from_mag(
    mag: jnp.ndarray, sr: float, min_pitch: float, win_len: int = 0
) -> jnp.ndarray:
    return _voicing_from_power(mag * mag, sr, min_pitch, win_len)


@partial(jax.jit, static_argnums=(3,))
def _viterbi_state_inputs(
    freqs: jnp.ndarray,
    scores: jnp.ndarray,
    voicing: jnp.ndarray,
    params: ShsParams,
):
    """Per-file candidate-state costs for the path finder.

    States: the C voiced candidates + 1 unvoiced state. Local cost:
    wLocal·(1−score) for voiced, wThr·(voicing−cutoff) for unvoiced (cheap
    when voicing is low), plus wRange·|log2(f/center)| as a range prior.
    Returns (local (T, S), states_f (T, S), is_voiced (T, S))."""
    t, c = freqs.shape
    # Range-prior center: geometric-mean F0 over confidently-voiced frames
    # with a NONZERO top candidate (a zero candidate must not drag the mean
    # toward log(1)=0 while inflating the denominator). When no frame
    # qualifies, there is no evidence for a speaker range — disable the
    # range cost rather than collapsing the center to 1 Hz, which would
    # veto every voiced state in [52, 620] Hz.
    confident = (voicing > params.voicing_cutoff) & (freqs[:, 0] > 0)
    n_confident = jnp.sum(confident)
    center = jnp.exp(
        jnp.sum(jnp.log(jnp.maximum(freqs[:, 0], 1.0)) * confident)
        / jnp.maximum(n_confident, 1)
    )

    voiced_local = params.w_local * (1.0 - scores)
    range_cost = params.w_range * jnp.abs(
        jnp.log2(jnp.maximum(freqs, 1.0) / jnp.maximum(center, 1.0))
    )
    range_cost = jnp.where(n_confident > 0, range_cost, 0.0)
    voiced_local = voiced_local + jnp.where(freqs > 0, range_cost, 1e6)
    unvoiced_local = params.w_thr * (voicing - params.voicing_cutoff)

    local = jnp.concatenate([voiced_local, unvoiced_local[:, None]], axis=1)
    safe_f = jnp.where(freqs > 0, freqs, 1.0)
    states_f = jnp.concatenate([safe_f, jnp.ones((t, 1))], axis=1)
    is_voiced = jnp.concatenate(
        [freqs > 0, jnp.zeros((t, 1), bool)], axis=1
    )
    return local, states_f, is_voiced


def _viterbi_path_assoc(local, states_f, is_voiced, params: ShsParams):
    """Associative-scan path finder (non-TPU backends); (T, S) inputs.

    Transitions: wTvv·|Δlog2 f| between voiced states, wTvuv across voicing
    changes, wTuu for unvoiced runs. Prefix costs c_t and suffix completions
    d_t come from ``lax.associative_scan`` in O(log T) depth; each frame's
    winner is argmin_j c_t[j] + d_t[j] (a state on a globally optimal
    path, no sequential backtracking)."""
    t, s = local.shape
    f_prev, v_prev = states_f[:-1], is_voiced[:-1]
    f_cur, v_cur = states_f[1:], is_voiced[1:]
    jump = jnp.abs(jnp.log2(f_prev[:, :, None] / f_cur[:, None, :]))
    both_voiced = v_prev[:, :, None] & v_cur[:, None, :]
    same = v_prev[:, :, None] == v_cur[:, None, :]
    trans = jnp.where(
        both_voiced,
        params.w_tvv * jump,
        jnp.where(same, params.w_tuu, params.w_tvuv),
    )
    M = trans + local[1:][:, None, :]  # (T-1, S, S)

    def combine(a, b):
        return jnp.min(a[..., :, :, None] + b[..., None, :, :], axis=-2)

    prefix = jax.lax.associative_scan(combine, M)
    cost = jnp.concatenate(
        [local[:1], jnp.min(local[0][None, :, None] + prefix, axis=1)],
        axis=0,
    )  # (T, S)
    # Suffix completions D_t = M_t ⊗ … ⊗ M_{T-2}: a reverse associative
    # scan composes in flipped order and M is not symmetric (the local-cost
    # term breaks it), so scan the transposed elements (scan_rev(Mᵀ)[t] =
    # D_tᵀ) and reduce over axis −2. (Fixes a round-1 bug where the suffix
    # was the flipped-order product.)
    suffix = jax.lax.associative_scan(
        combine, jnp.swapaxes(M, -1, -2), reverse=True
    )
    d = jnp.concatenate(
        [jnp.min(suffix, axis=-2), jnp.zeros((1, s), M.dtype)], axis=0
    )
    return jnp.argmin(cost + d, axis=1)


def viterbi_smooth(
    freqs: jnp.ndarray,
    scores: jnp.ndarray,
    voicing: jnp.ndarray,
    params: ShsParams,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Candidate-level Viterbi with the openSMILE weight scheme
    (cPitchSmootherViterbi, Androids.conf:190-213). Returns (f0 (T,),
    voicing (T,)). Single-file reference path; the batched TPU pipeline
    routes through ops.pallas.viterbi instead (see ``_shs_batched_jit``)."""
    t, c = freqs.shape
    local, states_f, is_voiced = _viterbi_state_inputs(
        freqs, scores, voicing, params
    )
    if t == 1:
        path = jnp.argmin(local[0])[None]
    else:
        path = _viterbi_path_assoc(local, states_f, is_voiced, params)

    rows = jnp.arange(t)
    chose_voiced = path < c
    f0 = jnp.where(chose_voiced, states_f[rows, jnp.clip(path, 0, c - 1)], 0.0)
    return f0, voicing


def shs_pitch(
    mag: np.ndarray,
    sr: float,
    frame_rms: np.ndarray,
    params: ShsParams = ShsParams(),
    energy_threshold: float = 0.001,
    win_len: int = 0,
    voicing_power: np.ndarray = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full chain: octave scale → SHS → Viterbi → energy gate.

    mag: (T, F) magnitude spectrum; frame_rms: (T,) RMS energies for the
    cValbasedSelector gate; win_len: the analysis window length ``mag``
    was framed with (0 → assume 25 ms), needed for the voicing taper
    correction; voicing_power: optional (T, F') power spectrum from a WIDE
    transform (n_fft ≥ win_len + sr/min_pitch) for alias-free voicing at
    low pitches (see _voicing_from_power) — defaults to mag².
    Returns (F0final (T,), voicingFinalUnclipped (T,)).
    """
    mag = jnp.asarray(mag)
    n_points = mag.shape[1]
    log_min, dlog = octave_grid(float(sr), float(params.min_f_scale), n_points)
    s_oct = octave_scale_spectrum(
        mag, float(sr), float(params.min_f_scale), n_points
    )
    freqs, scores = shs_candidates(
        s_oct,
        log_min,
        dlog,
        params.n_harmonics,
        params.compression,
        params.n_candidates,
        (params.min_pitch, params.max_pitch),
    )
    vp = mag * mag if voicing_power is None else jnp.asarray(voicing_power)
    voicing = _voicing_from_power(
        vp, float(sr), float(params.min_pitch), win_len
    )
    f0, voc = viterbi_smooth(freqs, scores, voicing, params)
    f0 = np.asarray(f0)
    voc = np.asarray(voc)
    # cValbasedSelector has zeroVec=1 (Androids.conf:216-227): frames under
    # the energy threshold zero the WHOLE vector — voicing included, not
    # just F0 (low-level hum autocorrelates near 1.0 and would otherwise
    # leak into all 24 voicingFinalUnclipped functionals)
    gate = np.asarray(frame_rms) >= energy_threshold
    return np.where(gate, f0, 0.0), np.where(gate, voc, 0.0)


def shs_pitch_batch(
    mag: np.ndarray,
    sr: float,
    frame_rms: np.ndarray,
    params: ShsParams = ShsParams(),
    energy_threshold: float = 0.001,
    as_device: bool = False,
    win_len: int = 0,
    voicing_power: np.ndarray = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Batched :func:`shs_pitch`: mag (N, T, F), frame_rms (N, T) →
    (F0 (N, T), voicing (N, T)). All stages vmapped; one compiled program
    per (N, T, F) bucket shape. ``as_device=True`` keeps the (already
    energy-gated) outputs on device so downstream device consumers (the
    jitter march, the LLD assembly) can chain without a host round trip."""
    mag = jnp.asarray(mag)
    n_points = mag.shape[-1]
    vp = mag * mag if voicing_power is None else jnp.asarray(voicing_power)
    f0, voc = _shs_batched_jit(params, float(sr), n_points,
                               float(energy_threshold), int(win_len))(
        mag, jnp.asarray(frame_rms), vp
    )
    if as_device:
        return f0, voc
    return np.asarray(f0), np.asarray(voc)


@lru_cache(maxsize=32)
def _shs_batched_jit(params: ShsParams, sr: float, n_points: int,
                     energy_threshold: float, win_len: int = 0):
    """One cached jitted chain per (params, sr, n_points, threshold) — a
    fresh ``jax.jit(closure)`` per call would retrace and reload the
    compiled program from the persistent cache every invocation (~0.65 s
    measured on the tunneled chip)."""
    log_min, dlog = octave_grid(sr, float(params.min_f_scale), n_points)
    from .pallas.viterbi import viterbi_pallas_available, viterbi_path_pallas

    use_pallas = viterbi_pallas_available()

    def prep(m, rms, vp):
        s_oct = octave_scale_spectrum(
            m, sr, float(params.min_f_scale), n_points
        )
        freqs, scores = shs_candidates(
            s_oct, log_min, dlog, params.n_harmonics, params.compression,
            params.n_candidates, (params.min_pitch, params.max_pitch),
        )
        voicing = _voicing_from_power(vp, sr, float(params.min_pitch), win_len)
        local, states_f, is_voiced = _viterbi_state_inputs(
            freqs, scores, voicing, params
        )
        return local, states_f, is_voiced, voicing

    def batched(mag_b, rms_b, vp_b):
        local, states_f, is_voiced, voicing = jax.vmap(prep)(mag_b, rms_b, vp_b)
        c = local.shape[-1] - 1  # voiced candidate count
        if local.shape[1] == 1:
            path = jnp.argmin(local[:, 0], axis=-1)[:, None]
        elif use_pallas:
            # Sequential VMEM-state kernel: the associative form's (T, S, S)
            # min-plus intermediates tile at ~11% vreg occupancy on TPU.
            path = viterbi_path_pallas(
                jnp.log2(states_f).astype(jnp.float32),
                is_voiced.astype(jnp.float32),
                local.astype(jnp.float32),
                float(params.w_tvv), float(params.w_tuu),
                float(params.w_tvuv),
            )
        else:
            path = jax.vmap(
                lambda l, f, v: _viterbi_path_assoc(l, f, v, params)
            )(local, states_f, is_voiced)
        chose_voiced = path < c
        f0 = jnp.where(
            chose_voiced,
            jnp.take_along_axis(
                states_f, jnp.clip(path, 0, c - 1)[..., None], axis=2
            )[..., 0],
            0.0,
        )
        # cValbasedSelector zeroVec=1: the gate zeroes voicing too
        gate = rms_b >= energy_threshold
        return jnp.where(gate, f0, 0.0), jnp.where(gate, voicing, 0.0)

    return jax.jit(batched)
