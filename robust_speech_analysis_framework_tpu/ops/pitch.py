"""Fundamental-frequency analysis: Boersma's autocorrelation method.

TPU-native replacement for Praat's ``Sound: To Pitch (ac)...`` /
``To Pitch (cc)...`` (used throughout the reference's MSHDS extractor:
src/mshds_extractor.py:104,143,178,270,320,355). Implements the method of
Boersma (1993) "Accurate short-term analysis of the fundamental frequency
and the harmonics-to-noise ratio of a sampled sound":

1. frames centered on Praat's symmetric grid, local mean subtracted;
2. normalized autocorrelation of the windowed frame divided by the window's
   own normalized autocorrelation (removes the window's taper bias) — all
   frames at once via batched rFFT;
3. per frame, up to ``max_candidates−1`` local maxima of r(τ) within the
   [1/ceiling, 1/floor] lag band, parabolically interpolated, scored
   ``R = r − octave_cost·log2(floor·τ)``, plus an unvoiced candidate scored
   from the local/global peak ratio and the voicing/silence thresholds;
4. Viterbi smoothing over frames (``lax.scan``) with octave-jump and
   voiced/unvoiced transition costs (scaled by 0.01/time_step as Praat's
   Pitch_pathFinder does — denser grids penalize each transition more).

The whole pipeline is one jitted program per (n_samples-bucket, params);
frame work is data-parallel, only the final Viterbi is a sequential scan.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PitchParams:
    time_step: float = 0.0  # 0 → Praat default 0.75/floor
    floor: float = 75.0
    ceiling: float = 600.0
    max_candidates: int = 15
    very_accurate: bool = False
    silence_threshold: float = 0.03
    voicing_threshold: float = 0.45
    octave_cost: float = 0.01
    octave_jump_cost: float = 0.35
    voiced_unvoiced_cost: float = 0.14
    method: str = "ac"  # 'ac' | 'cc'

    @property
    def periods_per_window(self) -> float:
        base = 3.0 if self.method == "ac" else 1.0
        return base * (2.0 if self.very_accurate else 1.0)

    @property
    def dt(self) -> float:
        # Praat default: periodsPerWindow / (4 · floor) — 0.75/floor for ac,
        # 0.25/floor for cc, doubled when very accurate (Sound_to_Pitch_any).
        if self.time_step > 0:
            return self.time_step
        return self.periods_per_window / (4.0 * self.floor)


class PitchTrack(NamedTuple):
    times: np.ndarray  # (N,) frame centers in seconds
    f0: np.ndarray  # (N,) Hz; 0 where unvoiced
    strength: np.ndarray  # (N,) winning candidate strength (r value)

    @property
    def voiced(self) -> np.ndarray:
        return self.f0 > 0

    def value_at_time(self, t) -> np.ndarray:
        """Praat ``Pitch: Get value at time (linear)`` semantics.

        Praat's Sampled_getValueAtX interpolates between the NEAR and FAR
        frames around ``t`` and falls back to CONSTANT extrapolation from the
        near frame when the far frame is undefined (unvoiced) or outside the
        grid — so a query in the near half of a voiced→unvoiced boundary gap
        (or within dt/2 past the edge centers) returns the voiced value, not
        NaN. NaN only when the near frame itself is unvoiced/out of range.
        """
        t = np.atleast_1d(np.asarray(t, dtype=np.float64))
        f0 = np.where(self.f0 > 0, self.f0, np.nan)
        n = len(f0)
        dt = self.times[1] - self.times[0] if n > 1 else 1.0
        ireal = (t - self.times[0]) / dt
        ileft = np.floor(ireal).astype(int)
        phase = ireal - ileft
        lo = phase < 0.5
        inear = np.where(lo, ileft, ileft + 1)
        ifar = np.where(lo, ileft + 1, ileft)
        ph = np.where(lo, phase, 1.0 - phase)
        near_in = (inear >= 0) & (inear < n)
        far_in = (ifar >= 0) & (ifar < n)
        fnear = f0[np.clip(inear, 0, n - 1)]
        ffar = f0[np.clip(ifar, 0, n - 1)]
        vals = np.where(
            ~near_in,
            np.nan,
            np.where(~far_in | np.isnan(ffar), fnear, fnear + ph * (ffar - fnear)),
        )
        return vals if vals.shape != (1,) else vals[0]

    # --- summary statistics (Praat "Get mean/standard deviation") ---------

    def mean_hz(self) -> float:
        v = self.f0[self.f0 > 0]
        return float(v.mean()) if v.size else float("nan")

    def std_semitones(self) -> float:
        """Std of the track on a 12·log2 scale (Praat 'semitones' units)."""
        v = self.f0[self.f0 > 0]
        if v.size < 2:
            return float("nan")
        st = 12.0 * np.log2(v / 100.0)
        return float(st.std(ddof=1))


def praat_frame_grid(
    n_samples: int, sr: float, window_s: float, dt: float
) -> Tuple[int, float]:
    """Praat's symmetric short-term analysis grid.

    Returns (n_frames, first_center_time): frames of ``window_s`` seconds
    every ``dt``, centered so the leftover duration is split equally at both
    ends (Praat Sampled_shortTermAnalysis).
    """
    duration = n_samples / sr
    n = int(math.floor((duration - window_s) / dt)) + 1
    if n < 1:
        return 0, duration / 2
    mid = duration / 2
    first = mid - ((n - 1) * dt) / 2
    return n, first


def _window_and_norm_ac(win: np.ndarray, n_fft: int) -> np.ndarray:
    spec = np.fft.rfft(win, n_fft)
    ac = np.fft.irfft(spec * np.conj(spec), n_fft)
    return ac / ac[0]


@partial(jax.jit, static_argnums=(1, 2, 3))
def _normalized_autocorr(
    frames: jnp.ndarray, n_fft: int, max_lag: int, window_kind: str
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Boersma step: r(τ) of windowed, mean-subtracted frames, divided by the
    window's own autocorrelation. Returns (r[(N, max_lag+1)], local_peak[N])."""
    n = frames.shape[-1]
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    local_peak = jnp.max(jnp.abs(frames), axis=-1)
    if window_kind == "hanning":
        k = np.arange(n)
        win = (0.5 - 0.5 * np.cos(2 * np.pi * (k + 1) / (n + 1))).astype(np.float64)
    else:  # gaussian (very accurate mode)
        k = np.arange(n) - (n - 1) / 2
        win = np.exp(-48.0 * (k / n) ** 2).astype(np.float64)
    from .dft import autocorr

    w = jnp.asarray(win, frames.dtype)
    xw = frames * w
    ac = autocorr(xw, n_fft, max_lag + 1)
    r = ac / jnp.maximum(ac[..., :1], 1e-30)
    r_w = jnp.asarray(_window_and_norm_ac(win, n_fft)[: max_lag + 1], frames.dtype)
    r = r / jnp.maximum(r_w, 1e-12)
    return r, local_peak


@partial(jax.jit, static_argnums=(3, 4, 5))
def _find_candidates(
    r: jnp.ndarray,
    local_peak: jnp.ndarray,
    global_peak: jnp.ndarray,
    sr: float,
    params_tuple: tuple,
    max_cands: int = 15,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top pitch candidates per frame.

    Returns (freqs (N, C), strengths (N, C)); slot 0 is the unvoiced
    candidate with frequency 0. ``global_peak`` is traced (per-file value;
    keeping it out of the static signature avoids a recompile per file).
    """
    (floor, ceiling, silence_t, voicing_t, octave_c) = params_tuple
    n_frames, n_lags = r.shape
    lag_min = int(math.floor(sr / ceiling))
    lag_max = int(math.ceil(sr / floor))
    lag_max = min(lag_max, n_lags - 2)

    lags = jnp.arange(n_lags)
    prev_r = jnp.concatenate([r[:, :1], r[:, :-1]], axis=1)
    next_r = jnp.concatenate([r[:, 1:], r[:, -1:]], axis=1)
    is_max = (r > prev_r) & (r >= next_r)
    in_band = (lags[None, :] >= max(lag_min, 2)) & (lags[None, :] <= lag_max)
    valid = is_max & in_band & (r > 0.0)

    # Parabolic interpolation of each local maximum.
    dr = 0.5 * (next_r - prev_r)
    d2 = jnp.maximum(2.0 * r - prev_r - next_r, 1e-12)
    delta = jnp.clip(dr / d2, -0.5, 0.5)
    tau = (lags[None, :] + delta) / sr
    r_peak = r + 0.5 * dr * delta
    r_peak = jnp.minimum(r_peak, 1.0)
    freq = 1.0 / jnp.maximum(tau, 1e-9)
    # Floor-referenced score R = r − octave_cost·log2(floor·τ) ranks the
    # candidates WITHIN a frame (Boersma eq. 24 / Sound_to_Pitch_any's
    # top-k selection). The PATH strength handed to the Viterbi is Praat's
    # Pitch_pathFinder form r − octave_cost·log2(ceiling/f): the two differ
    # by the constant octave_cost·log2(ceiling/floor), which matters against
    # the absolute unvoiced-candidate strength.
    sel_strength = r_peak - octave_c * jnp.log2(jnp.maximum(floor * tau, 1e-12))
    sel_strength = jnp.where(valid, sel_strength, -jnp.inf)

    k = max_cands - 1
    top_sel, top_idx = jax.lax.top_k(sel_strength, k)
    top_freq = jnp.take_along_axis(freq, top_idx, axis=1)
    top_r = jnp.take_along_axis(r_peak, top_idx, axis=1)
    keep = jnp.isfinite(top_sel)
    top_freq = jnp.where(keep, top_freq, 0.0)
    top_strength = top_r - octave_c * jnp.log2(
        ceiling / jnp.maximum(top_freq, 1e-12)
    )
    top_strength = jnp.where(keep, top_strength, -1e30)
    top_r = jnp.where(keep, top_r, 0.0)

    # Unvoiced candidate (Boersma eq. 23).
    peak_ratio = local_peak / jnp.maximum(global_peak, 1e-30)
    unvoiced_strength = voicing_t + jnp.maximum(
        0.0, 2.0 - peak_ratio / (silence_t / (1.0 + voicing_t))
    )
    freqs = jnp.concatenate([jnp.zeros((n_frames, 1)), top_freq], axis=1)
    strengths = jnp.concatenate([unvoiced_strength[:, None], top_strength], axis=1)
    rvals = jnp.concatenate([jnp.zeros((n_frames, 1)), top_r], axis=1)
    return freqs, strengths, rvals


@partial(jax.jit, static_argnums=(3,))
def _viterbi(
    freqs: jnp.ndarray,
    strengths: jnp.ndarray,
    trans_scale: jnp.ndarray,
    costs: tuple,
) -> jnp.ndarray:
    """Minimum-cost path over per-frame candidates. Returns chosen index per
    frame. costs = (octave_jump_cost, voiced_unvoiced_cost).

    TPU-first formulation: Viterbi's forward recurrence is a min-plus
    matrix-chain product, which is associative — so instead of a length-T
    ``lax.scan`` (T sequential kernel launches; ~50 µs each makes a 20 s
    file cost ~0.3 s), both prefix costs c_t (best cost of any path ENDING
    in state j at t) and suffix completions d_t (best cost of finishing
    from state j at t) come from ``lax.associative_scan`` in O(log T)
    depth. Every frame's winner is then argmin_j c_t[j] + d_t[j] — a state
    on a globally optimal path — with no sequential backtracking. Same cost
    model as Praat's path finder (octave-jump + voiced/unvoiced transition
    costs scaled by 0.01/dt, minus per-candidate strengths); only the
    floating-point summation order differs from the sequential version, so
    argmins can flip only on exact near-ties.
    """
    jump_c, vuv_c = costs
    n_frames, n_cands = freqs.shape

    voiced = freqs > 0
    safe_f = jnp.where(voiced, freqs, 1.0)

    if n_frames == 1:
        return jnp.argmax(strengths, axis=1)  # single frame: best candidate

    # M[t, i, j]: cost of being in candidate j at frame t+1 having been in
    # candidate i at frame t (transition + state cost of j).
    f_prev, v_prev = safe_f[:-1], voiced[:-1]
    f_cur, v_cur = safe_f[1:], voiced[1:]
    both_voiced = v_prev[:, :, None] & v_cur[:, None, :]
    same_voicing = v_prev[:, :, None] == v_cur[:, None, :]
    jump = jnp.abs(jnp.log2(f_prev[:, :, None] / f_cur[:, None, :]))
    trans = jnp.where(
        both_voiced,
        jump_c * jump,
        jnp.where(same_voicing, 0.0, vuv_c),  # u→u free, v↔u penalized
    ) * trans_scale
    M = trans - strengths[1:][:, None, :]  # (T-1, C, C)

    def combine(a, b):
        # min-plus matrix product; a precedes b in time
        return jnp.min(a[..., :, :, None] + b[..., None, :, :], axis=-2)

    prefix = jax.lax.associative_scan(combine, M)  # P_t = M_0 ⊗ … ⊗ M_t
    c0 = -strengths[0]
    c = jnp.concatenate(
        [c0[None], jnp.min(c0[None, :, None] + prefix, axis=1)], axis=0
    )  # (T, C)
    # Suffix completions D_t = M_t ⊗ … ⊗ M_{T-2}. A reverse associative
    # scan composes in FLIPPED order (scan_rev[t] = M_{T-2} ⊗ … ⊗ M_t —
    # verified empirically), and M is not symmetric (the per-frame strength
    # term breaks it), so scan the transposed elements: with N = Mᵀ,
    # scan_rev(N)[t] = Nᵀ_{T-2} … = D_tᵀ, hence min over axis −2.
    suffix = jax.lax.associative_scan(
        combine, jnp.swapaxes(M, -1, -2), reverse=True
    )
    d = jnp.concatenate(
        [jnp.min(suffix, axis=-2), jnp.zeros((1, n_cands), M.dtype)], axis=0
    )  # (T, C)
    return jnp.argmin(c + d, axis=1)


@partial(jax.jit, static_argnums=(1, 2))
def _forward_crosscorr(
    frames_ext: jnp.ndarray, win_len: int, max_lag: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized forward cross-correlation (Praat cc method).

    ``frames_ext`` is (N, win_len + max_lag); r(τ) correlates the leading
    ``win_len`` samples against the segment shifted by τ, normalized by both
    segment energies.
    """
    from .dft import cross_corr

    frames_ext = frames_ext - jnp.mean(
        frames_ext[:, :win_len], axis=-1, keepdims=True
    )
    base = frames_ext[:, :win_len]
    local_peak = jnp.max(jnp.abs(base), axis=-1)
    n_ext = frames_ext.shape[-1]
    n_fft = 1 << int(np.ceil(np.log2(2 * n_ext)))
    corr = cross_corr(base, frames_ext, n_fft, max_lag + 1)
    e_base = jnp.sum(base * base, axis=-1, keepdims=True)
    csum = jnp.cumsum(frames_ext * frames_ext, axis=-1)
    zero = jnp.zeros_like(csum[:, :1])
    csum = jnp.concatenate([zero, csum], axis=-1)
    lags = jnp.arange(max_lag + 1)
    e_lag = csum[:, lags + win_len] - csum[:, lags]
    r = corr / jnp.sqrt(jnp.maximum(e_base * e_lag, 1e-30))
    return r, local_peak


def _pitch_track(x: np.ndarray, sr: float, params: PitchParams) -> PitchTrack:
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    dt = params.dt
    window_s = params.periods_per_window / params.floor
    n_frames, t0 = praat_frame_grid(len(x), sr, window_s, dt)
    if n_frames < 1:
        return PitchTrack(np.zeros(0), np.zeros(0), np.zeros(0))

    win_len = int(round(window_s * sr))
    max_lag = int(math.ceil(sr / params.floor)) + 2
    n_fft = 1 << int(np.ceil(np.log2(win_len + max_lag + 1)))

    centers = t0 + np.arange(n_frames) * dt
    global_peak = float(np.max(np.abs(x - x.mean()))) or 1e-30

    from .bucketing import pad_frames

    if params.method == "cc":
        ext = win_len + max_lag
        starts = np.clip(
            np.round(centers * sr - win_len / 2).astype(int), 0, max(len(x) - ext, 0)
        )
        x_pad = np.pad(x, (0, max(ext - len(x), 0)))
        frames_np, _ = pad_frames(x_pad[starts[:, None] + np.arange(ext)[None, :]])
        r, local_peak = _forward_crosscorr(jnp.asarray(frames_np), win_len, max_lag)
    else:
        starts = np.clip(
            np.round(centers * sr - win_len / 2).astype(int),
            0,
            max(len(x) - win_len, 0),
        )
        frames_np, _ = pad_frames(x[starts[:, None] + np.arange(win_len)[None, :]])
        window_kind = "gaussian" if params.very_accurate else "hanning"
        r, local_peak = _normalized_autocorr(
            jnp.asarray(frames_np), n_fft, max_lag, window_kind
        )
    freqs, strengths, rvals = _find_candidates(
        r,
        local_peak,
        jnp.asarray(global_peak, jnp.float32),
        float(sr),
        (
            float(params.floor),
            float(params.ceiling),
            float(params.silence_threshold),
            float(params.voicing_threshold),
            float(params.octave_cost),
        ),
        params.max_candidates,
    )
    # Drop voiced candidates above the ceiling.
    over = (freqs > params.ceiling)
    strengths = jnp.where(over, -1e30, strengths)
    # Neutralize the bucket-padding frames so the path through REAL frames
    # is padding-invariant: phantom frames edge-replicate the last frame,
    # so zeroing their strengths makes the optimal completion from every
    # real tail state exactly 0 (stay on the same candidate, jump cost 0,
    # no reward) — otherwise near-tie tail decisions flipped with the
    # distance to the next bucket boundary.
    strengths = jnp.where(
        jnp.arange(strengths.shape[0])[:, None] < n_frames, strengths, 0.0
    )

    # Praat's time-step correction (Pitch_pathFinder): octaveJumpCost and
    # voicedUnvoicedCost are multiplied by 0.01/dx — a DENSER frame grid
    # has more transitions per second, so each one must cost MORE to keep
    # the per-second penalty constant. (Was inverted as dt/0.01: at the
    # 5 ms MSHDS step that made jump/voicing flips 4x too cheap.)
    trans_scale = jnp.asarray(0.01 / dt)
    path = _viterbi(
        freqs,
        strengths,
        trans_scale,
        (float(params.octave_jump_cost), float(params.voiced_unvoiced_cost)),
    )
    idx = np.asarray(path)[:n_frames]  # drop bucket-padding frames
    f0 = np.asarray(freqs)[np.arange(n_frames), idx]
    st = np.asarray(rvals)[np.arange(n_frames), idx]
    return PitchTrack(centers, f0, st)


def pitch_track_ac(
    x: np.ndarray,
    sr: float,
    time_step: float = 0.0,
    floor: float = 75.0,
    ceiling: float = 600.0,
    max_candidates: int = 15,
    very_accurate: bool = False,
    silence_threshold: float = 0.03,
    voicing_threshold: float = 0.45,
    octave_cost: float = 0.01,
    octave_jump_cost: float = 0.35,
    voiced_unvoiced_cost: float = 0.14,
) -> PitchTrack:
    """Praat ``To Pitch (ac)...`` equivalent (argument order matches the
    Praat command as called at src/mshds_extractor.py:104)."""
    return _pitch_track(
        x,
        sr,
        PitchParams(
            time_step=time_step,
            floor=floor,
            ceiling=ceiling,
            max_candidates=max_candidates,
            very_accurate=very_accurate,
            silence_threshold=silence_threshold,
            voicing_threshold=voicing_threshold,
            octave_cost=octave_cost,
            octave_jump_cost=octave_jump_cost,
            voiced_unvoiced_cost=voiced_unvoiced_cost,
            method="ac",
        ),
    )


def pitch_track_cc(
    x: np.ndarray,
    sr: float,
    time_step: float = 0.0,
    floor: float = 75.0,
    ceiling: float = 600.0,
    **kwargs,
) -> PitchTrack:
    """Praat ``To Pitch (cc)...`` equivalent (1-period window forward
    cross-correlation approximated with the same normalized-AC machinery on
    a shorter window; used for pulse marking at src/mshds_extractor.py:320)."""
    return _pitch_track(
        x,
        sr,
        PitchParams(
            time_step=time_step,
            floor=floor,
            ceiling=ceiling,
            method="cc",
            **kwargs,
        ),
    )


# ---------------------------------------------------------------------------
# Corpus-batched pitch analysis
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _gathered_autocorr(x_cat, starts, win_len, n_fft, max_lag, window_kind="hanning"):
    """Device-side framing + normalized autocorrelation: the host uploads the
    concatenated waveform (small) and per-frame start indices instead of the
    materialized frame matrix (~win_len× larger)."""
    from .framing import gather_frames

    frames = gather_frames(x_cat, starts, win_len)
    return _normalized_autocorr(frames, n_fft, max_lag, window_kind)


@partial(jax.jit, static_argnums=(2, 3))
def _gathered_crosscorr(x_cat, starts, ext, win_len_max_lag):
    win_len, max_lag = win_len_max_lag
    from .framing import gather_frames

    return _forward_crosscorr(gather_frames(x_cat, starts, ext), win_len, max_lag)


@partial(jax.jit, static_argnums=(5, 6, 7))
def _select_tracks(freqs, strengths, rvals, gather_idx, lengths, trans_scale,
                   costs, use_pallas=False):
    """Corpus-wide candidate rows → per-file (f0, strength) tracks, entirely
    on device: gather each file's frame rows into a padded (B, T, C) stack
    (padding rows edge-replicate the file's last frame, matching the
    single-file path's pad_frames convention), run the batched Viterbi, and
    pick the winning candidate per frame. Returns one stacked (2, B, T)
    array so the host needs a single device→host transfer.

    ``lengths`` (B,) true frame counts: strengths past a file's length are
    zeroed so the phantom (edge-replicated) frames cannot influence the
    path through real frames (see the same masking in _pitch_track).

    On TPU (``use_pallas``) the path finder is the sequential Pallas kernel
    (ops.pallas.viterbi): the associative-scan form materializes (T, C, C)
    min-plus cost matrices whose trailing C×C dims tile at ~11% occupancy
    in (8, 128) vregs — profiled at ~85% of this program's runtime."""
    fp = freqs[gather_idx]
    sp = strengths[gather_idx]
    rp = rvals[gather_idx]
    sp = jnp.where(
        jnp.arange(fp.shape[1])[None, :, None] < lengths[:, None, None],
        sp, 0.0,
    )
    if use_pallas:
        from .pallas.viterbi import viterbi_path_pallas

        jump_c, vuv_c = costs
        voiced = fp > 0
        lf = jnp.log2(jnp.where(voiced, fp, 1.0)).astype(jnp.float32)
        paths = viterbi_path_pallas(
            lf, voiced.astype(jnp.float32), (-sp).astype(jnp.float32),
            jump_c * trans_scale, 0.0, vuv_c * trans_scale,
        )
    else:
        ts = jnp.asarray(trans_scale)
        paths = jax.vmap(lambda f, s: _viterbi(f, s, ts, costs))(fp, sp)
    f0 = jnp.take_along_axis(fp, paths[..., None], axis=2)[..., 0]
    st = jnp.take_along_axis(rp, paths[..., None], axis=2)[..., 0]
    return jnp.stack([f0, st])


def pitch_track_batch(
    xs, sr: float, params: PitchParams, buf=None, indices=None,
    defer: bool = False,
) -> "list[PitchTrack]":
    """Batched pitch analysis over many waveforms at once.

    The frame-parallel core (normalized autocorrelation / cross-correlation
    + candidate extraction) runs ONCE over the concatenation of every file's
    frames — file boundaries are irrelevant to per-frame work — and only the
    per-file Viterbi smoothing is vmapped over a padded (N, T_max, C) stack.
    Equivalent to calling :func:`pitch_track_ac`/``_cc`` per file (same
    cores, same parameters), at a fraction of the dispatch/compile cost.
    """
    r = pitch_track_batch_shared(xs, sr, [params], buf, indices, defer=defer)
    if defer:
        from .framing import Deferred

        return Deferred(r.arrays, lambda h: r.finalize(h)[0])
    return r[0]


def pitch_track_batch_shared(
    xs, sr: float, params_list: "list[PitchParams]",
    buf=None, indices=None, defer: bool = False,
) -> "list[list[PitchTrack]]":
    """Batched pitch analysis sharing one correlation pass across parameter
    variants.

    All entries of ``params_list`` must agree on the frame geometry and
    correlation method (method, floor, time_step, periods_per_window) — the
    expensive normalized-(cross)correlation runs once, then candidate
    scoring + Viterbi runs per variant (they may differ in voicing/silence
    thresholds, ceiling, and transition costs). Returns one track list per
    variant. The MSHDS pipeline uses this to share the autocorrelation
    between its main (voicing 0.45) and CPP (voicing 0.3) passes.
    """
    from .bucketing import pad_frames

    params = params_list[0]
    for p in params_list[1:]:
        assert p.method == params.method and p.floor == params.floor
        assert p.dt == params.dt
        assert p.periods_per_window == params.periods_per_window

    if buf is not None:
        idxs = list(indices) if indices is not None else list(range(len(buf.xs)))
        xs = [buf.xs[i] for i in idxs]
    else:
        idxs = None
        xs = [np.asarray(x, dtype=np.float64).reshape(-1) for x in xs]
    dt = params.dt
    window_s = params.periods_per_window / params.floor
    win_len = int(round(window_s * sr))
    max_lag = int(math.ceil(sr / params.floor)) + 2
    n_fft = 1 << int(np.ceil(np.log2(win_len + max_lag + 1)))

    ext = win_len + max_lag
    if buf is not None and ext > buf.pad:
        raise ValueError(f"corpus buffer pad {buf.pad} < required ext {ext}")
    metas = []  # (n_frames, centers, global_peak)
    start_blocks = []
    cat_pieces = []
    offset = 0
    for k, x in enumerate(xs):
        n_frames, t0 = praat_frame_grid(len(x), sr, window_s, dt)
        centers = t0 + np.arange(n_frames) * dt
        global_peak = float(np.max(np.abs(x - x.mean()))) if len(x) else 1e-30
        metas.append((n_frames, centers, global_peak or 1e-30))
        if n_frames < 1:
            continue
        if buf is None:
            # Each file is padded so any window/extension stays inside its
            # own region of the concatenated buffer.
            base = offset
            cat_pieces.append(np.pad(x, (0, ext)).astype(np.float32))
            offset += len(x) + ext
        else:
            base = int(buf.offsets[idxs[k]])
        if params.method == "cc":
            # match the serial path: trailing frames shift LEFT so the
            # whole win+lag extension reads real samples (clipping only to
            # len(x) read the zero pad and diverged on file tails)
            starts = np.clip(
                np.round(centers * sr - win_len / 2).astype(int),
                0, max(len(x) - ext, 0),
            )
        else:
            starts = np.clip(
                np.round(centers * sr - win_len / 2).astype(int),
                0, max(len(x) - win_len, 0),
            )
        start_blocks.append(starts + base)

    if not start_blocks:
        from .framing import Deferred

        empty = [PitchTrack(m[1], np.zeros(m[0]), np.zeros(m[0])) for m in metas]
        empties = [empty for _ in params_list]
        return Deferred.ready(empties) if defer else empties

    x_cat = (
        buf.x_cat if buf is not None else jnp.asarray(np.concatenate(cat_pieces))
    )
    all_starts = np.concatenate(start_blocks)
    # Bucket the frame count; pad_frames edge-replicates the LAST start
    # (results for padded rows are discarded when splitting per file below).
    starts_padded, n_total = pad_frames(all_starts.astype(np.int32)[:, None])
    starts_j = jnp.asarray(starts_padded[:, 0])
    if params.method == "cc":
        r_all, peak_all = _gathered_crosscorr(
            x_cat, starts_j, ext, (win_len, max_lag)
        )
    else:
        window_kind = "gaussian" if params.very_accurate else "hanning"
        r_all, peak_all = _gathered_autocorr(
            x_cat, starts_j, win_len, n_fft, max_lag, window_kind
        )

    # Candidate extraction over ALL frames at once: each frame's file-level
    # global peak is delivered as a per-frame array (traced, so no recompile
    # per corpus), then the per-file Viterbi + winner selection runs as one
    # device program with one transfer back (``_select_tracks``).
    live = [i for i, m in enumerate(metas) if m[0] >= 1]
    lengths = [metas[i][0] for i in live]
    gp_rows = np.concatenate(
        [np.full(metas[i][0], metas[i][2], np.float32) for i in live]
    )
    gp_padded, _ = pad_frames(gp_rows[:, None])
    gp_j = jnp.asarray(gp_padded[:, 0])

    # Fixed-size file slabs (padded by repeating row 0) bound both compile
    # count (one shape per t_max) and the associative-scan Viterbi's
    # (slab, T, C, C) cost-matrix memory.
    _SLAB = 8
    t_max = pad_frames(np.zeros((max(lengths), 1)))[0].shape[0]
    b_pad = -(-len(live) // _SLAB) * _SLAB
    gather_idx = np.zeros((b_pad, t_max), np.int32)
    file_lens = np.zeros(b_pad, np.int32)
    offset = 0
    for j, i in enumerate(live):
        n_i = metas[i][0]
        gather_idx[j] = offset + np.minimum(np.arange(t_max), n_i - 1)
        file_lens[j] = n_i
        offset += n_i
    gather_slabs = [
        (jnp.asarray(gather_idx[s : s + _SLAB]),
         jnp.asarray(file_lens[s : s + _SLAB]))
        for s in range(0, b_pad, _SLAB)
    ]
    trans_scale = float(0.01 / dt)  # Praat: costs *= 0.01/dx (see _pitch_track)

    from .framing import Deferred
    from .pallas.viterbi import viterbi_pallas_available

    use_pallas = viterbi_pallas_available()
    f0_st_devs = []
    for p in params_list:
        freqs, strengths, rvals = _find_candidates(
            r_all, peak_all, gp_j, float(sr),
            (float(p.floor), float(p.ceiling),
             float(p.silence_threshold), float(p.voicing_threshold),
             float(p.octave_cost)),
            p.max_candidates,
        )
        strengths = jnp.where(freqs > p.ceiling, -1e30, strengths)
        f0_st_devs.append([
            _select_tracks(
                freqs, strengths, rvals, g, lens, trans_scale,
                (float(p.octave_jump_cost), float(p.voiced_unvoiced_cost)),
                use_pallas,
            )
            for g, lens in gather_slabs
        ])

    def _finalize(f0_st_list):
        results: "list[list[PitchTrack]]" = []
        for f0_st_slabs in f0_st_list:
            f0_st = np.concatenate(
                [np.asarray(s) for s in f0_st_slabs], axis=1
            )
            tracks: "list[PitchTrack]" = []
            k = 0
            for i, (n_frames, centers, _) in enumerate(metas):
                if n_frames < 1:
                    tracks.append(
                        PitchTrack(centers, np.zeros(n_frames), np.zeros(n_frames))
                    )
                    continue
                tracks.append(PitchTrack(
                    centers,
                    f0_st[0, k, :n_frames].astype(np.float64),
                    f0_st[1, k, :n_frames].astype(np.float64),
                ))
                k += 1
            results.append(tracks)
        return results

    d = Deferred(f0_st_devs, _finalize)
    return d if defer else d.result()
