"""Glottal pulse marking and interval segmentation (TextGrid-style).

Host-side control-heavy analyses that the reference performs through Praat
objects; compute-heavy inputs (pitch tracks, intensity contours) come from
the batched device ops:

* :func:`point_process_cc` — Praat ``[Sound, Pitch]: To PointProcess (cc)``:
  period-synchronous peak picking guided by the pitch track
  (src/mshds_extractor.py:271,321).
* :func:`vuv_intervals` — ``PointProcess: To TextGrid (vuv)...`` voiced /
  unvoiced segmentation from inter-pulse gaps (:272).
* :func:`silence_intervals` — ``Intensity: To TextGrid (silences)...``
  threshold-below-max silence detection with minimum-duration merging (:55).

These run in O(number of pulses / frames) NumPy on the host — they are
decision logic, not FLOPs — and their outputs feed back into batched ops.
"""

from __future__ import annotations

from typing import List, Tuple

import math

import jax
import jax.numpy as jnp
import numpy as np

from .intensity import IntensityContour
from .pitch import PitchTrack


def point_process_cc(
    x: np.ndarray, sr: float, pitch: PitchTrack
) -> np.ndarray:
    """Glottal pulse times from waveform peaks guided by the pitch track.

    Within each voiced frame span, successive pulses are located by finding
    the absolute waveform peak inside a window of ±0.625·T around the
    predicted next period (Praat's interpolation-free variant of
    Sound_Pitch_to_PointProcess_cc).
    """
    x = np.asarray(x, dtype=np.float64).reshape(-1)
    x_abs = np.abs(x)
    times = pitch.times
    f0 = np.asarray(pitch.f0, dtype=np.float64)
    n = len(times)
    n_x = len(x)
    # Scalar-arithmetic interpolator matching PitchTrack.value_at_time
    # (linear between voiced frames, NaN in unvoiced spans) — the marching
    # loop below calls it once per pulse, so it must be cheap.
    f0_nan = np.where(f0 > 0, f0, np.nan)
    f0_list = f0_nan.tolist()
    t0 = float(times[0]) if n else 0.0
    dt = float(times[1] - times[0]) if n > 1 else 1.0
    t_last = float(times[-1]) if n else 0.0

    def f_at(t: float) -> float:
        if t < t0 or t > t_last:
            return float("nan")
        pos = (t - t0) / dt
        i0 = int(pos)
        if i0 < 0:
            i0 = 0
        elif i0 > n - 1:
            i0 = n - 1
        i1 = i0 + 1 if i0 + 1 < n else n - 1
        w = pos - i0
        if w < 0.0:
            w = 0.0
        elif w > 1.0:
            w = 1.0
        # frame-center hits must not touch the other neighbor: 0·NaN = NaN
        # would void queries AT a stretch's first/last voiced frame (the
        # frame beyond is unvoiced). pos carries ~1 ulp of grid-division
        # rounding, so snap within an epsilon, not only at exact 0/1.
        if w < 1e-9:
            return f0_list[i0]
        if w > 1.0 - 1e-9:
            return f0_list[i1]
        return (1 - w) * f0_list[i0] + w * f0_list[i1]

    pulses: List[float] = []
    i = 0
    while i < n:
        if f0[i] <= 0:
            i += 1
            continue
        # voiced stretch [i, j)
        j = i
        while j < n and f0[j] > 0:
            j += 1
        t_start, t_end = float(times[i]), float(times[j - 1])
        # seed at the absolute peak near the middle of the first period
        T = 1.0 / f0[i]
        a = int(max(0.0, (t_start - T) * sr))
        b = int(min(n_x, (t_start + T) * sr))
        if b <= a:
            i = j
            continue
        seed = (a + int(np.argmax(x_abs[a:b]))) / sr
        head: List[float] = []
        tail: List[float] = [seed]
        # march forward. Pitch queries clamp into [t_start, t_end] (Praat
        # marches the whole voiced interval): the seed peak often lands
        # BEFORE the stretch's first frame center, and an unclamped query
        # there interpolates with the preceding unvoiced frame → NaN →
        # the march for the entire stretch used to die at the seed.
        t = seed
        while True:
            f_here = f_at(min(max(t, t_start), t_end))
            if not (f_here > 0):  # NaN or non-positive
                break
            T = 1.0 / f_here
            lo = t + 0.8 * T
            if lo > t_end + T:
                break
            a = int(lo * sr)
            b = int((t + 1.25 * T) * sr) + 1
            if b > n_x:
                b = n_x
            if b <= a:
                break
            t = (a + int(np.argmax(x_abs[a:b]))) / sr
            tail.append(t)
        # march backward from seed (same clamped queries)
        t = seed
        while True:
            f_here = f_at(min(max(t, t_start), t_end))
            if not (f_here > 0):
                break
            T = 1.0 / f_here
            hi = t - 0.8 * T
            if hi < t_start - T:
                break
            a = int((t - 1.25 * T) * sr)
            if a < 0:
                a = 0
            b = int(hi * sr) + 1
            if b <= a:
                break
            t = (a + int(np.argmax(x_abs[a:b]))) / sr
            head.append(t)
        head.reverse()
        pulses.extend(head)
        pulses.extend(tail)
        i = j
    pulses = np.asarray(sorted(set(np.round(np.asarray(pulses), 9))))
    return pulses


# ---------------------------------------------------------------------------
# Corpus-batched pulse marking (device)
# ---------------------------------------------------------------------------
#
# point_process_cc's marching is sequential only through the current pulse
# position, and — because the host sorts/dedups the pulse set at the end —
# the forward and backward marches of every voiced STRETCH are independent.
# The batched path therefore flattens (file, stretch) into lanes of one
# vmapped device program: each lane seeds at the stretch-start peak and runs
# the two marches as while_loops over fixed-size masked windows gathered
# from the (already device-resident) corpus waveform. Pulse positions are
# carried as integer sample indices, so the index arithmetic matches the
# host's float64 int() truncations exactly; only the 1/f0 interpolation and
# the window-break comparisons are float32.

_W_SEED = 1088  # ≥ 2·sr/f0_min samples (f0_min 30 Hz @ 16 kHz → 1067)
_W_MARCH = 256  # ≥ 0.45·sr/f0_min + 2


def _pulses_device_impl(
    x_cat, f0_pad, t0s, nfs,
    base, nx, f0row, seed_a, seed_b, t_start, t_end, direction,
    sr: float, dt: float, p_max: int,
):
    """Lane-vectorized march (see module comment): ONE while_loop whose
    state carries every lane's cursor, so the per-iteration window reads
    are a single batched row-gather instead of per-lane dynamic slices."""
    s_lanes = base.shape[0]
    f0nan = jnp.where(f0_pad > 0, f0_pad, jnp.nan)
    t_dim = f0_pad.shape[1]
    total32 = -(-(x_cat.shape[0] + _W_SEED + 64) // 32) * 32
    x32 = jnp.pad(x_cat, (0, total32 - x_cat.shape[0])).reshape(-1, 32)

    def f_at(t, row):  # vectorized over lanes
        t0 = t0s[row]
        n = nfs[row]
        t_last = t0 + (n - 1) * dt
        pos = (t - t0) / dt
        i0 = jnp.clip(pos.astype(jnp.int32), 0, n - 1)
        i1 = jnp.minimum(i0 + 1, n - 1)
        w = jnp.clip(pos - i0, 0.0, 1.0)
        v0 = f0nan[row, jnp.clip(i0, 0, t_dim - 1)]
        v1 = f0nan[row, jnp.clip(i1, 0, t_dim - 1)]
        # frame-center hits must not touch the other neighbor (0·NaN = NaN
        # at a stretch's first/last voiced frame) — mirrors the host f_at;
        # the epsilon absorbs the f32 grid-division rounding (~pos·1e-7)
        val = jnp.where(
            w < 1e-3, v0, jnp.where(w > 1.0 - 1e-3, v1, (1 - w) * v0 + w * v1)
        )
        return jnp.where((t < t0) | (t > t_last), jnp.nan, val)

    # seeds: peak of |x| in the host-precomputed [sa, sb) windows
    from .framing import rows32_gather

    wseed = rows32_gather(x32, base + seed_a, _W_SEED)
    wseed = jnp.where(
        jnp.arange(_W_SEED)[None, :] < (seed_b - seed_a)[:, None],
        jnp.abs(wseed), -1.0,
    )
    seeds = seed_a + jnp.argmax(wseed, axis=1).astype(jnp.int32)
    valid = seed_b > seed_a
    is_fwd = direction > 0

    lane_ids = jnp.arange(s_lanes)

    def cond(st):
        _, _, alive, _ = st
        return jnp.any(alive)

    def body(st):
        t_samp, k, alive, buf = st
        t_sec = t_samp.astype(jnp.float32) / sr
        # clamp queries into the stretch in BOTH directions (the forward
        # seed often precedes the first frame center; mirrors the host)
        f = f_at(jnp.clip(t_sec, t_start, t_end), f0row)
        ok = alive & (f > 0)  # NaN-safe
        T = 1.0 / jnp.where(f > 0, f, 1.0)
        ok &= jnp.where(
            is_fwd,
            t_sec + 0.8 * T <= t_end + T,
            t_sec - 0.8 * T >= t_start - T,
        )
        a = jnp.where(
            is_fwd,
            t_samp + (0.8 * T * sr).astype(jnp.int32),
            jnp.maximum(
                0, jnp.floor(t_samp - 1.25 * T * sr).astype(jnp.int32)
            ),
        )
        b = jnp.where(
            is_fwd,
            jnp.minimum(nx, t_samp + (1.25 * T * sr).astype(jnp.int32) + 1),
            jnp.floor(t_samp - 0.8 * T * sr).astype(jnp.int32) + 1,
        )
        ok &= b > a
        w = rows32_gather(x32, base + jnp.maximum(a, 0), _W_MARCH)
        w = jnp.where(
            jnp.arange(_W_MARCH)[None, :] <
            jnp.where(ok, b - a, 0)[:, None],
            jnp.abs(w), -1.0,
        )
        t_new = jnp.maximum(a, 0) + jnp.argmax(w, axis=1).astype(jnp.int32)
        buf = buf.at[lane_ids, k].set(jnp.where(ok, t_new, buf[lane_ids, k]))
        return (
            jnp.where(ok, t_new, t_samp),
            k + ok.astype(jnp.int32),
            ok & (k + 1 < p_max),
            buf,
        )

    _, ks, _, bufs = jax.lax.while_loop(
        cond, body,
        (
            seeds,
            jnp.zeros(s_lanes, jnp.int32),
            valid,
            jnp.zeros((s_lanes, p_max), jnp.int32),
        ),
    )
    # only forward lanes report the seed (avoids a duplicate per pair)
    seeds_out = jnp.where(valid & is_fwd, seeds, -1)
    return seeds_out, bufs, ks


_pulses_jitted = jax.jit(_pulses_device_impl, static_argnums=(12, 13, 14))


def _compact_pulse_buf(bufs, ks, off, cap, out_size: int):
    """Scatter the first min(ks, cap) entries of every lane's march buffer
    into one flat array at the lane's host-assigned offset (overflow
    entries drop out of bounds)."""
    p_max = bufs.shape[1]
    kk = jnp.arange(p_max, dtype=jnp.int32)[None, :]
    keep = kk < jnp.minimum(ks, cap)[:, None]
    idx = jnp.where(keep, off[:, None] + kk, out_size)
    return (
        jnp.zeros(out_size, jnp.int32)
        .at[idx.reshape(-1)]
        .set(bufs.reshape(-1), mode="drop")
    )


_compact_jitted = jax.jit(_compact_pulse_buf, static_argnums=(4,))


def point_process_cc_batch(
    xs,
    sr: float,
    tracks,
    buf=None,
    defer: bool = False,
):
    """Corpus-batched :func:`point_process_cc` over many (file, track)
    pairs at once.

    ``tracks``: one PitchTrack (or None) per file in ``xs`` (or ``buf``) —
    or a CONCATENATION of several such per-file lists (``len(tracks)`` a
    multiple of the file count; entry k belongs to file ``k % n_files``),
    so several track families (e.g. MSHDS's cc and cpp passes) march in
    ONE device program. Marching runs with one lane per voiced-stretch
    chunk; see the module comment. Returns one pulse-time array per
    ``tracks`` entry; ``defer=True`` → ``ops.framing.Deferred``.
    """
    from .bucketing import bucket_size
    from .framing import Deferred

    if buf is not None:
        xs = buf.xs
    n_files = len(xs)
    lens = [len(np.asarray(x)) for x in xs]
    n_tracks = len(tracks)
    if n_files == 0 or n_tracks % n_files:
        raise ValueError(f"{n_tracks} tracks not a multiple of {n_files} files")
    file_of = lambda k: k % n_files

    # f0 rows (one per file with a usable track)
    rows_meta = []  # per file: (row_idx | None)
    f0_list, t0_list, nf_list = [], [], []
    for tr in tracks:
        if tr is None or len(tr.times) < 2:
            rows_meta.append(None)
            continue
        rows_meta.append(len(f0_list))
        f0_list.append(np.asarray(tr.f0, np.float32))
        t0_list.append(float(tr.times[0]))
        nf_list.append(len(tr.times))
    empty = [np.zeros(0) for _ in range(n_tracks)]
    if not f0_list:
        return Deferred.ready(empty) if defer else empty
    first = next(tr for tr in tracks if tr is not None and len(tr.times) > 1)
    dt = float(first.times[1] - first.times[0])
    # one dt serves every lane's f_at grid arithmetic — mixed-step track
    # families would silently read the wrong frames
    for tr in tracks:
        if tr is not None and len(tr.times) > 1:
            tr_dt = float(tr.times[1] - tr.times[0])
            if abs(tr_dt - dt) > 1e-9:
                raise ValueError(
                    f"mixed pitch-track time steps in one batch: {dt} vs "
                    f"{tr_dt}; call point_process_cc_batch per step family"
                )
    # fixed masked-gather windows are sized for sr ≤ 16 kHz speech floors;
    # larger windows would be silently truncated (wrong peaks picked)
    min_f0 = min(
        float(np.min(tr.f0[tr.f0 > 0])) for tr in tracks
        if tr is not None and len(tr.times) > 1 and np.any(tr.f0 > 0)
    ) if any(
        tr is not None and len(tr.times) > 1 and np.any(tr.f0 > 0)
        for tr in tracks
    ) else float("inf")
    if np.isfinite(min_f0):
        need_seed = int(2.0 * sr / min_f0) + 2
        need_march = int(0.45 * sr / min_f0) + 2
        if need_seed > _W_SEED or need_march > _W_MARCH:
            raise ValueError(
                f"sr={sr} with pitch floor {min_f0:.1f} Hz needs gather "
                f"windows ({need_seed}, {need_march}) exceeding the kernel's "
                f"({_W_SEED}, {_W_MARCH}); resample to ≤16 kHz or use the "
                "host point_process_cc oracle"
            )
    t_max = max(len(f) for f in f0_list)
    f0_pad = np.zeros((len(f0_list), t_max), np.float32)
    for i, f in enumerate(f0_list):
        f0_pad[i, : len(f)] = f

    # Stretch lanes (host decision logic, exact f64 seed windows). The
    # device while_loop runs lanes in lockstep at a high fixed
    # per-iteration cost (~100 µs measured on the tunneled chip), so long
    # voiced stretches are SPLIT into ≤ _SPLIT_SEC chunks marched as
    # independent lanes; each chunk keeps only the pulses it owns
    # ([c0, c1) — open-ended at the true stretch boundaries), so overlap
    # duplicates from re-seeding are dropped. Chunk seeds differ from the
    # single-seed host march only for the first few periods after each cut
    # (peak-picking locks onto the same waveform peaks).
    _SPLIT_SEC = 0.5
    lanes = []  # (track, row, seed_a, seed_b, ts, te, keep_lo, keep_hi)
    for ti, tr in enumerate(tracks):
        fi = file_of(ti)
        row = rows_meta[ti]
        if row is None:
            continue
        f0 = np.asarray(tr.f0)
        times = tr.times
        n = len(times)
        i = 0
        while i < n:
            if f0[i] <= 0:
                i += 1
                continue
            j = i
            while j < n and f0[j] > 0:
                j += 1
            t_start, t_end = float(times[i]), float(times[j - 1])
            seg = f0[i:j]
            f0_hi = float(seg.max())
            f0_lo = float(seg.min())  # all > 0 inside a voiced stretch
            n_chunks = max(1, int(np.ceil((t_end - t_start) / _SPLIT_SEC)))
            edges = np.linspace(t_start, t_end, n_chunks + 1)
            for ci in range(n_chunks):
                c0, c1 = float(edges[ci]), float(edges[ci + 1])
                # f0 at the chunk start (nearest voiced frame in [i, j))
                fi0 = min(max(i, int(round((c0 - float(times[0])) / dt))), j - 1)
                T = 1.0 / float(f0[fi0]) if f0[fi0] > 0 else 1.0 / float(f0[i])
                a = int(max(0.0, (c0 - T) * sr))
                b = int(min(lens[fi], (c0 + T) * sr))
                if b <= a:
                    continue
                keep_lo = -np.inf if ci == 0 else c0
                keep_hi = np.inf if ci == n_chunks - 1 else c1
                # per-lane pulse-count bound: the march advances ≥ 0.8·T ≥
                # 0.8/f0_hi per accepted pulse over a span of at most
                # (c1−c0) + 2·T_max (the cond's ±T overshoot)
                cap = int(((c1 - c0) + 2.0 / max(f0_lo, 1.0))
                          * f0_hi / 0.8) + 8
                lanes.append((ti, row, a, b, c0, c1, keep_lo, keep_hi, cap))
            i = j

    if not lanes:
        return Deferred.ready(empty) if defer else empty

    if buf is not None:
        offsets = buf.offsets
        x_cat = buf.x_cat
        tail_pad = buf.pad
    else:
        pieces, offsets = [], np.zeros(n_files, np.int64)
        off = 0
        for i, x in enumerate(xs):
            offsets[i] = off
            pieces.append(np.pad(
                np.asarray(x, np.float64), (0, _W_SEED)
            ).astype(np.float32))
            off += lens[i] + _W_SEED
        x_cat = jnp.asarray(np.concatenate(pieces))
        tail_pad = _W_SEED
    if tail_pad < _W_SEED:
        raise ValueError(f"corpus buffer pad {tail_pad} < seed window {_W_SEED}")

    max_dur = max(l[5] - l[4] for l in lanes)
    # advance ≥ 0.8·T ≥ 0.8·sr/620 ≈ 20 samples per pulse (SHS/AC ceilings)
    p_max = bucket_size(int(max_dur * sr / 16) + 8)

    fls = np.asarray([l[0] for l in lanes], np.int32)  # TRACK indices
    lane_files = np.asarray([file_of(int(t)) for t in fls], np.int64)
    lane_arr = lambda k, dtype: np.asarray([l[k] for l in lanes], dtype)
    base = (offsets[lane_files]).astype(np.int32)
    nx = np.asarray([lens[f] for f in lane_files], np.int32)
    rows_a = lane_arr(1, np.int32)
    seed_a = lane_arr(2, np.int32)
    seed_b = lane_arr(3, np.int32)
    ts_a = lane_arr(4, np.float32)
    te_a = lane_arr(5, np.float32)
    # one forward + one backward lane per chunk
    def dup(a):
        return np.concatenate([a, a])
    fls2 = dup(fls)
    base = dup(base)
    nx = dup(nx)
    rows_a = dup(rows_a)
    seed_a = dup(seed_a)
    seed_b = dup(seed_b)
    ts_a = dup(ts_a)
    te_a = dup(te_a)
    direction = np.concatenate(
        [np.ones(len(lanes), np.int32), -np.ones(len(lanes), np.int32)]
    )
    # pad lane count to a bucket (dummy lanes: empty seed window)
    s_pad = bucket_size(len(fls2), min_bucket=8)
    def padlane(a, fill=0):
        return np.pad(a, (0, s_pad - len(a)), constant_values=fill)
    base = padlane(base)
    nx = padlane(nx, 1)
    rows_a = padlane(rows_a)
    seed_a = padlane(seed_a)
    seed_b = padlane(seed_b)  # pad b == 0 == a → invalid lane
    ts_a = padlane(ts_a)
    te_a = padlane(te_a, -1.0)
    direction = padlane(direction, 1)

    seeds_dev, bufs_dev, ks_dev = _pulses_jitted(
        x_cat, jnp.asarray(f0_pad), jnp.asarray(np.asarray(t0_list, np.float32)),
        jnp.asarray(np.asarray(nf_list, np.int32)),
        jnp.asarray(base), jnp.asarray(nx), jnp.asarray(rows_a),
        jnp.asarray(seed_a), jnp.asarray(seed_b),
        jnp.asarray(ts_a), jnp.asarray(te_a), jnp.asarray(direction),
        float(sr), float(dt), int(p_max),
    )

    n_lanes2 = len(fls2)
    keep_lo = dup(np.asarray([l[6] for l in lanes]))
    keep_hi = dup(np.asarray([l[7] for l in lanes]))

    # The march buffer is (lanes, p_max) int32 and almost entirely padding
    # (~10 MB over a minutes-scale corpus, ~2% occupancy). Each lane's
    # pulse count is bounded by its host-computed cap (see the lane loop),
    # so the buffer is scatter-compacted ON DEVICE into a flat array of
    # Σ caps entries before the level's single overlapped transfer —
    # ~20-50x less traffic with no extra round trip. A cap overflow
    # (possible only if the f0 interpolation escapes the stretch's
    # [min, max] bound, i.e. never) is caught in finalize via the fetched
    # per-lane counts and degrades to a full refetch.
    caps = np.minimum(padlane(dup(lane_arr(8, np.int64))), p_max).astype(np.int32)
    offs = np.zeros(len(caps) + 1, np.int64)
    np.cumsum(caps, out=offs[1:])
    flat_cap = bucket_size(int(offs[-1]), min_bucket=64)
    flat_dev = _compact_jitted(
        bufs_dev, ks_dev, jnp.asarray(offs[:-1].astype(np.int32)),
        jnp.asarray(caps), int(flat_cap),
    )

    def _finalize(host):
        seeds, ks, flat = host
        overflow = bool((np.minimum(ks, p_max) > caps).any())
        if overflow:  # pragma: no cover — cap bound violated
            full = np.asarray(jax.device_get(bufs_dev))
        per_file: "List[List[float]]" = [[] for _ in range(n_tracks)]
        for li in range(n_lanes2):
            fi = int(fls2[li])  # track index
            samp = []
            if seeds[li] >= 0:
                samp.append(int(seeds[li]))
            if overflow:
                samp.extend(int(v) for v in full[li, : int(ks[li])])
            else:
                o = int(offs[li])
                samp.extend(
                    int(v) for v in flat[o : o + min(int(ks[li]), int(caps[li]))]
                )
            if not samp:
                continue
            lo, hi = keep_lo[li], keep_hi[li]
            per_file[fi].extend(
                t for t in (s / sr for s in samp) if lo <= t < hi
            )
        out = []
        for fi in range(n_tracks):
            out.append(np.asarray(sorted(set(
                np.round(np.asarray(per_file[fi]), 9).tolist()
            ))))
        return out

    d = Deferred((seeds_dev, ks_dev, flat_dev), _finalize)
    return d if defer else d.result()


def vuv_intervals(
    pulses: np.ndarray,
    total_duration: float,
    max_period: float = 0.02,
    mean_period: float = 0.01,
) -> List[Tuple[float, float, str]]:
    """Voiced/unvoiced segmentation from pulse gaps.

    Praat ``PointProcess: To TextGrid (vuv)`` semantics
    (PointProcess_and_TextGrid.cpp): pulses with gaps ≤ ``max_period`` chain
    into one voiced interval spanning [t_first − mean_period/2,
    t_last + mean_period/2]; when consecutive padded spans overlap, the later
    V interval starts where the earlier one ended (they stay SEPARATE
    intervals — Praat does not merge them, and the reference's CPPS loop
    analyzes them as separate segments). Defaults mirror Praat's command
    defaults (0.02, 0.01); the reference's MSHDS call passes mean period 0.1
    (src/mshds_extractor.py:272). Returns [(tmin, tmax, 'V'|'U'), ...]
    covering [0, total_duration].
    """
    out: List[Tuple[float, float, str]] = []
    n = len(pulses)
    if n == 0:
        return [(0.0, total_duration, "U")]
    half = 0.5 * mean_period
    begin_voiceless = 0.0
    i = 0
    while i < n:
        end_voiceless = pulses[i] - half
        if end_voiceless <= begin_voiceless:
            end_voiceless = begin_voiceless
        else:
            out.append((begin_voiceless, end_voiceless, "U"))
        j = i
        while j + 1 < n and pulses[j + 1] - pulses[j] <= max_period:
            j += 1
        v_end = min(pulses[j] + half, total_duration)
        if v_end > end_voiceless:
            out.append((end_voiceless, v_end, "V"))
        begin_voiceless = v_end
        i = j + 1
    if begin_voiceless < total_duration:
        out.append((begin_voiceless, total_duration, "U"))
    return out


def silence_intervals(
    intensity: IntensityContour,
    silence_threshold_db: float,
    min_silent_duration: float = 0.3,
    min_sounding_duration: float = 0.1,
    total_duration: Optional[float] = None,
) -> List[Tuple[float, float, str]]:
    """Silent/sounding segmentation of an intensity contour.

    Praat semantics: a frame is silent when its intensity is below
    ``max + silence_threshold_db`` (the threshold is negative, relative to
    the contour maximum). Silent runs shorter than ``min_silent_duration``
    are absorbed into the neighboring sounding intervals and vice versa.
    Praat's TextGrid tiles the full sound domain: interior boundaries sit at
    frame midpoints and the outer intervals extend to [0, total_duration]
    (pass it; defaults to one half frame step past the last center).
    Returns [(tmin, tmax, 'silent'|'sounding'), ...].
    """
    v = intensity.values_db
    t = intensity.times
    if len(v) == 0:
        return []
    thresh = v.max() + silence_threshold_db
    silent = v < thresh
    # build runs over frame times, extended to the sound edges
    dt = t[1] - t[0] if len(t) > 1 else 0.0
    right = t[-1] + dt / 2 if total_duration is None else max(
        total_duration, t[-1] + dt / 2 if len(t) > 1 else t[-1]
    )
    bounds = np.concatenate([[0.0], (t[1:] + t[:-1]) / 2, [right]])
    runs: List[Tuple[float, float, bool]] = []
    k = 0
    for m in range(1, len(v) + 1):
        if m == len(v) or silent[m] != silent[k]:
            runs.append((bounds[k], bounds[m], bool(silent[k])))
            k = m
    # enforce minimum durations: flip too-short runs, then merge
    def merge(runs):
        merged = []
        for r in runs:
            if merged and merged[-1][2] == r[2]:
                merged[-1] = (merged[-1][0], r[1], r[2])
            else:
                merged.append(list(r) if isinstance(r, tuple) else r)
                merged[-1] = (r[0], r[1], r[2])
        return merged

    changed = True
    while changed:
        changed = False
        runs = merge(runs)
        for idx, (a, b, is_sil) in enumerate(runs):
            dur = b - a
            min_dur = min_silent_duration if is_sil else min_sounding_duration
            if dur < min_dur and len(runs) > 1:
                runs[idx] = (a, b, not is_sil)
                changed = True
                break
    runs = merge(runs)
    return [(a, b, "silent" if s else "sounding") for a, b, s in runs]


def label_at_time(intervals: List[Tuple[float, float, str]], t: float) -> str:
    for a, b, lab in intervals:
        if a <= t <= b:
            return lab
    return intervals[-1][2] if intervals else ""
