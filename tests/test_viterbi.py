"""Path-finder correctness: brute-force oracle for the candidate Viterbi.

The pitch path finders (ops.pitch._viterbi for Praat AC/CC pitch,
ops.shs_pitch for the openSMILE SHS chain) pick, per frame, a state on a
globally optimal path via prefix costs + suffix completions. The suffix
composition order is easy to get wrong (a reverse associative scan composes
in flipped order; the cost matrices are not symmetric), so these tests pin
both implementations and the Pallas TPU kernel (run in interpret mode on
CPU) against exhaustive path enumeration on small problems.
"""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from robust_speech_analysis_framework_tpu.ops.pitch import _viterbi
from robust_speech_analysis_framework_tpu.ops.pallas.viterbi import (
    viterbi_path_pallas,
)


def _brute_best_through(T, C, local, trans_fn):
    """best[t][j] = min total path cost constrained to pass through j@t."""
    best = np.full((T, C), np.inf)
    for path in itertools.product(range(C), repeat=T):
        cost = local[0][path[0]] + sum(
            trans_fn(k - 1, path[k - 1], k, path[k]) + local[k][path[k]]
            for k in range(1, T)
        )
        for t in range(T):
            best[t, path[t]] = min(best[t, path[t]], cost)
    return best


def _praat_case(seed, T=5, C=3):
    rng = np.random.default_rng(seed)
    freqs = np.where(
        rng.random((T, C)) < 0.4, 0.0, rng.uniform(60, 500, (T, C))
    )
    freqs[:, 0] = 0.0  # slot 0 is the unvoiced candidate
    strengths = rng.uniform(-0.5, 1.0, (T, C))
    return freqs, strengths


def _praat_trans_fn(freqs, jump_c, vuv_c, ts):
    lf = np.log2(np.where(freqs > 0, freqs, 1.0))
    v = freqs > 0

    def trans(t1, i, t2, j):
        if v[t1, i] and v[t2, j]:
            return jump_c * ts * abs(lf[t1, i] - lf[t2, j])
        if v[t1, i] == v[t2, j]:
            return 0.0
        return vuv_c * ts

    return trans


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_viterbi_matches_brute_force(seed):
    T, C = 5, 3
    freqs, strengths = _praat_case(seed, T, C)
    jump_c, vuv_c, ts = 0.35, 0.14, 0.5
    best = _brute_best_through(
        T, C, -strengths, _praat_trans_fn(freqs, jump_c, vuv_c, ts)
    )
    opt = best.min()
    path = np.asarray(
        _viterbi(
            jnp.asarray(freqs), jnp.asarray(strengths),
            jnp.asarray(ts), (jump_c, vuv_c),
        )
    )
    # every chosen state must lie on a globally optimal path
    chosen = best[np.arange(T), path]
    np.testing.assert_allclose(chosen, opt, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_viterbi_matches_brute_force(seed):
    T, C = 5, 3
    freqs, strengths = _praat_case(seed, T, C)
    jump_c, vuv_c, ts = 0.35, 0.14, 0.5
    best = _brute_best_through(
        T, C, -strengths, _praat_trans_fn(freqs, jump_c, vuv_c, ts)
    )
    lf = np.log2(np.where(freqs > 0, freqs, 1.0))
    v = (freqs > 0).astype(np.float32)
    path = np.asarray(
        viterbi_path_pallas(
            jnp.asarray(lf[None]), jnp.asarray(v[None]),
            jnp.asarray(-strengths[None]),
            jump_c * ts, 0.0, vuv_c * ts, True,
        )
    )[0]
    chosen = best[np.arange(T), path]
    np.testing.assert_allclose(chosen, best.min(), atol=1e-5)


def test_pallas_viterbi_matches_assoc_on_long_batch():
    """Kernel (interpret) and associative scan agree on realistic sizes,
    including T not a multiple of the time block and B > 1."""
    rng = np.random.default_rng(7)
    B, T, C = 3, 333, 15
    freqs = np.where(
        rng.random((B, T, C)) < 0.3, 0.0, rng.uniform(60, 500, (B, T, C))
    )
    freqs[:, :, 0] = 0.0
    # well-separated strengths avoid near-tie argmin flips between the two
    # summation orders
    strengths = np.round(rng.uniform(-0.5, 1.0, (B, T, C)), 2)
    jump_c, vuv_c, ts = 0.35, 0.14, 0.5

    ref = np.stack([
        np.asarray(_viterbi(
            jnp.asarray(freqs[i]), jnp.asarray(strengths[i]),
            jnp.asarray(ts), (jump_c, vuv_c),
        ))
        for i in range(B)
    ])
    lf = np.log2(np.where(freqs > 0, freqs, 1.0))
    v = (freqs > 0).astype(np.float32)
    out = np.asarray(viterbi_path_pallas(
        jnp.asarray(lf), jnp.asarray(v), jnp.asarray(-strengths),
        jump_c * ts, 0.0, vuv_c * ts, True,
    ))
    # identical up to exact near-ties; on rounded strengths they agree
    assert (out == ref).mean() > 0.995


def test_shs_viterbi_matches_brute_force():
    from robust_speech_analysis_framework_tpu.ops.shs_pitch import (
        ShsParams, _viterbi_state_inputs, _viterbi_path_assoc,
    )

    rng = np.random.default_rng(11)
    T, C = 5, 2
    params = ShsParams()
    freqs = np.where(
        rng.random((T, C)) < 0.4, 0.0, rng.uniform(60, 500, (T, C))
    )
    scores = rng.uniform(0, 1, (T, C))
    voicing = rng.uniform(0, 1, T)

    local, states_f, is_voiced = map(np.asarray, _viterbi_state_inputs(
        jnp.asarray(freqs), jnp.asarray(scores), jnp.asarray(voicing), params
    ))
    lf = np.log2(states_f)
    v = np.asarray(is_voiced)

    def trans(t1, i, t2, j):
        if v[t1, i] and v[t2, j]:
            return params.w_tvv * abs(lf[t1, i] - lf[t2, j])
        if bool(v[t1, i]) == bool(v[t2, j]):
            return params.w_tuu
        return params.w_tvuv

    S = C + 1
    best = _brute_best_through(T, S, local, trans)
    path = np.asarray(_viterbi_path_assoc(
        jnp.asarray(local), jnp.asarray(states_f),
        jnp.asarray(is_voiced), params,
    ))
    chosen = best[np.arange(T), path]
    np.testing.assert_allclose(chosen, best.min(), atol=1e-5)
