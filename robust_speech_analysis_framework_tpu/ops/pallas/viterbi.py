"""Pallas TPU kernel: candidate-level Viterbi forward costs.

Both pitch path finders (Praat AC/CC pitch, ops.pitch._viterbi, reference
src/mshds_extractor.py:104; openSMILE cPitchSmootherViterbi,
ops.shs_pitch.viterbi_smooth, Androids.conf:190-213) share one recurrence
over per-frame candidate states:

    c[0][j] = local[0][j]
    c[t][j] = min_i( c[t-1][i] + trans(t-1→t)[i][j] ) + local[t][j]

    trans[i][j] = w_vv·|lf_i − lf_j|  if both states voiced
                  w_same              if same voicing (u→u)
                  w_diff              if voicing changes

(`lf` = log2 frequency; the two schemes differ only in weights and local
costs: Praat uses local = −strength, w_same = 0; openSMILE uses explicit
local costs and a w_tuu unvoiced-run weight.)

The ``lax.associative_scan`` formulation used on non-TPU backends
materializes (T, C, C) min-plus cost matrices whose trailing C×C dims tile
at ~11% occupancy in the TPU's (8, 128) vector registers — profiled at
~85% of the whole batched-pitch program (pad/slice/add traffic). This
kernel instead runs the recurrence sequentially with the (B, C) state in
VMEM scratch, streaming candidate blocks through the sequential TPU grid:
per step only ~B·C² fused VPU ops, no (T, C, C) intermediates in HBM.

The *suffix* completions d[t] (best cost of finishing from each state,
needed to pick a globally-optimal state per frame without backtracking)
come from the SAME kernel on the time-flipped inputs: trans is symmetric
in (i, j), so with e := fwd(flip(lf), flip(v), flip(local)),

    d[t] = flip(e)[t] − local[t],   winner[t] = argmin_j c[t][j] + d[t][j].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _auto_block_t(b: int, requested: int) -> int:
    # Mosaic pads the minor candidate dim to the 128-lane tile: per step
    # each (B, C) row costs B×128×4 bytes; 4 arrays, double-buffered.
    per_step = 8 * b * 128 * 4
    block = requested
    while block > 8 and block * per_step > _VMEM_BUDGET_BYTES:
        block //= 2
    return max(block, 8)


def _kernel(lf_ref, v_ref, local_ref, out_ref, c_ref, plf_ref, pv_ref,
            *, block_t: int, w_vv: float, w_same: float, w_diff: float):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _init():
        c0 = local_ref[0]
        c_ref[:] = c0
        plf_ref[:] = lf_ref[0]
        pv_ref[:] = v_ref[0]
        out_ref[0] = c0

    start = jnp.where(pl.program_id(0) == 0, 1, 0)

    def step(t, carry):
        c, plf, pv = carry
        lf_t = lf_ref[t]
        v_t = v_ref[t]
        both = (pv[:, :, None] > 0.0) & (v_t[:, None, :] > 0.0)
        same = (pv[:, :, None] > 0.0) == (v_t[:, None, :] > 0.0)
        jump = jnp.abs(plf[:, :, None] - lf_t[:, None, :])
        trans = jnp.where(
            both, w_vv * jump, jnp.where(same, w_same, w_diff)
        )
        cnew = jnp.min(c[:, :, None] + trans, axis=1) + local_ref[t]
        out_ref[t] = cnew
        return cnew, lf_t, v_t

    c, plf, pv = jax.lax.fori_loop(
        start, block_t, step, (c_ref[:], plf_ref[:], pv_ref[:])
    )
    c_ref[:] = c
    plf_ref[:] = plf
    pv_ref[:] = pv


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _forward_costs(lf, v, local, w_vv, w_same, w_diff,
                   block_t: int = 128, interpret: bool = False):
    """Forward Viterbi costs c (B, T, C) for (B, T, C) candidate stacks.

    Padded tail steps (T rounded up to a block multiple) edge-replicate the
    last frame — the same convention as the bucketed single-file path — and
    are sliced off before returning.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c = lf.shape
    block_t = _auto_block_t(b, block_t)
    t_pad = -(-t // block_t) * block_t

    def prep(a):
        a = jnp.transpose(a, (1, 0, 2)).astype(jnp.float32)  # (T, B, C)
        return jnp.pad(a, ((0, t_pad - t), (0, 0), (0, 0)), mode="edge")

    lf_t, v_t, local_t = prep(lf), prep(v), prep(local)

    grid = (t_pad // block_t,)
    spec = pl.BlockSpec((block_t, b, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, block_t=block_t, w_vv=float(w_vv),
                w_same=float(w_same), w_diff=float(w_diff)),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, b, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b, c), jnp.float32),
            pltpu.VMEM((b, c), jnp.float32),
            pltpu.VMEM((b, c), jnp.float32),
        ],
        interpret=interpret,
    )(lf_t, v_t, local_t)
    return jnp.transpose(out[:t], (1, 0, 2))


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def viterbi_path_pallas(lf, v, local, w_vv, w_same, w_diff,
                        interpret: bool = False):
    """Globally-optimal state index per frame, (B, T).

    lf: log2 candidate frequency (any finite value for unvoiced slots);
    v: >0 where the candidate is a voiced state; local: per-state local
    cost (−strength for Praat pitch). Weights are static floats.
    """
    c = _forward_costs(lf, v, local, w_vv, w_same, w_diff,
                       interpret=interpret)
    e = _forward_costs(lf[:, ::-1], v[:, ::-1], local[:, ::-1],
                       w_vv, w_same, w_diff, interpret=interpret)
    d = e[:, ::-1] - local
    return jnp.argmin(c + d, axis=-1)


def viterbi_pallas_available() -> bool:
    return jax.default_backend() == "tpu"
