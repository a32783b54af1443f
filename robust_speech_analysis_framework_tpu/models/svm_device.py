"""Batched linear C-SVC SMO solver on device.

The reference fits its SVM folds strictly sequentially through libsvm
(src/cv_strategies.py:49-53,136-137: 5 standard folds with Platt
calibration = 30 libsvm solves; a nested run adds 5×5×3 grid fits). Each
problem here is tiny (≤ ~110×50 after SelectKBest), so the TPU win is not
one solve but ALL of them: every (fold × grid-point × calibration-fold)
fit stacks into one lane of a single ``jax.vmap``'d SMO ``lax.while_loop``
program — one dispatch, one fetch, every iteration's two matvecs running
lane-batched on the MXU.

The solver is the same maximal-violating-pair SMO with the libsvm
stopping rule as the host implementation (models/svm.py:_smo_linear); it
converges to the same C-SVC dual optimum, in f32 (TPUs have no f64), so
weights agree with the f64 host solver to ~1e-3 — well inside the
fold-level metric tolerance (agreement is pinned by tests).

Lane padding conventions:
- rows: pad with ``valid=False`` rows (excluded from pair selection; zero
  feature rows contribute nothing to w);
- features: pad with zero columns (their w entries stay exactly 0), so
  lanes with different SelectKBest k share one shape.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def smo_linear_batch(
    X: np.ndarray,
    y_pm: np.ndarray,
    valid: np.ndarray,
    C: float = 1.0,
    tol: float = 1e-3,
    max_iter: int = 100_000,
    defer: bool = False,
):
    """Solve L independent linear C-SVC duals as one device program.

    Args:
      X: (L, n, d) float32 — zero rows where invalid, zero columns for
        feature padding.
      y_pm: (L, n) ±1 labels (value at invalid rows is ignored).
      valid: (L, n) bool row mask.

    Returns ``(w, b, n_iter)`` as host arrays — shapes (L, d), (L,), (L,) —
    or device arrays when ``defer`` (caller fetches with its own collect).
    """
    import jax
    import jax.numpy as jnp

    X = np.ascontiguousarray(X, np.float32)
    y_pm = np.ascontiguousarray(y_pm, np.float32)
    valid = np.ascontiguousarray(valid, bool)

    fn = _get_solver(X.shape, float(C), float(tol), int(max_iter))
    w, b, it = fn(jnp.asarray(X), jnp.asarray(y_pm), jnp.asarray(valid))
    if defer:
        return w, b, it
    return np.asarray(w), np.asarray(b), np.asarray(it)


_SOLVER_CACHE: dict = {}


def _get_solver(shape, C: float, tol: float, max_iter: int):
    key = (shape, C, tol, max_iter)
    fn = _SOLVER_CACHE.get(key)
    if fn is None:
        fn = _SOLVER_CACHE[key] = _build_solver(C, tol, max_iter)
    return fn


def _build_solver(C: float, tol: float, max_iter: int):
    import jax
    import jax.numpy as jnp
    from jax import lax

    # host-side scalar: a jnp scalar here would live on the device and be
    # fetched back across the (flaky, tunneled) link at every fresh-process
    # lowering when it's embedded as an MLIR constant
    NEG = np.float32(-1e30)

    def solve_one(X, y, valid):
        n = X.shape[0]
        sq = jnp.einsum("ij,ij->i", X, X)

        def up_low(alpha):
            up = valid & (((y > 0) & (alpha < C)) | ((y < 0) & (alpha > 0)))
            low = valid & (((y > 0) & (alpha > 0)) | ((y < 0) & (alpha < C)))
            return up, low

        def cond(state):
            _, _, it, done = state
            return (~done) & (it < max_iter)

        def body(state):
            alpha, grad, it, done = state
            yg = -y * grad
            up, low = up_low(alpha)
            i = jnp.argmax(jnp.where(up, yg, NEG))
            j = jnp.argmin(jnp.where(low, yg, -NEG))
            m_val, M_val = yg[i], yg[j]
            has_pair = up.any() & low.any()
            converged = (~has_pair) | (m_val - M_val <= tol)

            Kij = X[i] @ X[j]
            eta = jnp.maximum(sq[i] + sq[j] - 2.0 * Kij, 1e-12)
            lam = (m_val - M_val) / eta
            lam = jnp.minimum(
                lam, jnp.where(y[i] > 0, C - alpha[i], alpha[i])
            )
            lam = jnp.minimum(
                lam, jnp.where(y[j] > 0, alpha[j], C - alpha[j])
            )
            # host-solver semantics: a non-positive feasible step means a
            # numerically stuck state — stop (``if lam <= 0: break``)
            take = (~converged) & (lam > 0)
            lam = jnp.where(take, lam, 0.0)
            alpha = alpha.at[i].add(y[i] * lam)
            alpha = alpha.at[j].add(-y[j] * lam)
            grad = grad + lam * y * (X @ X[i] - X @ X[j])
            return alpha, grad, it + 1, done | (~take)

        alpha0 = jnp.zeros(n, jnp.float32)
        grad0 = -jnp.ones(n, jnp.float32)
        alpha, grad, it, _ = lax.while_loop(
            cond, body, (alpha0, grad0, jnp.int32(0), jnp.bool_(False))
        )

        yg = -y * grad
        up, low = up_low(alpha)
        m_val = jnp.max(jnp.where(up, yg, NEG))
        M_val = jnp.min(jnp.where(low, yg, -NEG))
        m_val = jnp.where(up.any(), m_val, 0.0)
        M_val = jnp.where(low.any(), M_val, 0.0)
        free = valid & (alpha > 1e-12) & (alpha < C - 1e-12)
        n_free = jnp.sum(free)
        b_free = jnp.sum(jnp.where(free, yg, 0.0)) / jnp.maximum(n_free, 1)
        b = jnp.where(n_free > 0, b_free, (m_val + M_val) / 2.0)
        w = (alpha * y) @ X
        return w, b, it

    return jax.jit(jax.vmap(solve_one))
