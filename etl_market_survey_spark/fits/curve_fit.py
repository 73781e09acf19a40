"""Pure-numpy Levenberg-Marquardt least squares.

A minimal, deterministic replacement for ``scipy.optimize.curve_fit``
(absent from this runtime). Finite-difference Jacobian, damped normal
equations, simple box bounds via parameter clipping. Deterministic: no
randomness, fixed iteration schedule — same inputs give bit-identical
outputs on any worker.

Used only inside ``applyInPandas`` workers on per-group data (hundreds of
histogram bins), so O(iter x n x p) is trivially cheap.
"""

from __future__ import annotations

import numpy as np


def curve_fit(
    f,
    x: np.ndarray,
    y: np.ndarray,
    p0: np.ndarray,
    bounds: tuple | None = None,
    max_iter: int = 200,
    tol: float = 1e-10,
) -> tuple[np.ndarray, bool]:
    """Least-squares fit of ``y ≈ f(x, *p)``. Returns (params, converged)."""
    p = np.asarray(p0, dtype=float).copy()
    lo, hi = (None, None)
    if bounds is not None:
        lo = np.asarray(bounds[0], dtype=float)
        hi = np.asarray(bounds[1], dtype=float)
        p = np.clip(p, lo, hi)

    def residuals(params):
        return y - f(x, *params)

    lam = 1e-3
    r = residuals(p)
    cost = float(r @ r)
    converged = False
    n_p = len(p)
    for _ in range(max_iter):
        # finite-difference Jacobian of residuals
        J = np.empty((len(x), n_p))
        for j in range(n_p):
            step = 1e-7 * max(abs(p[j]), 1e-7)
            pj = p.copy()
            pj[j] += step
            J[:, j] = (residuals(pj) - r) / step
        A = J.T @ J
        g = J.T @ r
        # damped normal equations; retry with larger damping on failure
        improved = False
        for _ in range(20):
            try:
                dp = np.linalg.solve(A + lam * np.diag(np.diag(A) + 1e-12), -g)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            p_new = p + dp
            if lo is not None:
                p_new = np.clip(p_new, lo, hi)
            r_new = residuals(p_new)
            cost_new = float(r_new @ r_new)
            if np.isfinite(cost_new) and cost_new < cost:
                rel = (cost - cost_new) / max(cost, 1e-300)
                p, r, cost = p_new, r_new, cost_new
                lam = max(lam / 10, 1e-12)
                improved = True
                if rel < tol:
                    converged = True
                break
            lam *= 10
        if not improved or converged:
            converged = converged or not improved and cost < np.inf
            break
    return p, bool(np.all(np.isfinite(p)))
