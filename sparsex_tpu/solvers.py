"""Iterative solvers built on the CSX SpMV kernels.

The reference ships SpMV as the terminal kernel plus the vector algebra
needed to write solvers on top (``spx_vec_*``); the BASELINE configs call
for a CG loop on symmetric CSX.  ``cg`` works with any of the library's
executors (CsxMatrix, SymCsxMatrix, ShardedCsx) — the loop is a
``lax.while_loop`` so the whole solve stays on device inside one jit.
"""

from __future__ import annotations

from typing import Callable, Tuple


def cg(matvec: Callable, b, x0=None, *, tol: float = 1e-8,
       maxiter: int = 1000) -> Tuple:
    """Conjugate gradients: solve A x = b for s.p.d. A.

    ``matvec(x) -> A @ x``.  Returns (x, iterations, final residual norm).
    """
    import jax
    import jax.numpy as jnp

    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    r = b - matvec(x)
    p = r
    rs = jnp.vdot(r, r)
    tol2 = jnp.asarray(tol, dtype=b.dtype) ** 2 * jnp.vdot(b, b)

    def cond(state):
        _x, _r, _p, rs_, it = state
        return (rs_ > tol2) & (it < maxiter)

    def body(state):
        x, r, p, rs_, it = state
        ap = matvec(p)
        alpha = rs_ / jnp.vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / rs_) * p
        return (x, r, p, rs_new, it + 1)

    x, r, p, rs, it = jax.lax.while_loop(cond, body, (x, r, p, rs, 0))
    return x, it, jnp.sqrt(rs)
