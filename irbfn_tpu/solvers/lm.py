"""Batched Levenberg-Marquardt nonlinear least-squares.

Replaces the reference's per-point native solver calls (IPOPT via CasADi,
reference N1/N2 in SURVEY.md §2.6) for problems that reduce to least squares.
Designed for TPU lattices:

- the iteration is a ``lax.while_loop`` with a *fixed* maximum trip count and
  per-problem convergence masks, so the whole lattice stays dense under
  ``vmap``/``shard_map`` — no divergent control flow;
- Jacobians come from ``jax.jacfwd`` on the residual (decision dims here are
  tiny: 3-12), and the normal equations are solved with Cholesky on the
  (n, n) system — XLA batches thousands of these small factorizations;
- everything is shape-static; failures are reported as a boolean mask plus
  final residual norm instead of exceptions (the reference encodes failures
  as -999 sentinel rows, nonlinear_dmpc_frenet.py:637-639).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LMResult(NamedTuple):
    x: jnp.ndarray  # solution estimate (..., n)
    residual_norm: jnp.ndarray  # final ||r||_2 (...,)
    iterations: jnp.ndarray  # iterations taken (...,)
    converged: jnp.ndarray  # bool mask (...,)


def _lm_single(residual_fn: Callable, x0: jnp.ndarray, args,
               max_iters: int, tol: float, lambda0: float,
               lambda_min: float, lambda_max: float) -> LMResult:
    n = x0.shape[-1]
    eye = jnp.eye(n, dtype=x0.dtype)

    def res_and_jac(x):
        r = residual_fn(x, args)
        J = jax.jacfwd(lambda xx: residual_fn(xx, args))(x)
        return r, J

    def cost(x):
        r = residual_fn(x, args)
        return jnp.dot(r, r)

    def body(state):
        x, lam, it, done = state
        r, J = res_and_jac(x)
        g = J.T @ r
        H = J.T @ J
        # damped normal equations; scaled (Marquardt) damping keeps the step
        # well-conditioned when residual dimensions have mixed scales
        A = H + lam * (jnp.diag(jnp.diagonal(H)) + 1e-12 * eye)
        step = jax.scipy.linalg.cho_solve(
            (jax.scipy.linalg.cholesky(A + 1e-12 * eye, lower=True), True), g)
        x_new = x - step
        c_old = jnp.dot(r, r)
        c_new = cost(x_new)
        improved = c_new < c_old
        x = jnp.where(improved & ~done, x_new, x)
        lam = jnp.where(done, lam,
                        jnp.where(improved, jnp.maximum(lam * 0.33, lambda_min),
                                  jnp.minimum(lam * 3.0, lambda_max)))
        new_done = done | (jnp.sqrt(jnp.minimum(c_old, c_new)) < tol)
        it = it + jnp.where(done, 0, 1)
        return x, lam, it, new_done

    def cond(state):
        _, _, it, done = state
        return (it < max_iters) & ~done

    x0 = jnp.asarray(x0)
    lam0 = jnp.asarray(lambda0, dtype=x0.dtype)
    state = (x0, lam0, jnp.asarray(0), jnp.asarray(False))
    x, lam, it, done = jax.lax.while_loop(cond, body, state)
    rnorm = jnp.linalg.norm(residual_fn(x, args))
    return LMResult(x, rnorm, it, rnorm < tol)


@partial(jax.jit, static_argnames=("residual_fn", "max_iters"))
def levenberg_marquardt(residual_fn: Callable, x0: jnp.ndarray, args=None,
                        max_iters: int = 50, tol: float = 1e-10,
                        lambda0: float = 1e-3, lambda_min: float = 1e-12,
                        lambda_max: float = 1e8) -> LMResult:
    """Solve ``min_x ||residual_fn(x, args)||^2``, batched over leading axes.

    Args:
        residual_fn: ``(x (n,), args) -> r (m,)`` for a *single* problem;
            batching is applied here with vmap.
        x0: initial guesses ``(..., n)``.
        args: pytree of per-problem parameters; leaves must have matching
            leading batch axes (or be None for a single unbatched solve).
    """
    solve = partial(_lm_single, residual_fn, max_iters=max_iters, tol=tol,
                    lambda0=lambda0, lambda_min=lambda_min,
                    lambda_max=lambda_max)
    batch_shape = x0.shape[:-1]
    if not batch_shape:
        return solve(x0, args)
    flat_x0 = x0.reshape((-1, x0.shape[-1]))
    flat_args = jax.tree.map(
        lambda a: jnp.reshape(a, (-1,) + a.shape[len(batch_shape):]), args)
    out = jax.vmap(lambda x, a: solve(x, a))(flat_x0, flat_args)
    return LMResult(*[jnp.reshape(o, batch_shape + o.shape[1:]) for o in out])
