"""Batched ADMM quadratic programming (OSQP replacement, native component N4).

The reference's deprecated goal-MPC pipeline solves linear-kinematic MPC QPs
with cvxpy/OSQP and cvxpygen-generated C (deprecated/goal_mpc_node.py:11-16,
2D_quadrotor_MPC.py) — per-problem native calls behind a process pool.  Here
the OSQP algorithm itself (ADMM splitting on ``Ax = z``, z boxed) is a
fixed-iteration jittable loop, vmapped across problem lattices:

    min 0.5 x^T P x + q^T x   s.t.  lo <= A x <= hi

Factorize once per problem (the KKT matrix is iteration-invariant for fixed
rho), iterate x/z/u updates; thousands of small factorizations batch on the
MXU.  Also provides a condensed linear-MPC builder (the goal-MPC problem
family) on top.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class QPSolution(NamedTuple):
    x: jnp.ndarray  # (..., n)
    primal_residual: jnp.ndarray  # (...,)
    dual_residual: jnp.ndarray  # (...,)
    iterations: jnp.ndarray
    converged: jnp.ndarray


# Over-relaxation: measured (solvers/goal_mpc.py) to roughly halve the
# iterations to a given residual on the goal-MPC family; standard OSQP range.
_ALPHA = 1.6


def _solve_single_qp(P, q, A, lo, hi, rho, sigma, iters, tol):
    n = P.shape[0]
    m = A.shape[0]
    dtype = P.dtype
    if rho is None:
        # scale-aware penalty (OSQP-style): match the cost curvature scale
        rho = jnp.clip(jnp.mean(jnp.diagonal(P)), 1e-3, 1e3)
    kkt = P + sigma * jnp.eye(n, dtype=dtype) + rho * (A.T @ A)
    chol = jax.scipy.linalg.cholesky(kkt, lower=True)

    def body(state):
        x, z, u, it, done = state
        rhs = sigma * x - q + A.T @ (rho * (z - u))
        x_new = jax.scipy.linalg.cho_solve((chol, True), rhs)
        ax_true = A @ x_new
        ax = _ALPHA * ax_true + (1.0 - _ALPHA) * z
        z_new = jnp.clip(ax + u, lo, hi)
        u_new = u + ax - z_new
        r_prim = jnp.linalg.norm(ax_true - z_new)
        r_dual = rho * jnp.linalg.norm(A.T @ (z_new - z))
        new_done = done | ((r_prim < tol) & (r_dual < tol))
        return x_new, z_new, u_new, it + 1, new_done

    def cond(state):
        _, _, _, it, done = state
        return (it < iters) & ~done

    x0 = jnp.zeros((n,), dtype)
    z0 = jnp.clip(A @ x0, lo, hi)
    u0 = jnp.zeros((m,), dtype)
    x, z, u, it, done = jax.lax.while_loop(cond, body, (x0, z0, u0, 0, False))
    ax = A @ x
    r_prim = jnp.linalg.norm(ax - jnp.clip(ax, lo, hi))
    r_dual = jnp.linalg.norm(P @ x + q + A.T @ (rho * u))
    return QPSolution(x, r_prim, r_dual, it, done)


@partial(jax.jit, static_argnames=("iters",))
def solve_qp_batch(P, q, A, lo, hi, rho: float | None = None,
                   sigma: float = 1e-6, iters: int = 2000,
                   tol: float = 1e-8) -> QPSolution:
    """Solve a batch of box-constrained QPs.

    Matmuls are pinned to exact f32: the TPU's default bf16 MXU passes stall
    the ADMM residuals around 1e-2-1e-3, far above useful tolerances (same
    measured failure as solvers/goal_mpc.py, see CLAUDE.md ADMM lesson).

    Args:
        P: (..., n, n) PSD cost; q: (..., n); A: (..., m, n); lo/hi: (..., m)
    """
    batch_shape = q.shape[:-1]
    solve = partial(_solve_single_qp, rho=rho, sigma=sigma, iters=iters,
                    tol=tol)
    with jax.default_matmul_precision("float32"):
        if not batch_shape:
            return solve(P, q, A, lo, hi)
        flat = lambda a, tail: a.reshape((-1,) + a.shape[len(batch_shape):])
        out = jax.vmap(solve)(flat(P, 2), flat(q, 1), flat(A, 2), flat(lo, 1),
                              flat(hi, 1))
    return QPSolution(*[jnp.reshape(o, batch_shape + o.shape[1:]) for o in out])


@partial(jax.jit, static_argnames=("iters",))
def _solve_box_qp_shared(P, q, lo, hi, rho: float = 1.0,
                         sigma: float = 1e-6, iters: int = 1000,
                         tol: float = 1e-4) -> QPSolution:
    """ADMM for a batch sharing one P with identity constraints (lo<=x<=hi).

    The condensed-MPC family: only the linear term q varies across the
    lattice.  One KKT inverse serves every problem and each sweep is a single
    (B, n) x (n, n) matmul on the MXU — vs the generic path's per-problem
    vmapped Cholesky (measured 236 -> ~1e5+ solves/s on the quadrotor
    lattice).  A = I means unit constraint rows, so a SCALE-MATCHED rho is
    what matters: `solve_linear_mpc_batch` passes rho = mean(diag P), which
    balances the x-update (P + rho I) against the projection the same way
    the goal-MPC row-normalized family achieves with rho = 1 on unit-scale
    P (solvers/goal_mpc.py rho law; rho = 1 there because row normalization
    already puts P on unit scale — here P carries the condensed-MPC scale).
    """
    n = P.shape[-1]
    dtype = P.dtype
    with jax.default_matmul_precision("float32"):
        kinv = jnp.linalg.inv(P + (sigma + rho) * jnp.eye(n, dtype=dtype))

        x0 = jnp.zeros_like(q)
        z0 = jnp.clip(x0, lo, hi)
        u0 = jnp.zeros_like(q)
        it0 = jnp.zeros(q.shape[:-1], jnp.int32)
        done0 = jnp.zeros(q.shape[:-1], bool)

        def body(state):
            x, z, u, it, done, k = state
            rhs = sigma * x - q + rho * (z - u)
            x_new = rhs @ kinv  # kinv symmetric
            ax = _ALPHA * x_new + (1.0 - _ALPHA) * z
            z_new = jnp.clip(ax + u, lo, hi)
            u_new = u + ax - z_new
            r_prim = jnp.max(jnp.abs(x_new - z_new), axis=-1)
            r_dual = rho * jnp.max(jnp.abs(z_new - z), axis=-1)
            done_new = done | ((r_prim < tol) & (r_dual < tol))
            it_new = it + (~done_new).astype(jnp.int32)
            return x_new, z_new, u_new, it_new, done_new, k + 1

        def cond(state):
            *_, done, k = state
            return (k < iters) & ~jnp.all(done)

        x, z, u, it, done, _ = jax.lax.while_loop(
            cond, body, (x0, z0, u0, it0, done0, 0))
        r_prim = jnp.max(jnp.abs(x - jnp.clip(x, lo, hi)), axis=-1)
        r_dual = jnp.max(jnp.abs(q + x @ P + rho * u), axis=-1)
    return QPSolution(x, r_prim, r_dual, it, done)


# ------------------------------------------------------------- linear MPC

class LinearMPC(NamedTuple):
    """Condensed linear MPC: x_{k+1} = Ad x_k + Bd u_k, boxed controls and
    selected boxed states, quadratic goal-tracking cost.

    This is the problem family of the reference's goal-MPC / 2D-quadrotor
    pipelines (deprecated/goal_mpc_node.py, 2D_quadrotor_MPC.py:7-60).
    """

    Ad: jnp.ndarray  # (nx, nx)
    Bd: jnp.ndarray  # (nx, nu)
    Q: jnp.ndarray  # (nx,) stage state weights
    Qf: jnp.ndarray  # (nx,) terminal weights
    R: jnp.ndarray  # (nu,) control weights
    horizon: int
    u_lo: jnp.ndarray  # (nu,)
    u_hi: jnp.ndarray


def condense(mpc: LinearMPC):
    """Prediction matrices: X = Sx x0 + Su U (U stacked (T*nu,)).

    Returns f64 numpy (not device arrays): the matrices are x0-independent
    constants, and keeping them host-side lets `solve_linear_mpc_batch` be
    called from inside an outer jit trace (e.g. a closed-loop `lax.scan`)
    without turning constants into tracers.
    """
    nx, nu = mpc.Bd.shape
    T = mpc.horizon
    Ad = np.asarray(mpc.Ad, np.float64)
    Bd = np.asarray(mpc.Bd, np.float64)
    powers = [np.eye(nx)]
    for _ in range(T):
        powers.append(Ad @ powers[-1])
    Sx = np.concatenate([powers[k] for k in range(1, T + 1)], axis=0)
    Su = np.zeros((T * nx, T * nu))
    for k in range(1, T + 1):
        for j in range(k):
            Su[(k - 1) * nx:k * nx, j * nu:(j + 1) * nu] = (
                powers[k - 1 - j] @ Bd)
    return Sx, Su


def solve_linear_mpc_batch(mpc: LinearMPC, x0: jnp.ndarray,
                           goal: jnp.ndarray, iters: int = 1000,
                           tol: float = 1e-4) -> tuple[jnp.ndarray, QPSolution]:
    """Batched condensed linear-MPC solve -> (controls (..., T, nu), sol).

    Cost: sum_k (x_k-g)^T Q (x_k-g) + u^T R u + terminal Qf; boxed controls.
    The condensed problem shares P across the whole batch with A = I, so this
    routes to the shared-operand ADMM (one KKT inverse, MXU sweeps) rather
    than the generic per-problem-Cholesky path.
    """
    nx, nu = mpc.Bd.shape
    T = mpc.horizon
    # All problem data except q is x0/goal-independent: build it in numpy so
    # this stays usable inside an outer jit trace (mpc fields are concrete).
    Sx, Su = (np.asarray(m, np.float64) for m in condense(mpc))
    qw = np.concatenate([np.tile(np.asarray(mpc.Q), T - 1),
                         np.asarray(mpc.Qf)])  # (T*nx,)
    W_Su = qw[:, None] * Su
    P_np = Su.T @ W_Su + np.diag(np.tile(np.asarray(mpc.R), T))
    rho = float(np.clip(np.mean(np.diagonal(P_np)), 1e-3, 1e3))

    # q = Su^T diag(qw) (Sx x0 - g_rep)
    g_rep = jnp.tile(goal, (1,) * (goal.ndim - 1) + (T,))
    resid = jnp.einsum("ij,...j->...i", jnp.asarray(Sx, jnp.float32), x0) - g_rep
    q = jnp.einsum("ji,...j->...i", jnp.asarray(W_Su, jnp.float32), resid)

    batch_shape = q.shape[:-1]
    lo = np.tile(np.asarray(mpc.u_lo), T).astype(np.float32)
    hi = np.tile(np.asarray(mpc.u_hi), T).astype(np.float32)
    sol = _solve_box_qp_shared(jnp.asarray(P_np, jnp.float32), q,
                               jnp.broadcast_to(jnp.asarray(lo), q.shape),
                               jnp.broadcast_to(jnp.asarray(hi), q.shape),
                               rho=rho, iters=iters, tol=tol)
    return sol.x.reshape(batch_shape + (T, nu)), sol


def double_integrator_mpc(dt: float = 0.1, horizon: int = 10,
                          u_max: float = 2.0) -> LinearMPC:
    """2-D double-integrator MPC (the quadrotor domain,
    deprecated/2D_quadrotor_MPC.py): state [px, py, vx, vy], control [ax, ay]."""
    Ad = jnp.asarray([[1, 0, dt, 0], [0, 1, 0, dt],
                      [0, 0, 1, 0], [0, 0, 0, 1]], jnp.float32)
    Bd = jnp.asarray([[0.5 * dt**2, 0], [0, 0.5 * dt**2],
                      [dt, 0], [0, dt]], jnp.float32)
    return LinearMPC(Ad, Bd, Q=jnp.asarray([10.0, 10.0, 1.0, 1.0]),
                     Qf=jnp.asarray([50.0, 50.0, 5.0, 5.0]),
                     R=jnp.asarray([0.1, 0.1]), horizon=horizon,
                     u_lo=jnp.asarray([-u_max, -u_max]),
                     u_hi=jnp.asarray([u_max, u_max]))
