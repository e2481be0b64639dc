"""QP/ADMM solver and linear-MPC tests (OSQP-replacement correctness)."""

import jax.numpy as jnp
import numpy as np

from irbfn_tpu.solvers.qp import (
    double_integrator_mpc,
    solve_linear_mpc_batch,
    solve_qp_batch,
)


def test_qp_unconstrained_matches_linear_solve():
    rng = np.random.default_rng(0)
    n = 6
    M = rng.normal(size=(n, n))
    P = jnp.asarray(M @ M.T + n * np.eye(n))
    q = jnp.asarray(rng.normal(size=n))
    A = jnp.eye(n)
    lo = jnp.full((n,), -1e6)
    hi = jnp.full((n,), 1e6)
    sol = solve_qp_batch(P, q, A, lo, hi)
    expected = np.linalg.solve(np.asarray(P), -np.asarray(q))
    np.testing.assert_allclose(sol.x, expected, rtol=1e-5, atol=1e-6)
    assert bool(sol.converged)


def test_qp_active_box():
    """1-D: min 0.5 x^2 - 10 x s.t. x <= 2 -> x* = 2."""
    P = jnp.asarray([[1.0]])
    q = jnp.asarray([-10.0])
    A = jnp.asarray([[1.0]])
    sol = solve_qp_batch(P, q, A, jnp.asarray([-5.0]), jnp.asarray([2.0]))
    np.testing.assert_allclose(sol.x, [2.0], atol=1e-6)


def test_qp_batched():
    rng = np.random.default_rng(1)
    B, n = 8, 4
    Ms = rng.normal(size=(B, n, n))
    P = jnp.asarray(np.einsum("bij,bkj->bik", Ms, Ms) + 5 * np.eye(n))
    q = jnp.asarray(rng.normal(size=(B, n)))
    A = jnp.broadcast_to(jnp.eye(n), (B, n, n))
    lo = jnp.full((B, n), -0.5)
    hi = jnp.full((B, n), 0.5)
    sol = solve_qp_batch(P, q, A, lo, hi)
    assert (np.abs(np.asarray(sol.x)) <= 0.5 + 1e-6).all()
    # each solution satisfies projected stationarity
    for b in range(B):
        g = np.asarray(P[b]) @ np.asarray(sol.x[b]) + np.asarray(q[b])
        pg = np.asarray(sol.x[b]) - np.clip(np.asarray(sol.x[b]) - g, -0.5, 0.5)
        assert np.linalg.norm(pg) < 1e-4


def test_linear_mpc_shared_path_converges_and_is_optimal():
    """The condensed-MPC shared-P ADMM must converge across a state lattice
    (the quadrotor datagen regime where the generic path converged 23%) and
    satisfy projected stationarity of the true condensed QP."""
    from irbfn_tpu.solvers.qp import condense

    mpc = double_integrator_mpc()
    rng = np.random.default_rng(0)
    B = 256
    x0 = jnp.asarray(rng.uniform([-3, -3, -2, -2], [3, 3, 2, 2],
                                 (B, 4)).astype(np.float32))
    goal = jnp.zeros((B, 4), jnp.float32)
    controls, sol = solve_linear_mpc_batch(mpc, x0, goal, iters=1000)
    assert float(np.mean(np.asarray(sol.converged))) == 1.0
    assert float(np.percentile(np.asarray(sol.iterations), 99)) < 200

    T = mpc.horizon
    Sx, Su = (np.asarray(m, np.float64) for m in condense(mpc))
    qw = np.concatenate([np.tile(np.asarray(mpc.Q), T - 1), np.asarray(mpc.Qf)])
    P = Su.T @ (qw[:, None] * Su) + np.diag(np.tile(np.asarray(mpc.R), T))
    lo = np.tile(np.asarray(mpc.u_lo), T)
    hi = np.tile(np.asarray(mpc.u_hi), T)
    u = np.asarray(controls, np.float64).reshape(B, -1)
    g = u @ P + (Su.T @ (qw[:, None] * (Sx @ np.asarray(x0, np.float64).T))).T
    pg = u - np.clip(u - g, lo, hi)
    assert float(np.abs(pg).max()) < 5e-3


def test_double_integrator_mpc_reaches_goal():
    mpc = double_integrator_mpc(dt=0.1, horizon=20, u_max=5.0)
    x0 = jnp.asarray([[0.0, 0.0, 0.0, 0.0], [1.0, -1.0, 0.0, 0.0]])
    goal = jnp.asarray([[1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0]])
    controls, sol = solve_linear_mpc_batch(mpc, x0, goal, iters=800)
    assert controls.shape == (2, 20, 2)
    assert (np.abs(np.asarray(controls)) <= 5.0 + 1e-5).all()
    # roll forward and check the endpoint approaches the goal
    x = np.asarray(x0)
    Ad, Bd = np.asarray(mpc.Ad), np.asarray(mpc.Bd)
    for k in range(20):
        x = x @ Ad.T + np.asarray(controls[:, k]) @ Bd.T
    np.testing.assert_allclose(x[:, :2], np.asarray(goal)[:, :2], atol=0.1)
