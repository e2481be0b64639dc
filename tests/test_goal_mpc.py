"""Goal-MPC condensed QP: SLSQP oracle agreement + reference semantics.

The oracle solves the SAME condensed problem (built from the family
matrices, f64) with scipy SLSQP — an independent optimizer adjudicating the
shared-factorization ADMM path (the reference's cvxpy/OSQP role,
deprecated/goal_mpc_node.py:286-318).
"""

import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from irbfn_tpu.solvers.goal_mpc import (
    GoalMPCConfig,
    condensed_family,
    solve_goal_family,
    solve_goal_mpc,
)

CFG = GoalMPCConfig()


def _oracle(v_car, goal, cfg=CFG):
    """f64 SLSQP on the condensed QP; returns (U*, objective*)."""
    fam = condensed_family(jnp.asarray(v_car, jnp.float64), cfg,
                           dtype=jnp.float64)
    P = np.asarray(fam.P)
    g_rep = np.tile(np.asarray(goal, np.float64), cfg.horizon)
    q = (np.asarray(fam.qw) * (np.asarray(fam.x_free) - g_rep)) @ np.asarray(
        fam.Su)
    A = np.asarray(fam.A_con)
    lo, hi = np.asarray(fam.lo), np.asarray(fam.hi)

    def f(u):
        return 0.5 * u @ P @ u + q @ u

    def fgrad(u):
        return P @ u + q

    cons = [
        {"type": "ineq", "fun": lambda u: A @ u - lo, "jac": lambda u: A},
        {"type": "ineq", "fun": lambda u: hi - A @ u, "jac": lambda u: -A},
    ]
    res = minimize(f, np.zeros(P.shape[0]), jac=fgrad, method="SLSQP",
                   constraints=cons, options={"maxiter": 400, "ftol": 1e-12})
    if not res.success:  # SLSQP occasionally stalls; the row is skipped
        return None, None
    return res.x, res.fun


def _objective(v_car, goal, u, cfg=CFG):
    fam = condensed_family(jnp.asarray(v_car, jnp.float64), cfg,
                           dtype=jnp.float64)
    g_rep = np.tile(np.asarray(goal, np.float64), cfg.horizon)
    q = (np.asarray(fam.qw) * (np.asarray(fam.x_free) - g_rep)) @ np.asarray(
        fam.Su)
    P = np.asarray(fam.P)
    u = np.asarray(u, np.float64)
    return 0.5 * u @ P @ u + q @ u


def test_goal_mpc_matches_slsqp_oracle():
    """24 random lattice rows: ADMM objective within 1e-8 relative of SLSQP
    (often BELOW it — negative gaps) and first controls within 1e-3."""
    rng = np.random.default_rng(0)
    n = 24
    v_car = rng.uniform(-1.0, 8.0, n)
    goals = np.stack([rng.uniform(-1.2, 4.0, n), rng.uniform(0.0, 4.0, n),
                      rng.uniform(-1.0, 8.0, n),
                      rng.uniform(-3.14, 3.14, n)], axis=1)
    checked = 0
    for i in range(n):
        u_star, f_star = _oracle(v_car[i], goals[i])
        if u_star is None:
            continue
        sol = solve_goal_family(jnp.asarray(v_car[i], jnp.float64),
                                jnp.asarray(goals[None, i], jnp.float64),
                                iters=1200)
        f_admm = _objective(v_car[i], goals[i],
                            np.asarray(sol.controls[0]).reshape(-1))
        scale = max(abs(f_star), 1.0)
        assert (f_admm - f_star) / scale < 1e-8, (i, f_admm, f_star)
        np.testing.assert_allclose(float(sol.controls[0, 0, 0]),
                                   u_star[0], atol=1e-3)
        np.testing.assert_allclose(float(sol.controls[0, 0, 1]),
                                   u_star[1], atol=1e-3)
        assert bool(sol.converged[0])
        checked += 1
    assert checked >= 18, f"only {checked} oracle rows solved"


def test_goal_mpc_constraints_respected():
    """Aggressive goals: every constraint row holds at the ADMM solution."""
    rng = np.random.default_rng(1)
    n = 64
    v_car = jnp.asarray(rng.uniform(-1.0, 8.0, n), jnp.float64)
    goals = jnp.asarray(
        np.stack([rng.uniform(-1.2, 4.0, n), rng.uniform(0.0, 4.0, n),
                  rng.uniform(-1.0, 8.0, n), rng.uniform(-3.14, 3.14, n)],
                 axis=1), jnp.float64)
    inputs = jnp.stack([v_car, goals[:, 0], goals[:, 1], goals[:, 3],
                        goals[:, 2]], axis=1)
    sol = solve_goal_mpc(inputs, iters=1200)
    u = np.asarray(sol.controls)  # (n, T, 2)
    tol = 5e-3
    assert np.all(np.abs(u[:, :, 0]) <= CFG.max_accel + tol)
    assert np.all(np.abs(u[:, :, 1]) <= CFG.max_steer + tol)
    dsteer = np.abs(np.diff(u[:, :, 1], axis=1))
    assert np.all(dsteer <= CFG.max_dsteer * CFG.dt + tol)
    # velocity rollout stays boxed
    v_traj = np.asarray(v_car)[:, None] + CFG.dt * np.cumsum(u[:, :, 0],
                                                             axis=1)
    assert np.all(v_traj <= CFG.max_speed + tol)
    assert np.all(v_traj >= CFG.min_speed - tol)


def test_goal_mpc_reference_abi_semantics():
    """Goal dead ahead at the current speed -> near-zero steer, speed ~
    v_car; faster goal -> accelerate; lateral goal -> steer toward it.
    Output ABI: speed = v_car + a_0 dt, steer = delta_0
    (goal_mpc_node.py:96-98)."""
    v = 3.0
    ahead = jnp.asarray([[v, v * CFG.dt * CFG.horizon, 0.0, 0.0, v]],
                        jnp.float64)
    sol = solve_goal_mpc(ahead, iters=600)
    np.testing.assert_allclose(float(sol.steer[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(sol.speed[0]), v, atol=0.05)
    np.testing.assert_allclose(
        float(sol.speed[0]),
        v + float(sol.controls[0, 0, 0]) * CFG.dt, rtol=1e-12)

    faster = jnp.asarray([[1.0, 3.0, 0.0, 0.0, 6.0]], jnp.float64)
    assert float(solve_goal_mpc(faster, iters=600).speed[0]) > 1.0

    left = jnp.asarray([[3.0, 1.0, 2.0, 0.5, 3.0]], jnp.float64)
    assert float(solve_goal_mpc(left, iters=600).steer[0]) > 0.01


def test_goal_family_matches_row_solver():
    """The shared-factorization family path equals the per-row vmapped path
    (same v_car) — the datagen fast path is exact, not an approximation."""
    rng = np.random.default_rng(2)
    G = 32
    goals = np.stack([rng.uniform(-1.2, 4.0, G), rng.uniform(0.0, 4.0, G),
                      rng.uniform(-1.0, 8.0, G),
                      rng.uniform(-3.14, 3.14, G)], axis=1)
    v = 4.5
    fam_sol = solve_goal_family(jnp.asarray(v, jnp.float64),
                                jnp.asarray(goals, jnp.float64), iters=400)
    inputs = np.concatenate([np.full((G, 1), v), goals[:, :2],
                             goals[:, 3:4], goals[:, 2:3]], axis=1)
    row_sol = solve_goal_mpc(jnp.asarray(inputs, jnp.float64), iters=400)
    np.testing.assert_allclose(np.asarray(fam_sol.speed),
                               np.asarray(row_sol.speed), atol=1e-10)
    np.testing.assert_allclose(np.asarray(fam_sol.steer),
                               np.asarray(row_sol.steer), atol=1e-10)


def test_goal_mpc_f32_close_to_f64():
    """The TPU-serving dtype tracks the f64 solution on first controls."""
    rng = np.random.default_rng(3)
    G = 64
    goals = np.stack([rng.uniform(-1.2, 4.0, G), rng.uniform(0.0, 4.0, G),
                      rng.uniform(-1.0, 8.0, G),
                      rng.uniform(-3.14, 3.14, G)], axis=1)
    v = 2.5
    s64 = solve_goal_family(jnp.asarray(v, jnp.float64),
                            jnp.asarray(goals, jnp.float64), iters=400)
    s32 = solve_goal_family(jnp.asarray(v, jnp.float32),
                            jnp.asarray(goals, jnp.float32), iters=400)
    np.testing.assert_allclose(np.asarray(s32.steer), np.asarray(s64.steer),
                               atol=3e-3)
    np.testing.assert_allclose(np.asarray(s32.speed), np.asarray(s64.speed),
                               atol=3e-3)


def test_goal_mpc_planner_closed_loop_oval():
    """Solver-backed GoalMPCPlanner drives the oval through the gym's speed
    control mode (the reference node's deployment shape,
    goal_mpc_node.py + mpc_node.py) with small tracking error."""
    from irbfn_tpu.dynamics.params import f1tenth_params
    from irbfn_tpu.planning import GoalMPCPlanner
    from irbfn_tpu.sim import TrackEnv, deviation_metrics, oval_track

    track = oval_track(n_samples=256, speed=2.5)
    env = TrackEnv(track, f1tenth_params(dtype=jnp.float32),
                   control_mode="speed")
    planner = GoalMPCPlanner(track, iters=300)
    sim = env.reset(s0=0.0, speed0=1.0, batch_shape=(1,))

    def policy(obs):
        speed, steer = planner.plan_batch(obs.pose_x, obs.pose_y,
                                          obs.pose_theta, obs.linear_vel_x)
        return jnp.stack([speed, steer], axis=-1)

    final, traj = env.rollout(sim, policy, n_steps=120)
    assert not bool(final.done[0])
    prog = float(final.s[0] - sim.s[0])
    assert prog > 20.0, f"only {prog:.1f} m progress"
    ey_mean, _ = deviation_metrics(traj)
    ey_mean = float(np.asarray(ey_mean).mean())
    assert ey_mean < 0.15, f"mean|ey| {ey_mean:.3f}"


def _ltv_qp(x0, ref, pp, cfg=CFG):
    """Dense f64 rebuild of the LTV tracking QP (independent numpy path) ->
    (P, q, A, lo, hi) for the SLSQP oracle."""
    T, nx, nu = cfg.horizon, 4, 2
    n = T * nu
    dt, wb = cfg.dt, cfg.wheelbase

    def mats(v, phi):
        A = np.eye(nx)
        A[0, 2] = dt * np.cos(phi)
        A[0, 3] = -dt * v * np.sin(phi)
        A[1, 2] = dt * np.sin(phi)
        A[1, 3] = dt * v * np.cos(phi)
        B = np.zeros((nx, nu))
        B[2, 0] = dt
        B[3, 1] = dt * v / wb
        C = np.array([dt * v * np.sin(phi) * phi,
                      -dt * v * np.cos(phi) * phi, 0.0, 0.0])
        return A, B, C

    As, Bs, Cs = zip(*[mats(pp[t, 2], pp[t, 3]) for t in range(T)])
    Su = np.zeros((T * nx, n))
    x_aff = np.zeros((T, nx))
    phi_x = np.asarray(x0, np.float64)
    blocks = {}
    for k in range(T):
        phi_x = As[k] @ phi_x + Cs[k]
        x_aff[k] = phi_x
        for j in range(k):
            blocks[(k, j)] = As[k] @ blocks[(k - 1, j)]
        blocks[(k, k)] = Bs[k]
        for j in range(k + 1):
            Su[k * nx:(k + 1) * nx, j * nu:(j + 1) * nu] = blocks[(k, j)]
    qw = np.concatenate([np.tile(cfg.q_state, T - 1), cfg.qf_state])
    ref_flat = np.asarray(ref, np.float64)[1:].reshape(-1)
    q = (qw * (x_aff.reshape(-1) - ref_flat)) @ Su
    D = np.zeros(((T - 1) * nu, n))
    steer_rows = np.zeros((T - 1, n))
    for k in range(T - 1):
        for c in range(nu):
            D[k * nu + c, (k + 1) * nu + c] = 1.0
            D[k * nu + c, k * nu + c] = -1.0
        steer_rows[k, (k + 1) * nu + 1] = 1.0
        steer_rows[k, k * nu + 1] = -1.0
    P = (Su.T @ (qw[:, None] * Su) + np.diag(np.tile(
        [cfg.r_accel, cfg.r_steer], T)) + D.T @ (np.tile(
            [cfg.rd_accel, cfg.rd_steer], T - 1)[:, None] * D))
    vel = Su[2::4]  # velocity rows of x_1..x_T
    v_aff = x_aff[:, 2]
    A = np.concatenate([np.eye(n), steer_rows, vel])
    lo = np.concatenate([np.tile([-cfg.max_accel, -cfg.max_steer], T),
                         np.full(T - 1, -cfg.max_dsteer * cfg.dt),
                         0.0 - v_aff])
    hi = np.concatenate([np.tile([cfg.max_accel, cfg.max_steer], T),
                         np.full(T - 1, cfg.max_dsteer * cfg.dt),
                         cfg.max_speed - v_aff])
    return P, q, A, lo, hi


def test_tracking_mpc_matches_slsqp_oracle():
    """LTV tracker vs SLSQP on random curving references (nonzero phi ->
    the affine C path is exercised)."""
    from irbfn_tpu.solvers.goal_mpc import solve_tracking_mpc

    rng = np.random.default_rng(4)
    T = CFG.horizon
    checked = 0
    for i in range(12):
        v0 = rng.uniform(0.5, 6.0)
        x0 = np.array([0.0, 0.0, v0, rng.uniform(-0.4, 0.4)])
        phis = x0[3] + np.cumsum(rng.uniform(-0.15, 0.15, T))
        vs = np.clip(v0 + np.cumsum(rng.uniform(-0.3, 0.3, T)), 0.2, 8.0)
        pp = np.zeros((T, 4))
        pp[:, 2], pp[:, 3] = vs, phis
        ref = np.zeros((T + 1, 4))
        ref[:, 0] = np.cumsum(np.r_[0.0, vs * CFG.dt * np.cos(phis)])
        ref[:, 1] = np.cumsum(np.r_[0.0, vs * CFG.dt * np.sin(phis)])
        ref[:, 2] = np.r_[v0, vs]
        ref[:, 3] = np.r_[x0[3], phis]

        P, q, A, lo, hi = _ltv_qp(x0, ref, pp)
        res = minimize(lambda u: 0.5 * u @ P @ u + q @ u, np.zeros(16),
                       jac=lambda u: P @ u + q, method="SLSQP",
                       constraints=[
                           {"type": "ineq", "fun": lambda u: A @ u - lo,
                            "jac": lambda u: A},
                           {"type": "ineq", "fun": lambda u: hi - A @ u,
                            "jac": lambda u: -A}],
                       options={"maxiter": 400, "ftol": 1e-12})
        if not res.success:
            continue
        sol = solve_tracking_mpc(jnp.asarray(x0[None], jnp.float64),
                                 jnp.asarray(ref[None], jnp.float64),
                                 jnp.asarray(pp[None], jnp.float64),
                                 iters=1200)
        u_admm = np.asarray(sol.controls[0]).reshape(-1)
        f_admm = 0.5 * u_admm @ P @ u_admm + q @ u_admm
        scale = max(abs(res.fun), 1.0)
        assert (f_admm - res.fun) / scale < 1e-8, (i, f_admm, res.fun)
        np.testing.assert_allclose(u_admm[:2], res.x[:2], atol=1e-3)
        assert bool(sol.converged[0])
        checked += 1
    assert checked >= 9, f"only {checked} oracle rows solved"


def test_tracking_mpc_reduces_to_goal_mpc_at_phi0():
    """With phi=0 operating points, constant-v path_predict, a constant
    reference, and the goal family's v_min, the LTV tracker solves the SAME
    QP as the goal family (C vanishes, matrices collapse to the LTI case)."""
    from irbfn_tpu.solvers.goal_mpc import solve_tracking_mpc

    v = 3.0
    T = CFG.horizon
    goal = np.array([1.5, 1.0, 3.5, 0.4])  # (x, y, v, yaw)
    x0 = np.array([0.0, 0.0, v, 0.0])
    pp = np.zeros((T, 4))
    pp[:, 2] = v
    ref = np.tile(goal, (T + 1, 1))
    # min_speed: goal family allows reverse (-2); match by keeping the
    # solution away from v=0 (all speeds here are ~3)
    sol_t = solve_tracking_mpc(jnp.asarray(x0[None], jnp.float64),
                               jnp.asarray(ref[None], jnp.float64),
                               jnp.asarray(pp[None], jnp.float64),
                               iters=1200)
    sol_g = solve_goal_family(jnp.asarray(v, jnp.float64),
                              jnp.asarray(goal[None], jnp.float64),
                              iters=1200)
    np.testing.assert_allclose(float(sol_t.speed[0]), float(sol_g.speed[0]),
                               atol=1e-5)
    np.testing.assert_allclose(float(sol_t.steer[0]), float(sol_g.steer[0]),
                               atol=1e-5)


def test_goal_lattice_sharded_matches_direct():
    """DP-sharded goal-block solve on the 8-device mesh equals the direct
    single-device family solve (SURVEY 2.7 DP coverage for the new solver)."""
    from irbfn_tpu.solvers.goal_mpc import solve_goal_lattice_sharded

    rng = np.random.default_rng(5)
    G = 64
    goals = np.stack([rng.uniform(-1.2, 4.0, G), rng.uniform(0.0, 4.0, G),
                      rng.uniform(-1.0, 8.0, G),
                      rng.uniform(-3.14, 3.14, G)],
                     axis=1).astype(np.float32)
    v = np.float32(2.5)
    out = solve_goal_lattice_sharded(v, goals, iters=300,
                                     batch_per_device=8)
    direct = solve_goal_family(jnp.asarray(v), jnp.asarray(goals), iters=300)
    np.testing.assert_allclose(out["speed"], np.asarray(direct.speed),
                               atol=1e-6)
    np.testing.assert_allclose(out["steer"], np.asarray(direct.steer),
                               atol=1e-6)
    np.testing.assert_array_equal(out["converged"],
                                  np.asarray(direct.converged))


def test_pallas_admm_matches_xla_loop():
    """The fused Pallas ADMM kernel (interpret mode on CPU) equals the XLA
    fori_loop path bit-for-bit in semantics: same solution, residuals, and
    convergence flags."""
    from irbfn_tpu.solvers.goal_mpc import solve_goal_family_pallas

    rng = np.random.default_rng(7)
    G = 96
    goals = np.stack([rng.uniform(-1.2, 4.0, G), rng.uniform(0.0, 4.0, G),
                      rng.uniform(-1.0, 8.0, G),
                      rng.uniform(-3.14, 3.14, G)],
                     axis=1).astype(np.float32)
    v = jnp.asarray(4.5, jnp.float32)
    ref = solve_goal_family(v, jnp.asarray(goals), iters=300)
    pal = solve_goal_family_pallas(v, jnp.asarray(goals), iters=300,
                                   tile_g=32, interpret=True)
    np.testing.assert_allclose(np.asarray(pal.speed), np.asarray(ref.speed),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pal.steer), np.asarray(ref.steer),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pal.controls),
                               np.asarray(ref.controls), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pal.r_prim),
                               np.asarray(ref.r_prim), atol=5e-5)
    assert (np.asarray(pal.converged) == np.asarray(ref.converged)).all()
