"""Goal-reaching kinematic MPC as a condensed box QP, batched on the MXU.

The reference's goal-MPC pipeline (deprecated/goal_mpc_node.py:63-306) solves
a linear-kinematic-bicycle MPC with cvxpy/OSQP (cvxpygen C) once per lattice
point — ">1.1 billion" points split over 45 joblib processes
(deprecated/goal_mpc_data_generator.py:7-36).  Problem per point: state
z = [x, y, v, yaw] over T+1 steps, controls u = [accel, steer_angle] over T
steps, dynamics linearized at (v = v_car, phi = 0, delta = 0)
(goal_mpc_node.py:246-285 get_model_matrix; the affine C term vanishes at
that operating point), quadratic goal-tracking cost with control and
control-difference penalties (goal_mpc_node.py:127-151), boxed steering /
acceleration / velocity and a steering-rate bound (goal_mpc_node.py:205-238).

TPU-first redesign instead of a per-problem OSQP call:

1. CONDENSE the states out.  With X = Sx x0 + Su U the problem becomes a
   16-dim box QP in U alone: P = Su'W Su + R + D'Rd D, constraints
   lo <= A_con U <= hi with A_con = [I; D_steer; Su_vel] (31 rows).
2. The matrices depend on the lattice point ONLY through v_car: every goal
   shares P, A_con, and the ADMM KKT factorization.  Factor ONCE per v_car
   family, then every ADMM iteration over a (G, 16) goal batch is two
   (G, 31)x(31, 16) / (G, 16)x(16, 16) matmuls — the whole lattice runs as
   a handful of MXU GEMMs per iteration instead of millions of solver calls.
3. v_car enters the matrices as a TRACED scalar, so the datagen loop over
   v_car values reuses one compiled program.

Outputs follow the reference ABI: speed = v_car + a_0 dt, steer = delta_0
(goal_mpc_node.py:96-98); goal ordering (x_g, y_g, v_g, t_g) matches the
state layout (goal_mpc_node.py:357-360 solve_mpc).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GoalMPCConfig(NamedTuple):
    """mpc_config parity (goal_mpc_node.py:19-50)."""

    horizon: int = 8  # TK
    dt: float = 0.05  # DTK
    wheelbase: float = 0.33  # WB
    r_accel: float = 0.01  # Rk diag
    r_steer: float = 5.0
    rd_accel: float = 0.05  # Rdk diag
    rd_steer: float = 50.0
    q_state: tuple = (5.0, 5.0, 10.0, 1.0)  # Qk diag on [x, y, v, yaw]
    qf_state: tuple = (15.0, 15.0, 10.0, 1.0)  # Qfk diag
    max_steer: float = 0.4189
    max_dsteer: float = float(np.deg2rad(180.0))
    max_speed: float = 10.0
    min_speed: float = -2.0
    max_accel: float = 10.0


class GoalQPFamily(NamedTuple):
    """Condensed QP family for one v_car linearization point."""

    P: jnp.ndarray  # (n, n) cost hessian, n = T*2
    A_con: jnp.ndarray  # (m, n) constraint rows
    lo: jnp.ndarray  # (m,)
    hi: jnp.ndarray  # (m,)
    Su: jnp.ndarray  # (T*4, n) prediction map
    x_free: jnp.ndarray  # (T*4,) zero-control rollout of x0 = [0,0,v,0]
    qw: jnp.ndarray  # (T*4,) stacked stage/terminal state weights


class GoalMPCSolution(NamedTuple):
    speed: jnp.ndarray  # (...,) reference ABI first-step outputs
    steer: jnp.ndarray  # (...,)
    controls: jnp.ndarray  # (..., T, 2) full [accel, steer] plan
    r_prim: jnp.ndarray  # (...,) final primal residual (inf norm)
    r_dual: jnp.ndarray  # (...,)
    converged: jnp.ndarray  # (...,) bool


def condensed_family(v_car, cfg: GoalMPCConfig,
                     dtype=jnp.float32) -> GoalQPFamily:
    """Build the condensed QP family for linearization speed ``v_car``.

    ``v_car`` may be a traced scalar — all v-dependence is smooth, so one
    compiled program covers every family in a datagen sweep.
    """
    T = cfg.horizon
    nx, nu = 4, 2
    n = T * nu
    v = jnp.asarray(v_car, dtype)
    dt = jnp.asarray(cfg.dt, dtype)

    # Ad/Bd at (v, phi=0, delta=0): goal_mpc_node.py:262-284. The affine C
    # (:279-282) is identically zero at phi=0, delta=0.
    Ad = jnp.asarray([[1, 0, cfg.dt, 0], [0, 1, 0, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]], dtype)
    Ad = Ad.at[1, 3].set(dt * v)  # dy/dyaw at phi=0
    Bd = jnp.zeros((nx, nu), dtype).at[2, 0].set(dt).at[3, 1].set(
        dt * v / cfg.wheelbase)

    # prediction: X = Sx x0 + Su U, X stacks x_1..x_T
    powers = [jnp.eye(nx, dtype=dtype)]
    for _ in range(T):
        powers.append(Ad @ powers[-1])
    Sx = jnp.concatenate(powers[1:], axis=0)  # (T*nx, nx)
    Su = jnp.zeros((T * nx, n), dtype)
    for k in range(1, T + 1):
        for j in range(k):
            Su = Su.at[(k - 1) * nx:k * nx, j * nu:(j + 1) * nu].set(
                powers[k - 1 - j] @ Bd)

    # stage weights: columns x_1..x_{T-1} get Qk, x_T gets Qfk
    # (goal_mpc_node.py:133-136 Q_block; the x_0 column's deviation is a
    # constant w.r.t. U and drops out of the argmin)
    qw = jnp.concatenate([
        jnp.tile(jnp.asarray(cfg.q_state, dtype), T - 1),
        jnp.asarray(cfg.qf_state, dtype)])

    # control-difference operator D: (T-1)*nu rows of u_{k+1} - u_k
    D = np.zeros(((T - 1) * nu, n), np.float64)
    for k in range(T - 1):
        for c in range(nu):
            D[k * nu + c, (k + 1) * nu + c] = 1.0
            D[k * nu + c, k * nu + c] = -1.0
    D = jnp.asarray(D, dtype)
    r_diag = jnp.tile(jnp.asarray([cfg.r_accel, cfg.r_steer], dtype), T)
    rd_diag = jnp.tile(jnp.asarray([cfg.rd_accel, cfg.rd_steer], dtype),
                       T - 1)
    W_Su = qw[:, None] * Su
    P = Su.T @ W_Su + jnp.diag(r_diag) + D.T @ (rd_diag[:, None] * D)

    # constraints: [controls box; steer-rate rows; velocity rows]
    steer_rows = np.zeros((T - 1, n), np.float64)
    for k in range(T - 1):
        steer_rows[k, (k + 1) * nu + 1] = 1.0
        steer_rows[k, k * nu + 1] = -1.0
    vel_sel = np.zeros((T, T * nx), np.float64)
    for k in range(T):
        vel_sel[k, k * nx + 2] = 1.0
    vel_rows = jnp.asarray(vel_sel, dtype) @ Su  # v_k - v_car as fn of U
    A_con = jnp.concatenate([jnp.eye(n, dtype=dtype),
                             jnp.asarray(steer_rows, dtype), vel_rows])

    u_lo = jnp.tile(jnp.asarray([-cfg.max_accel, -cfg.max_steer], dtype), T)
    u_hi = jnp.tile(jnp.asarray([cfg.max_accel, cfg.max_steer], dtype), T)
    d_bound = jnp.full((T - 1,), cfg.max_dsteer * cfg.dt, dtype)
    v_lo = jnp.full((T,), cfg.min_speed, dtype) - v
    v_hi = jnp.full((T,), cfg.max_speed, dtype) - v
    lo = jnp.concatenate([u_lo, -d_bound, v_lo])
    hi = jnp.concatenate([u_hi, d_bound, v_hi])

    # Row-normalize the constraint block: mixed row scales (unit control
    # boxes vs ~dt*sqrt(k) velocity rows) wreck the single-rho ADMM —
    # measured 1e-3 relative objective gap at 600 iterations unnormalized
    # vs 1e-14 at 300 with unit rows (+ over-relaxation, rho=1).
    row_norm = jnp.sqrt(jnp.sum(A_con * A_con, axis=1))
    A_con = A_con / row_norm[:, None]
    lo = lo / row_norm
    hi = hi / row_norm

    x0 = jnp.zeros((nx,), dtype).at[2].set(v)
    x_free = Sx @ x0
    return GoalQPFamily(P, A_con, lo, hi, Su, x_free, qw)


def _goal_vector(fam: GoalQPFamily, goals, cfg: GoalMPCConfig):
    """Linear cost term q(goal) = Su' W (x_free - g_rep): (G, 4) -> (G, n).

    ``goals`` columns are (x_g, y_g, v_g, t_g) — the reference's ref_state
    stacking order (goal_mpc_node.py:357)."""
    T = cfg.horizon
    g_rep = jnp.tile(goals, (1,) * (goals.ndim - 1) + (T,))  # (G, T*4)
    resid = fam.x_free - g_rep
    return (fam.qw * resid) @ fam.Su  # (G, n)


@partial(jax.jit, static_argnames=("cfg", "iters"))
def solve_goal_family(v_car, goals, cfg: GoalMPCConfig = GoalMPCConfig(),
                      iters: int = 300, sigma: float = 1e-6,
                      tol: float = 2e-3) -> GoalMPCSolution:
    """Solve every goal in ``goals`` (G, 4) at linearization speed ``v_car``.

    One Cholesky of the 16x16 ADMM KKT for the whole family; ``iters``
    fixed ADMM sweeps where each update is a (G, m)x(m, n) matmul.  Fixed
    iteration count (no per-row while_loop) keeps the batch a dense GEMM
    pipeline; ``converged`` reports the final inf-norm residuals against
    ``tol``.

    Matmuls are pinned to exact-f32 precision: the TPU's default bf16 MXU
    passes stall the iteration at r_prim ~1e-2 (15% convergence on the
    reference lattice); exact f32 converges 100% with r_prim ~2e-6 at the
    SAME measured throughput (~830k QPs/s/chip at 1200 iters) — these are
    tiny-K GEMMs, nowhere near the MXU roofline either way.
    """
    with jax.default_matmul_precision("float32"):
        return _solve_goal_family_impl(v_car, goals, cfg, iters, sigma, tol)


def _family_operands(v_car, goals, cfg, sigma):
    """Shared setup for both ADMM backends: family matrices, the speed-
    scaled rho, the factorized KKT inverse, and the per-goal linear terms.

    rho law: in unit-row constraint coordinates with over-relaxation
    alpha=1.6, the measured objective gap vs the SLSQP oracle is ~1e-14 at
    300 iterations (the OSQP-style mean-diag-P rho is ~36 here and needs 4x
    the iterations for 1e-3). rho grows with the linearization speed — P's
    yaw-coupling curvature scales ~v^2, and the measured optimum tracks
    max(1, |v|/2): at v=7.5, rho=4 converges 94% of the reference goal
    block in 300 sweeps / 100% in 600 where rho=1 reaches only 56% / 89%;
    at v<=3.5 the optimum is flat in [1, 2].
    """
    dtype = goals.dtype
    fam = condensed_family(v_car, cfg, dtype)
    n = fam.P.shape[0]
    rho = jnp.maximum(jnp.asarray(1.0, dtype),
                      jnp.abs(jnp.asarray(v_car, dtype)) * 0.5)
    kkt = fam.P + sigma * jnp.eye(n, dtype=dtype) + rho * (
        fam.A_con.T @ fam.A_con)
    chol = jax.scipy.linalg.cholesky(kkt, lower=True)
    kinv = jax.scipy.linalg.cho_solve((chol, True), jnp.eye(n, dtype=dtype))
    q = _goal_vector(fam, goals, cfg)  # (G, n)
    return fam, rho, kinv, q


def _solve_goal_family_impl(v_car, goals, cfg, iters, sigma, tol):
    dtype = goals.dtype
    fam, rho, kinv, q = _family_operands(v_car, goals, cfg, sigma)
    n = fam.P.shape[0]
    alpha = 1.6
    G = q.shape[0]
    x = jnp.zeros((G, n), dtype)
    z = jnp.clip(jnp.zeros((G, fam.A_con.shape[0]), dtype), fam.lo, fam.hi)
    u = jnp.zeros_like(z)

    def body(_, carry):
        x, z, u = carry
        rhs = sigma * x - q + (rho * (z - u)) @ fam.A_con  # (G, n)
        x = rhs @ kinv.T
        ax = alpha * (x @ fam.A_con.T) + (1.0 - alpha) * z  # (G, m)
        z_new = jnp.clip(ax + u, fam.lo, fam.hi)
        u = u + ax - z_new
        return x, z_new, u

    x, z, u = jax.lax.fori_loop(0, iters, body, (x, z, u))
    ax = x @ fam.A_con.T
    z_next = jnp.clip(ax + u, fam.lo, fam.hi)
    r_prim = jnp.max(jnp.abs(ax - z_next), axis=-1)
    r_dual = rho * jnp.max(jnp.abs((z_next - z) @ fam.A_con), axis=-1)
    converged = (r_prim < tol) & (r_dual < tol)

    controls = x.reshape(G, cfg.horizon, 2)
    speed = jnp.asarray(v_car, dtype) + controls[:, 0, 0] * cfg.dt
    steer = controls[:, 0, 1]
    return GoalMPCSolution(speed, steer, controls, r_prim, r_dual, converged)


@partial(jax.jit, static_argnames=("cfg", "iters", "tile_g", "interpret"))
def solve_goal_family_pallas(v_car, goals,
                             cfg: GoalMPCConfig = GoalMPCConfig(),
                             iters: int = 600, sigma: float = 1e-6,
                             tol: float = 2e-3, tile_g: int = 512,
                             interpret: bool = False) -> GoalMPCSolution:
    """solve_goal_family through the fused Pallas ADMM kernel.

    NOTE: measured 5x SLOWER than solve_goal_family on v5e — see the
    ops/pallas_admm.py docstring for the measurement and the why (batch-wide
    GEMM amortization beats VMEM residency for tiny-operand iterative
    solvers).  Kept as the hardware-bitwise-equal counterexample
    (tests/test_goal_mpc.py::test_pallas_admm_matches_xla_loop); use
    solve_goal_family for datagen and serving.
    """
    from irbfn_tpu.ops.pallas_admm import admm_solve_pallas

    goals = jnp.asarray(goals, jnp.float32)
    with jax.default_matmul_precision("float32"):
        fam, rho, kinv, q = _family_operands(v_car, goals, cfg, sigma)
    x, r_prim, r_dual = admm_solve_pallas(
        q, fam.A_con, kinv, fam.lo, fam.hi, rho, iters=iters, sigma=sigma,
        tile_g=tile_g, interpret=interpret)
    converged = (r_prim < tol) & (r_dual < tol)
    controls = x.reshape(x.shape[0], cfg.horizon, 2)
    speed = jnp.asarray(v_car, jnp.float32) + controls[:, 0, 0] * cfg.dt
    steer = controls[:, 0, 1]
    return GoalMPCSolution(speed, steer, controls, r_prim, r_dual, converged)


def solve_goal_lattice_sharded(v_car, goals, cfg: GoalMPCConfig =
                               GoalMPCConfig(), iters: int = 1200,
                               mesh=None, batch_per_device: int = 262144,
                               progress: bool = False):
    """DP-sharded family solve: the goal block splits across the mesh's
    data axis (parallel.datagen.solve_lattice_sharded), the family matrices
    replicate, and XLA runs each shard's ADMM GEMMs locally — zero
    collectives in the iteration loop.  Returns reduced host outputs
    {speed, steer, converged} (N,), the table columns — the full control
    plans stay on device (through the dev tunnel a (N, T, 2) fetch is the
    bottleneck, CLAUDE.md host-link note).
    """
    from irbfn_tpu.parallel.datagen import solve_lattice_sharded

    def fn(g, v):
        sol = solve_goal_family(v, g, cfg, iters=iters)
        return {"speed": sol.speed, "steer": sol.steer,
                "converged": sol.converged}

    return solve_lattice_sharded(fn, goals, mesh=mesh,
                                 args=(jnp.asarray(v_car),),
                                 batch_per_device=batch_per_device,
                                 progress=progress)


@partial(jax.jit, static_argnames=("cfg", "iters"))
def solve_tracking_mpc(x0, ref_traj, path_predict,
                       cfg: GoalMPCConfig = GoalMPCConfig(),
                       iters: int = 600, sigma: float = 1e-6,
                       tol: float = 2e-3) -> GoalMPCSolution:
    """LTV trajectory-tracking kinematic MPC, batched over rows.

    The reference's waypoint-tracking node (deprecated/mpc_node.py:65-350):
    per-step linearization at (v_t, phi_t) from ``path_predict`` with the
    nonzero affine C term (get_model_matrix, :251-284), per-step references
    from ``ref_traj``, same cost/constraint family as the goal MPC but with
    MIN_SPEED = 0 (:49 — the tracker never reverses).

    Args:
        x0: (..., 4) initial state [x, y, v, yaw].
        ref_traj: (..., T+1, 4) reference states (column 0 is dropped — a
            constant w.r.t. U, matching the cvxpy objective's xk[:, 0]).
        path_predict: (..., T, 4) operating points; only v (col 2) and
            yaw (col 3) enter the model matrices (mpc_prob_solve :292-296).
    Returns:
        GoalMPCSolution (speed/steer first-step ABI + full control plan).

    TPU-first: the LTV condensation (static T-step loops of (..., 4, 4)
    batched matmuls), the per-row 16x16 KKT inverse, and the ADMM sweeps
    are all natively batched over leading axes — one device dispatch for
    any number of tracking problems (the reference: one OSQP per call).
    """
    with jax.default_matmul_precision("float32"):
        return _solve_tracking_impl(x0, ref_traj, path_predict, cfg, iters,
                                    sigma, tol)


def _solve_tracking_impl(x0, ref_traj, path_predict, cfg, iters, sigma, tol):
    dtype = x0.dtype
    T = cfg.horizon
    nx, nu = 4, 2
    n = T * nu
    batch = x0.shape[:-1]
    dt = jnp.asarray(cfg.dt, dtype)
    wb = cfg.wheelbase

    v_seq = path_predict[..., 2]  # (..., T)
    phi_seq = path_predict[..., 3]

    def model_mats(v, phi):
        """get_model_matrix at delta=0 (mpc_node.py:251-284), batched."""
        z = jnp.zeros_like(v)
        o = jnp.ones_like(v)
        co, si = jnp.cos(phi), jnp.sin(phi)
        A = jnp.stack([
            jnp.stack([o, z, dt * co, -dt * v * si], -1),
            jnp.stack([z, o, dt * si, dt * v * co], -1),
            jnp.stack([z, z, o, z], -1),
            jnp.stack([z, z, z, o], -1)], -2)  # (..., 4, 4); tan(0)/wb = 0
        B = jnp.stack([
            jnp.stack([z, z], -1), jnp.stack([z, z], -1),
            jnp.stack([dt * o, z], -1),
            jnp.stack([z, dt * v / wb], -1)], -2)  # (..., 4, 2)
        C = jnp.stack([dt * v * si * phi, -dt * v * co * phi, z, z], -1)
        return A, B, C

    A_t = [None] * T
    B_t = [None] * T
    C_t = [None] * T
    for t in range(T):
        A_t[t], B_t[t], C_t[t] = model_mats(v_seq[..., t], phi_seq[..., t])

    # condense: x_k = Phi_k x0 + sum_j Phi_{k-1..j+1} (B_j u_j + C_j)
    Su_blocks = [[None] * T for _ in range(T)]  # [k-1][j]
    x_aff = [None] * T  # Phi_k x0 + accumulated C
    phi_x = x0
    for k in range(T):
        # advance affine part: x_{k+1}^aff = A_k x^aff + C_k
        phi_x = jnp.einsum("...ij,...j->...i", A_t[k], phi_x) + C_t[k]
        x_aff[k] = phi_x
        # new column j=k gets B_k; older columns multiply by A_k
        for j in range(k):
            Su_blocks[k][j] = jnp.einsum("...ij,...jk->...ik", A_t[k],
                                         Su_blocks[k - 1][j])
        Su_blocks[k][k] = B_t[k]
    Su = jnp.concatenate([
        jnp.concatenate([Su_blocks[k][j] if j <= k else
                         jnp.zeros(batch + (nx, nu), dtype)
                         for j in range(T)], axis=-1)
        for k in range(T)], axis=-2)  # (..., T*nx, n)
    x_free = jnp.concatenate(x_aff, axis=-1)  # (..., T*nx)

    qw = jnp.concatenate([
        jnp.tile(jnp.asarray(cfg.q_state, dtype), T - 1),
        jnp.asarray(cfg.qf_state, dtype)])
    ref_flat = ref_traj[..., 1:, :].reshape(batch + (T * nx,))
    q = jnp.einsum("...i,...ij->...j", qw * (x_free - ref_flat), Su)

    # static pieces shared with the goal family
    D = np.zeros(((T - 1) * nu, n), np.float64)
    steer_rows = np.zeros((T - 1, n), np.float64)
    for k in range(T - 1):
        for c in range(nu):
            D[k * nu + c, (k + 1) * nu + c] = 1.0
            D[k * nu + c, k * nu + c] = -1.0
        steer_rows[k, (k + 1) * nu + 1] = 1.0
        steer_rows[k, k * nu + 1] = -1.0
    D = jnp.asarray(D, dtype)
    r_diag = jnp.tile(jnp.asarray([cfg.r_accel, cfg.r_steer], dtype), T)
    rd_diag = jnp.tile(jnp.asarray([cfg.rd_accel, cfg.rd_steer], dtype),
                       T - 1)
    W_Su = qw[..., :, None] * Su
    P = (jnp.einsum("...ji,...jk->...ik", Su, W_Su)
         + jnp.diag(r_diag) + D.T @ (rd_diag[:, None] * D))

    vel_sel = np.zeros((T, T * nx), np.float64)
    for k in range(T):
        vel_sel[k, k * nx + 2] = 1.0
    vel_sel = jnp.asarray(vel_sel, dtype)
    vel_rows = jnp.einsum("ij,...jk->...ik", vel_sel, Su)  # (..., T, n)
    ident = jnp.broadcast_to(jnp.eye(n, dtype=dtype), batch + (n, n))
    sr = jnp.broadcast_to(jnp.asarray(steer_rows, dtype),
                          batch + steer_rows.shape)
    A_con = jnp.concatenate([ident, sr, vel_rows], axis=-2)  # (..., m, n)

    u_lo = jnp.tile(jnp.asarray([-cfg.max_accel, -cfg.max_steer], dtype), T)
    u_hi = jnp.tile(jnp.asarray([cfg.max_accel, cfg.max_steer], dtype), T)
    d_bound = jnp.full((T - 1,), cfg.max_dsteer * cfg.dt, dtype)
    # tracker velocity box: [0, MAX_SPEED] (mpc_node.py:49 MIN_SPEED = 0),
    # on the velocity STATE: v_k - (x_free velocity part) bounds shift
    v_aff = jnp.einsum("ij,...j->...i", vel_sel, x_free)  # (..., T)
    v_lo = jnp.zeros(batch + (T,), dtype) - v_aff
    v_hi = jnp.full(batch + (T,), cfg.max_speed, dtype) - v_aff
    lo = jnp.concatenate([
        jnp.broadcast_to(u_lo, batch + (n,)),
        jnp.broadcast_to(-d_bound, batch + (T - 1,)), v_lo], axis=-1)
    hi = jnp.concatenate([
        jnp.broadcast_to(u_hi, batch + (n,)),
        jnp.broadcast_to(d_bound, batch + (T - 1,)), v_hi], axis=-1)

    # row-normalize (same measured convergence reasoning as the goal family)
    row_norm = jnp.sqrt(jnp.sum(A_con * A_con, axis=-1))
    A_con = A_con / row_norm[..., None]
    lo = lo / row_norm
    hi = hi / row_norm

    rho = jnp.asarray(1.0, dtype)
    alpha = 1.6
    kkt = (P + sigma * jnp.eye(n, dtype=dtype)
           + rho * jnp.einsum("...ji,...jk->...ik", A_con, A_con))
    kinv = jnp.linalg.inv(kkt)  # one (..., 16, 16) inverse per row

    m = A_con.shape[-2]
    x = jnp.zeros(batch + (n,), dtype)
    z = jnp.clip(jnp.zeros(batch + (m,), dtype), lo, hi)
    u = jnp.zeros_like(z)

    def body(_, carry):
        x, z, u = carry
        rhs = sigma * x - q + jnp.einsum("...ji,...j->...i", A_con,
                                         rho * (z - u))
        x = jnp.einsum("...ij,...j->...i", kinv, rhs)
        ax = alpha * jnp.einsum("...ij,...j->...i", A_con, x) \
            + (1.0 - alpha) * z
        z_new = jnp.clip(ax + u, lo, hi)
        u = u + ax - z_new
        return x, z_new, u

    x, z, u = jax.lax.fori_loop(0, iters, body, (x, z, u))
    ax = jnp.einsum("...ij,...j->...i", A_con, x)
    z_next = jnp.clip(ax + u, lo, hi)
    r_prim = jnp.max(jnp.abs(ax - z_next), axis=-1)
    r_dual = rho * jnp.max(
        jnp.abs(jnp.einsum("...ji,...j->...i", A_con, z_next - z)), axis=-1)
    converged = (r_prim < tol) & (r_dual < tol)

    controls = x.reshape(batch + (T, nu))
    speed = x0[..., 2] + controls[..., 0, 0] * cfg.dt
    steer = controls[..., 0, 1]
    return GoalMPCSolution(speed, steer, controls, r_prim, r_dual, converged)


def solve_goal_mpc(inputs, cfg: GoalMPCConfig = GoalMPCConfig(),
                   iters: int = 300) -> GoalMPCSolution:
    """Reference-ABI row solve: inputs (N, 5) columns
    (v_car, x_goal, y_goal, t_goal, v_goal) — the datagen/table layout
    (goal_mpc_data_generator.py:34-52, goal_mpc_node.py:356-366) — each row
    with its own linearization.  vmapped family build per row; prefer
    :func:`solve_goal_family` for lattices where v_car repeats.
    """
    inputs = jnp.atleast_2d(inputs)
    goals = inputs[:, jnp.asarray([1, 2, 4, 3])]  # (x_g, y_g, v_g, t_g)

    def row(v, g):
        sol = solve_goal_family(v, g[None], cfg, iters=iters)
        return jax.tree.map(lambda a: a[0], sol)

    return jax.vmap(row)(inputs[:, 0], goals)
