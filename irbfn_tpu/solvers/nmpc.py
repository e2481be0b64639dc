"""Batched NMPC trajectory-optimization solver (IPOPT/CasADi replacement).

Solves the reference's Frenet-frame NMPC problem (reference
``src/irbfn_mpc/nonlinear_dmpc_frenet.py:332-470``):

    min_{U}  sum_{k=0}^{T-1} (x_k - x_g)^T Q (x_k - x_g) + u_k^T R u_k
    s.t.     x_{k+1} = RK4(x_k, u_k; curv),  x_0 given
             u in [u_lo, u_hi]   (accel, steer-vel boxes)
             delta_k, vx_k in state boxes

and the Cartesian variant (``nonlinear_dmpc.py``). The reference solves each
lattice point with one IPOPT interior-point call behind a process pool; here
the whole lattice is ONE dense XLA computation:

- **single shooting**: the RK4 multiple-shooting equalities are eliminated
  exactly by rolling the dynamics forward in a ``lax.scan``, leaving a 10-dim
  decision vector (T=5 steps x 2 controls) per point;
- **projected Gauss-Newton / LM** on the squared-residual form of the cost,
  with control boxes enforced by projection (clip) each step;
- **augmented Lagrangian** on the state boxes (delta, vx), giving crisp
  active sets and near-exact constraint satisfaction with few outer updates;
- fixed iteration counts inside ``lax.while_loop``/``fori_loop`` so the
  computation is shape-static and maps densely onto vmap/shard_map lattices;
- failures surface as a feasibility mask (replacing the -999 sentinel rows of
  ``nonlinear_dmpc_frenet.py:637-639``) plus the active-constraint one-hot in
  the reference's ``lam_g`` layout (``:633``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from irbfn_tpu.dynamics.frenet import frenet_deriv
from irbfn_tpu.dynamics.params import VehicleParams, fullscale_params
from irbfn_tpu.dynamics.single_track import st_mixed_deriv


@dataclass(frozen=True)
class NMPCConfig:
    """Frenet NMPC problem constants (reference dmpc_frenet mpc_config)."""

    horizon: int = 5
    dt: float = 0.1
    q_diag: tuple = (0.0, 65.0, 0.0, 0.5, 5.0, 0.0, 15.0)
    r_diag: tuple = (0.01, 1.0)
    # terminal-state weight: the Frenet oracle has none (cost stages are
    # X[:,0..T-1], dmpc_frenet.py:424-428); the Cartesian oracle adds Qf on
    # X[:,T] (nonlinear_dmpc.py:349)
    qf_diag: tuple | None = None
    # dynamics model: "frenet" (speed-switched frenet ST) or "cartesian"
    # (tanh-blended cartesian ST, nonlinear_dmpc.py:259-325)
    model: str = "frenet"
    # boxes
    max_accel: float = 9.51
    max_dsteer: float = float(np.pi)
    max_steer: float = 0.4189
    max_speed: float = 10.0
    min_speed: float = 0.0
    v_switch: float = 1.0
    # solver: moderate penalty growth — the AL multipliers carry constraint
    # enforcement; a large final rho makes the max(0,.)^2 walls so stiff that
    # Newton steps bounce across the kink and stall.
    # Iteration budget tuned on TPU: (25, 4, 8) runs 2.4x faster than
    # (40, 5, 10) with matching feasibility (91.5% vs 92.0%) and ~0.1%
    # control drift on the reference lattice; raise for offline gold runs.
    gn_iters: int = 25
    al_outer: int = 4
    penalty0: float = 100.0
    penalty_growth: float = 4.0
    linesearch_steps: int = 8
    # ``opti.lam_g`` tolerance used for the activation one-hot
    active_tol: float = 1e-6
    # relative-KKT threshold above which a solve is flagged infeasible —
    # the analogue of IPOPT's convergence failure -> -999 sentinel rows
    kkt_tol: float = 5e-2


def _solve_spd_unrolled(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for a small static-size SPD system via fully unrolled
    Cholesky + triangular solves.

    Written as Python loops over the (static, tiny) matrix indices so that
    under vmap every scalar op becomes a (batch,)-wide VPU vector op — the
    lane-level batched `cho_solve` lowering is the NMPC solver's TPU
    bottleneck (small-matrix factorizations leave the 8x128 vector unit
    almost entirely idle).  Produces NaN for non-PD A, which the caller's
    line search rejects (the LM-damping retry loop).
    """
    n = A.shape[0]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(s)
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


class NMPCSolution(NamedTuple):
    accel: jnp.ndarray  # (..., T)
    steer_vel: jnp.ndarray  # (..., T)
    states: jnp.ndarray  # (..., T+1, 7) rolled-out trajectory
    active_onehot: jnp.ndarray  # (..., 86) reference lam_g layout (1=inactive)
    feasible: jnp.ndarray  # bool (...,) — replaces -999 sentinels
    kkt_residual: jnp.ndarray  # (...,) projected-gradient norm


def _rollout_rk4(x0, u, curv, p: VehicleParams, cfg: NMPCConfig):
    """RK4 roll of (T, 2) controls from x0 (7,). Returns (T+1, 7)."""
    dt = cfg.dt

    if cfg.model == "cartesian":
        def deriv(x, uk):
            return st_mixed_deriv(x, uk, p)
    elif cfg.model == "kinematic":
        def deriv(x, uk):
            # pure kinematic bicycle in the 7-dim layout (reference
            # nonlinear_kmpc.py model; psi_dot/beta slots inert)
            v, psi, delta = x[..., 3], x[..., 4], x[..., 2]
            zero = jnp.zeros_like(v)
            return jnp.stack(
                [v * jnp.cos(psi), v * jnp.sin(psi), uk[..., 1], uk[..., 0],
                 v * jnp.tan(delta) / (p.lf + p.lr), zero, zero], axis=-1)
    else:
        def deriv(x, uk):
            # saturate=False: the CasADi oracle's dynamics take raw variables
            # (bounds are constraints, not clips) — and the clip kinks coincide
            # with the solver's box bounds, creating spurious nonsmooth minima
            return frenet_deriv(x, uk, curv, p, blend="switch",
                                v_switch=cfg.v_switch, saturate=False)

    def step(x, uk):
        k1 = deriv(x, uk)
        k2 = deriv(x + 0.5 * dt * k1, uk)
        k3 = deriv(x + 0.5 * dt * k2, uk)
        k4 = deriv(x + dt * k3, uk)
        x_new = x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        return x_new, x_new

    # scan with full unroll in f32: XLA sees straight-line code across the
    # T=5 steps (fuses the RK4 stages, no loop bookkeeping) while the traced
    # program stays one expression; the nested jax.hessian that made
    # unrolling explode trace time is gone (the inner solver now uses one
    # fused jacfwd pass, see _solve_single.inner). Full unroll is worth
    # 1.5x solver throughput on v5e but ~2.7x XLA:CPU compile time, so the
    # f64 path (CPU-only: tests and offline gold runs) unrolls halfway.
    unroll = True if x0.dtype == jnp.float32 else 2
    _, xs = jax.lax.scan(step, x0, u, unroll=unroll)
    return jnp.concatenate([x0[None], xs], axis=0)


def _smooth_cost(u_flat, x0, goal, curv, p, cfg: NMPCConfig):
    """Tracking + control cost (no constraint terms).

    Cost stages follow the reference exactly: states k=0..T-1 vs goal (the
    terminal state is NOT in the cost, dmpc_frenet.py:424-428).
    """
    T = cfg.horizon
    u = u_flat.reshape(T, 2)
    xs = _rollout_rk4(x0, u, curv, p, cfg)
    q = jnp.asarray(cfg.q_diag, u.dtype)
    r = jnp.asarray(cfg.r_diag, u.dtype)
    dx = xs[1:T] - goal[None, :]
    cost = jnp.sum(q[None, :] * dx * dx) + jnp.sum(r[None, :] * u * u)
    if cfg.qf_diag is not None:
        qf = jnp.asarray(cfg.qf_diag, u.dtype)
        dterm = xs[T] - goal
        cost = cost + jnp.sum(qf * dterm * dterm)
    return cost


def _wall_residuals(u_flat, x0, curv, lam_state, rho, p, cfg: NMPCConfig):
    """AL state-box residuals: sqrt(rho/2) max(0, lam/rho + g)."""
    T = cfg.horizon
    xs = _rollout_rk4(x0, u_flat.reshape(T, 2), curv, p, cfg)
    g = _state_box_violations(xs, cfg)  # (4*(T+1),)
    return jnp.sqrt(0.5 * rho) * jnp.maximum(0.0, lam_state / rho + g)


def _objective(u_flat, x0, goal, curv, lam_state, rho, p, cfg: NMPCConfig):
    w = _wall_residuals(u_flat, x0, curv, lam_state, rho, p, cfg)
    return (_smooth_cost(u_flat, x0, goal, curv, p, cfg) + jnp.dot(w, w))


def _state_box_violations(xs, cfg: NMPCConfig):
    delta = xs[..., 2]
    vx = xs[..., 3]
    return jnp.concatenate([
        delta - cfg.max_steer,
        -cfg.max_steer - delta,
        vx - cfg.max_speed,
        cfg.min_speed - vx,
    ], axis=-1)


def _control_bounds(cfg: NMPCConfig, dtype):
    lo = jnp.asarray([-cfg.max_accel, -cfg.max_dsteer], dtype)
    hi = jnp.asarray([cfg.max_accel, cfg.max_dsteer], dtype)
    return lo, hi


def _solve_single(x0, goal, curv, u_init, p: VehicleParams, cfg: NMPCConfig):
    """Projected-Newton AL solve for one problem instance."""
    T = cfg.horizon
    n = 2 * T
    dtype = x0.dtype
    lo, hi = _control_bounds(cfg, dtype)
    lo_flat = jnp.tile(lo, T)
    hi_flat = jnp.tile(hi, T)
    n_state_con = 4 * (T + 1)

    obj = partial(_objective, x0=x0, goal=goal, curv=curv, p=p, cfg=cfg)
    smooth = partial(_smooth_cost, x0=x0, goal=goal, curv=curv, p=p, cfg=cfg)
    wall = partial(_wall_residuals, x0=x0, curv=curv, p=p, cfg=cfg)
    grad_fn = jax.grad(lambda uf, lam, rho: obj(uf, lam_state=lam, rho=rho))
    smooth_vg = jax.value_and_grad(smooth)

    def inner(u_flat, lam, rho):
        """Damped projected semi-smooth Newton at fixed multipliers.

        Hessian model = exact Hessian of the smooth (tracking+control) cost
        + Gauss-Newton of the AL hinge walls.  The exact smooth part is
        needed because the tracking residuals are large (pure GN
        underestimates curvature ~100x here and line searches collapse);
        the GN wall part is needed because the exact wall Hessian vanishes
        on the inactive side of the C1 kink and exact-Newton steps crash
        through it.

        All derivatives come from ONE fused jacfwd pass per iteration:
        forward-over-reverse gives (smooth Hessian, wall Jacobian) sharing
        tangent rollouts, with the primal (value, gradient, residuals) as
        aux — the objective value, the exact AL gradient, and both
        curvature blocks cost 10 tangent passes total where the unfused
        form paid 4 separate traces (~1.5x solver throughput on v5e).
        """

        def comb(uu):
            v, gs = smooth_vg(uu)
            w = wall(uu, lam_state=lam, rho=rho)
            return (gs, w), (v, gs, w)

        comb_jac = jax.jacfwd(comb, has_aux=True)

        def body(state):
            u, mu, it, done = state
            (H_s, Jw), (v, gs, w) = comb_jac(u)
            g = gs + 2.0 * (Jw.T @ w)  # exact AL gradient at u
            # relative projected-gradient convergence test on the CURRENT
            # iterate (g IS grad of the AL objective, so the test is free);
            # dtype-aware tol: 1e-10 relative is unreachable in f32 and
            # would pin every lane at the iteration cap
            pg = u - jnp.clip(u - g, lo_flat, hi_flat)
            conv_tol = 100.0 * jnp.finfo(dtype).eps
            done = done | (jnp.linalg.norm(pg)
                           < conv_tol * (1.0 + jnp.linalg.norm(g)))
            H = H_s + 2.0 * (Jw.T @ Jw)
            # two-metric projected GN: variables pinned at a bound with the
            # gradient pushing outward take a (clipped) gradient step; the
            # reduced system is solved on the free set only — plain clipped
            # full steps stall when the active set is wrong
            tol_bnd = 1e-9
            active = (((u - lo_flat < tol_bnd) & (g > 0.0))
                      | ((hi_flat - u < tol_bnd) & (g < 0.0)))
            free = (~active).astype(dtype)
            H_red = (H * free[:, None] * free[None, :]
                     + jnp.diag(active.astype(dtype)))
            # plain-identity LM damping: the smooth Hessian may be indefinite
            # (diagonal scaling would then fail to regularize); an indefinite
            # A makes the Cholesky produce NaNs, the step is rejected below,
            # and mu grows until A is SPD — no eigendecomposition needed.
            A = H_red + mu * jnp.eye(n, dtype=dtype)
            step = _solve_spd_unrolled(A, g)
            f_old = v + jnp.dot(w, w)  # objective value from the aux primal

            # backtracking line search along the projected Newton direction:
            # the AL walls are piecewise quadratic, so a full step frequently
            # crosses a kink and overshoots — halving recovers cheaply.
            # Evaluate all trial points at once (one batched objective eval
            # instead of a sequential fori loop).
            ts = 0.5 ** jnp.arange(cfg.linesearch_steps, dtype=dtype)
            cands = jnp.clip(u[None] - ts[:, None] * step[None],
                             lo_flat[None], hi_flat[None])
            f_cands = jax.vmap(
                lambda c: obj(c, lam_state=lam, rho=rho))(cands)
            f_cands = jnp.where(jnp.all(jnp.isfinite(cands), axis=1),
                                f_cands, jnp.inf)
            best = jnp.argmin(f_cands)
            f_new = jnp.minimum(f_cands[best], f_old)
            u_new = jnp.where(f_cands[best] < f_old, cands[best], u)
            improved = f_new < f_old
            u_next = jnp.where(improved & ~done, u_new, u)
            mu = jnp.where(done, mu,
                           jnp.where(improved, jnp.maximum(mu * 0.2, 1e-10),
                                     jnp.minimum(mu * 10.0, 1e10)))
            return u_next, mu, it + 1, done

        def cond(state):
            _, _, it, done = state
            return (it < cfg.gn_iters) & ~done

        u_out, _, _, _ = jax.lax.while_loop(
            cond, body, (u_flat, jnp.asarray(1e-4, dtype), 0, False))
        return u_out

    # AL outer loop as fori_loop: the body (one inner solve + multiplier
    # update) traces/compiles once; unrolling it inlines the inner
    # while_loop al_outer times and multiplies trace time
    def outer_body(i, carry):
        u_flat, lam, rho = carry
        u_flat = inner(u_flat, lam, rho)
        xs = _rollout_rk4(x0, u_flat.reshape(T, 2), curv, p, cfg)
        g = _state_box_violations(xs, cfg)
        lam = jnp.maximum(0.0, lam + rho * g)
        return u_flat, lam, rho * cfg.penalty_growth

    lam0 = jnp.zeros((n_state_con,), dtype)
    rho0 = jnp.asarray(cfg.penalty0, dtype)
    u0 = jnp.clip(u_init.reshape(-1), lo_flat, hi_flat)
    u_flat, lam, rho = jax.lax.fori_loop(0, cfg.al_outer, outer_body,
                                         (u0, lam0, rho0))
    # one final inner solve at the last multiplier estimate, so the KKT
    # diagnostic below is evaluated at a (lam, u) pair that is actually a
    # stationary point of the final AL subproblem
    rho_final = rho / cfg.penalty_growth
    u_flat = inner(u_flat, lam, rho_final)

    u = u_flat.reshape(T, 2)
    xs = _rollout_rk4(x0, u, curv, p, cfg)

    # diagnostics -----------------------------------------------------------
    g_state = _state_box_violations(xs, cfg)
    grad_final = grad_fn(u_flat, lam, rho_final)
    pg = u_flat - jnp.clip(u_flat - grad_final, lo_flat, hi_flat)
    # relative stationarity: tracking-cost gradients reach O(100), so
    # normalize by the gradient scale
    kkt = jnp.linalg.norm(pg) / (1.0 + jnp.linalg.norm(grad_final))
    max_viol = jnp.max(jnp.maximum(g_state, 0.0))
    feasible = ((max_viol < 1e-3) & jnp.all(jnp.isfinite(u_flat))
                & (kkt < cfg.kkt_tol))

    onehot = _activation_onehot(u, xs, lam, cfg)
    return NMPCSolution(u[:, 0], u[:, 1], xs, onehot, feasible, kkt)


def _activation_onehot(u, xs, lam_state, cfg: NMPCConfig):
    """Constraint-activation one-hot in the reference ``lam_g`` layout
    (1 = multiplier ~ 0 = inactive; dmpc_frenet.py:633).

    Order of ``opti.subject_to`` calls in the reference: initial-state
    equality (7), per-stage RK4 equalities (5x7), then
    U0>lo, U0<hi, U1>lo, U1<hi (5 each), then X2>lo, X2<hi, X3>lo, X3<hi
    (6 each) -> 86 entries.
    """
    T = cfg.horizon
    tol = cfg.active_tol
    dtype = u.dtype
    # equality multipliers are generically nonzero -> "active" -> 0
    eq = jnp.zeros((7 + 7 * T,), dtype)

    def act(slack):
        # 1 when the constraint is slack (inactive), 0 when tight
        return (slack > tol).astype(dtype)

    a, sv = u[:, 0], u[:, 1]
    u_act = jnp.concatenate([
        act(a + cfg.max_accel),  # U0 > -a_max
        act(cfg.max_accel - a),  # U0 < a_max
        act(sv + cfg.max_dsteer),
        act(cfg.max_dsteer - sv),
    ])
    delta, vx = xs[:, 2], xs[:, 3]
    x_act = jnp.concatenate([
        act(delta + cfg.max_steer),
        act(cfg.max_steer - delta),
        act(vx - cfg.min_speed),
        act(cfg.max_speed - vx),
    ])
    return jnp.concatenate([eq, u_act, x_act])


@partial(jax.jit, static_argnames=("cfg",))
def solve_nmpc_batch(x0: jnp.ndarray, goal: jnp.ndarray, curv: jnp.ndarray,
                     params: VehicleParams, cfg: NMPCConfig = NMPCConfig(),
                     u_init: jnp.ndarray | None = None) -> NMPCSolution:
    """Solve a batch of Frenet NMPC problems.

    Args:
        x0: initial states ``(..., 7)`` = [s, ey, delta, vx, vy, wz, epsi]
        goal: goal states ``(..., 7)`` (reference uses
            [0,0,0,vx_goal,0,0,0], dmpc_frenet.py:607)
        curv: path curvature ``(...,)``
        params: vehicle params (scalar fields, shared across the batch)
        u_init: warm start ``(..., T, 2)``; defaults to zeros (the reference
            warm-starts X with the repeated x0 and U implicitly with zeros)
    Returns:
        NMPCSolution with leading batch axes preserved.
    """
    batch_shape = x0.shape[:-1]
    if u_init is None:
        u_init = jnp.zeros(batch_shape + (cfg.horizon, 2), x0.dtype)
    solve = partial(_solve_single, p=params, cfg=cfg)
    if not batch_shape:
        return solve(x0, goal, curv, u_init)
    x0f = x0.reshape((-1, 7))
    goalf = jnp.broadcast_to(goal, batch_shape + (7,)).reshape((-1, 7))
    curvf = jnp.broadcast_to(curv, batch_shape).reshape((-1,))
    uf = u_init.reshape((-1, cfg.horizon, 2))
    out = jax.vmap(solve)(x0f, goalf, curvf, uf)
    return NMPCSolution(*[jnp.reshape(o, batch_shape + o.shape[1:]) for o in out])


def solve_lattice_point(row: jnp.ndarray, params: VehicleParams,
                        cfg: NMPCConfig = NMPCConfig()) -> NMPCSolution:
    """Reference datagen ABI: one row ``[ey, delta, vx, vy, vx_goal, wz,
    epsi, curv]`` (nmpc_data_generator_frenet.py:33) -> solution with the
    goal state [0,0,0,vx_goal,0,0,0]."""
    x0 = jnp.stack([jnp.zeros_like(row[..., 0]), row[..., 0], row[..., 1],
                    row[..., 2], row[..., 3], row[..., 5], row[..., 6]], axis=-1)
    goal = jnp.zeros_like(x0).at[..., 3].set(row[..., 4])
    return solve_nmpc_batch(x0, goal, row[..., 7], params, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def solve_lattice_multi_params(rows: jnp.ndarray, params_batch: VehicleParams,
                               cfg: NMPCConfig = NMPCConfig()) -> NMPCSolution:
    """Solve the same lattice under a batch of vehicle-parameter settings in
    ONE dispatch: the reference's outer mu sweep
    (nmpc_data_generator_frenet.py:17-19, a Python loop re-running the whole
    pipeline per mu) becomes a leading device axis.

    Args:
        rows: (N, 8) frenet lattice rows.
        params_batch: VehicleParams whose leaves carry a leading (M,) axis
            (e.g. built with ``jax.tree.map(jnp.stack, ...)`` over mu values).
    Returns:
        NMPCSolution with leading axes (M, N).
    """
    return jax.vmap(lambda pm: solve_lattice_point(rows, pm, cfg))(params_batch)


def cartesian_config(**overrides) -> NMPCConfig:
    """Cartesian NMPC problem constants (reference nonlinear_dmpc.py
    mpc_config:11-49): goal-reaching cost on (x, y, v), terminal Qf, tighter
    accel/speed boxes for the F1TENTH-scale car."""
    kw = dict(
        model="cartesian",
        q_diag=(18.5, 18.5, 0.0, 1.5, 0.0, 0.0, 0.0),
        qf_diag=(18.5, 18.5, 0.0, 1.5, 0.0, 0.0, 0.0),
        r_diag=(0.5, 4.0),
        max_accel=3.0,
        max_dsteer=float(np.pi),
        max_steer=0.4189,
        max_speed=6.0,
        min_speed=0.0,
    )
    kw.update(overrides)
    return NMPCConfig(**kw)


def kinematic_config(**overrides) -> NMPCConfig:
    """Kinematic goal-reaching NMPC (reference nonlinear_kmpc.py
    mpc_config:8-35): same 7-dim layout with the blend pinned to the
    kinematic regime via a huge switch speed."""
    kw = dict(
        model="kinematic",
        q_diag=(18.5, 18.5, 0.0, 3.5, 0.1, 0.0, 0.0),
        qf_diag=(18.5, 18.5, 0.0, 3.5, 0.1, 0.0, 0.0),
        r_diag=(0.01, 100.0),
        max_accel=3.0,
        max_dsteer=float(np.pi),
        max_steer=0.4189,
        max_speed=7.0,
        min_speed=0.0,
    )
    kw.update(overrides)
    return NMPCConfig(**kw)


def solve_cartesian_point(row: jnp.ndarray, params: VehicleParams,
                          cfg: NMPCConfig | None = None) -> NMPCSolution:
    """Cartesian datagen ABI: one row ``[v_car, x_goal, y_goal, t_goal,
    v_goal, beta, angv]`` (scripts/nmpc_data_generator.py:36-65 grid order)
    -> solution from x0=[0,0,0,v_car,0,angv,beta] toward
    goal=[x_g,y_g,0,v_g,t_g,0,0]."""
    cfg = cfg or cartesian_config()
    zeros = jnp.zeros_like(row[..., 0])
    x0 = jnp.stack([zeros, zeros, zeros, row[..., 0], zeros, row[..., 6],
                    row[..., 5]], axis=-1)
    goal = jnp.stack([row[..., 1], row[..., 2], zeros, row[..., 4],
                      row[..., 3], zeros, zeros], axis=-1)
    return solve_nmpc_batch(x0, goal, zeros, params, cfg)
