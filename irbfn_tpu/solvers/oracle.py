"""Independent host-side NLP oracle for the batched NMPC solver.

Cross-checks the AL/projected-Newton solver (``solvers/nmpc.py``) against
scipy's SLSQP sequential-quadratic-programming solver — an NLP method with a
completely independent convergence path (active-set QP subproblems, its own
line search and multiplier estimates). The reference anchors its datagen to
IPOPT (``nonlinear_dmpc_frenet.py:605-649``); IPOPT is not in this image, so
SLSQP plays the interior-quality-oracle role. The problem definition
(single-shooting rollout, cost, boxes) is shared with the device solver on
purpose: same problem, different solver — disagreement means a solver bug,
not a modeling difference.

Everything runs in f64 on CPU (scipy is host-side anyway); use small row
counts — this is a validation oracle, not a datagen path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from irbfn_tpu.dynamics.params import VehicleParams, fullscale_params
from irbfn_tpu.solvers.nmpc import (NMPCConfig, _control_bounds,
                                    _rollout_rk4, _smooth_cost,
                                    _state_box_violations, solve_lattice_point)


class OracleResult(NamedTuple):
    u: np.ndarray  # (N, T, 2) controls
    objective: np.ndarray  # (N,) smooth cost at the solution
    max_violation: np.ndarray  # (N,) max state-box violation
    feasible: np.ndarray  # (N,) bool: converged + constraints satisfied


def _row_to_problem(row):
    """Frenet datagen row [ey, delta, vx, vy, vx_goal, wz, epsi, curv] ->
    (x0, goal, curv), the solve_lattice_point ABI (nmpc.py:421-429)."""
    x0 = np.array([0.0, row[0], row[1], row[2], row[3], row[5], row[6]])
    goal = np.zeros(7)
    goal[3] = row[4]
    return x0, goal, row[7]


def make_problem_fns(params: VehicleParams, cfg: NMPCConfig):
    """Jitted f64 (value+grad, constraints+jac) closures over (x0, goal,
    curv) for scipy. The rollout/cost are the exact functions the device
    solver optimizes."""
    T = cfg.horizon

    def cost(u_flat, x0, goal, curv):
        return _smooth_cost(u_flat, x0, goal, curv, params, cfg)

    def cons(u_flat, x0, curv):
        xs = _rollout_rk4(x0, u_flat.reshape(T, 2), curv, params, cfg)
        return -_state_box_violations(xs, cfg)  # scipy wants g(u) >= 0

    vg = jax.jit(jax.value_and_grad(cost))
    cf = jax.jit(cons)
    cj = jax.jit(jax.jacfwd(cons))
    return vg, cf, cj


def solve_oracle_rows(rows: np.ndarray, params: VehicleParams | None = None,
                      cfg: NMPCConfig = NMPCConfig(), maxiter: int = 300,
                      ftol: float = 1e-12) -> OracleResult:
    """Solve frenet lattice rows with scipy SLSQP (host loop, f64)."""
    from scipy.optimize import minimize

    params = params or fullscale_params(dtype=jnp.float64)
    T = cfg.horizon
    vg, cf, cj = make_problem_fns(params, cfg)
    lo, hi = _control_bounds(cfg, jnp.float64)
    bounds = [(float(lo[i % 2]), float(hi[i % 2])) for i in range(2 * T)]

    us, objs, viols, feas = [], [], [], []
    for row in np.asarray(rows, np.float64):
        x0, goal, curv = _row_to_problem(row)
        x0j, goalj, curvj = (jnp.asarray(a, jnp.float64)
                             for a in (x0, goal, curv))

        def f(u):
            v, g = vg(jnp.asarray(u, jnp.float64), x0j, goalj, curvj)
            return float(v), np.asarray(g, np.float64)

        res = minimize(
            f, np.zeros(2 * T), jac=True, method="SLSQP", bounds=bounds,
            constraints=[{
                "type": "ineq",
                "fun": lambda u: np.asarray(
                    cf(jnp.asarray(u, jnp.float64), x0j, curvj), np.float64),
                "jac": lambda u: np.asarray(
                    cj(jnp.asarray(u, jnp.float64), x0j, curvj), np.float64),
            }],
            options={"maxiter": maxiter, "ftol": ftol})
        g_final = np.asarray(cf(jnp.asarray(res.x, jnp.float64), x0j, curvj))
        max_viol = float(np.maximum(-g_final, 0.0).max())
        us.append(res.x.reshape(T, 2))
        objs.append(float(res.fun))
        viols.append(max_viol)
        feas.append(bool(res.success) and max_viol < 1e-6
                    and np.isfinite(res.fun))
    return OracleResult(np.stack(us), np.asarray(objs), np.asarray(viols),
                        np.asarray(feas))


def save_oracle(path, rows: np.ndarray, oracle: OracleResult,
                **provenance) -> None:
    """Persist an OracleResult as a committed test artifact (the gym's
    ``legacy_scan.npz`` stored-oracle pattern, SURVEY §4.4): the expensive
    host-side SLSQP derivation runs once (scripts/gen_test_oracles.py) and
    the suite compares the LIVE solver against the stored gold."""
    np.savez_compressed(
        path, rows=np.asarray(rows, np.float64), u=oracle.u,
        objective=oracle.objective, max_violation=oracle.max_violation,
        feasible=oracle.feasible,
        **{f"meta_{k}": np.asarray(v) for k, v in provenance.items()})


def load_oracle(path) -> tuple[np.ndarray, OracleResult]:
    """Load (rows, OracleResult) saved by ``save_oracle``."""
    z = np.load(path)
    return z["rows"], OracleResult(z["u"], z["objective"],
                                   z["max_violation"], z["feasible"])


def compare_to_oracle(rows: np.ndarray, params: VehicleParams | None = None,
                      cfg: NMPCConfig = NMPCConfig(),
                      oracle: OracleResult | None = None, **oracle_kw) -> dict:
    """Solve rows with the device solver (LIVE) and report agreement metrics
    against the SLSQP oracle — freshly derived unless a stored ``oracle``
    is passed (see ``save_oracle``):

    - feasibility confusion (AL feasible vs oracle feasible)
    - on commonly-feasible rows: relative objective gap
      (J_al - J_oracle) / (1 + |J_oracle|) — positive means the AL solver's
      point is worse; percentiles of per-row max |u_al - u_oracle|.
    """
    params = params or fullscale_params(dtype=jnp.float64)
    rows = np.asarray(rows, np.float64)
    if oracle is None:
        oracle = solve_oracle_rows(rows, params, cfg, **oracle_kw)
    # solve in 39-row padded chunks: the shared-batch solver fixture in
    # tests/test_solvers.py compiles the f64 program at exactly batch 39,
    # and a second batch shape here was a second ~135 s XLA:CPU compile in
    # every suite run (the heaviest remaining item after the stored-oracle
    # work). Chunking reuses that program when it exists and costs one
    # compile (not two) when it doesn't.
    CHUNK = 39
    accs, svs, feas = [], [], []
    for s0 in range(0, len(rows), CHUNK):
        chunk = rows[s0:s0 + CHUNK]
        pad = CHUNK - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        csol = solve_lattice_point(jnp.asarray(chunk, jnp.float64), params,
                                   cfg)
        n = CHUNK - pad
        accs.append(np.asarray(csol.accel)[:n])
        svs.append(np.asarray(csol.steer_vel)[:n])
        feas.append(np.asarray(csol.feasible)[:n])
    u_al = np.stack([np.concatenate(accs), np.concatenate(svs)], axis=-1)
    feas_al = np.concatenate(feas)

    # evaluate the AL solutions under the SAME objective
    obj_fn = jax.jit(jax.vmap(
        partial(_smooth_cost, p=params, cfg=cfg)))
    x0s = np.stack([_row_to_problem(r)[0] for r in rows])
    goals = np.stack([_row_to_problem(r)[1] for r in rows])
    curvs = np.asarray([_row_to_problem(r)[2] for r in rows])
    j_al = np.asarray(obj_fn(
        jnp.asarray(u_al.reshape(len(rows), -1)), x0=jnp.asarray(x0s),
        goal=jnp.asarray(goals), curv=jnp.asarray(curvs)))

    both = feas_al & oracle.feasible
    rel_gap = ((j_al - oracle.objective)
               / (1.0 + np.abs(oracle.objective)))
    du = np.abs(u_al - oracle.u).reshape(len(rows), -1).max(axis=1)
    # control scale for a relative view: oracle u magnitude
    u_scale = np.abs(oracle.u).reshape(len(rows), -1).max(axis=1) + 1e-9

    def pct(a, q):
        return float(np.percentile(a, q)) if a.size else float("nan")

    return {
        "n_rows": int(len(rows)),
        "oracle_feasible": int(oracle.feasible.sum()),
        "al_feasible": int(feas_al.sum()),
        "both_feasible": int(both.sum()),
        "al_misses_oracle_feasible": int(
            (oracle.feasible & ~feas_al).sum()),
        "oracle_misses_al_feasible": int(
            (feas_al & ~oracle.feasible).sum()),
        "rel_obj_gap_p50": pct(rel_gap[both], 50),
        "rel_obj_gap_p90": pct(rel_gap[both], 90),
        "rel_obj_gap_max": float(rel_gap[both].max()) if both.any()
        else float("nan"),
        "du_max_p50": pct(du[both], 50),
        "du_max_p90": pct(du[both], 90),
        "du_rel_p90": pct((du / u_scale)[both], 90),
        "al_only_rel_gap": rel_gap,
        "both_mask": both,
    }
