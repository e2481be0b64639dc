#!/usr/bin/env python
"""Derive the committed stored test oracles (tests/oracles/*.npz).

The gym reference pins its scan simulator to a committed
``legacy_scan.npz`` derived once from the original implementation
(f1tenth_gym unittest pattern, SURVEY §4.4). Same idea here: the expensive
f64 host-side SLSQP derivations run ONCE through this script and get
committed; the test suite then runs only the LIVE device solver and compares
against the stored gold, cutting the suite's dominant cost (the 100-row
SLSQP host loop re-ran every session). ``pytest --runslow`` re-derives a
subset in-suite to guard against artifact drift.

Run on CPU (f64):
  env JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu \
      python scripts/gen_test_oracles.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from irbfn_tpu.dynamics.params import fullscale_params  # noqa: E402
from irbfn_tpu.solvers.nmpc import NMPCConfig  # noqa: E402
from irbfn_tpu.solvers.oracle import save_oracle, solve_oracle_rows  # noqa: E402

OUT_DIR = Path(__file__).resolve().parents[1] / "tests" / "oracles"

# The EXACT fixture lattice of tests/test_nmpc_oracle.py — seeded, so the
# fast test can regenerate the rows and assert they match the stored copy.
ORACLE_SEED = 7
ORACLE_ROWS = 100


def nmpc_fixture_rows(n: int = ORACLE_ROWS,
                      seed: int = ORACLE_SEED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.column_stack([
        rng.uniform(-0.2, 2.0, n),   # ey
        rng.uniform(-0.3, 0.3, n),   # delta
        rng.uniform(1.0, 7.0, n),    # vx
        rng.uniform(-1.0, 1.0, n),   # vy
        rng.uniform(3.0, 7.0, n),    # vx_goal
        rng.uniform(-2.6, 2.6, n),   # wz
        rng.uniform(-1.0, 1.0, n),   # epsi
        rng.uniform(-0.1, 0.1, n),   # curv
    ])


def derive_perturbation_gold():
    """Derive the perturbation-optimality gold (tests/test_solvers.py
    ``test_nmpc_perturbation_optimality``): solve the two _I_PERT rows with
    the f64 solver, PROVE optimality here (no feasible random perturbation
    improves the AL-free objective), and store the solution + candidate
    evaluations.  The fast suite then only checks the live solver still
    reproduces the gold controls — removing the two per-row f64
    ``_smooth_cost``/rollout jit compiles that were ~8 min of the suite's
    wall clock (CLAUDE.md).  ``pytest --runslow`` re-derives this live."""
    from functools import partial

    import jax

    from irbfn_tpu.solvers import nmpc as M
    from irbfn_tpu.solvers.nmpc import solve_lattice_point

    # EXACT rows + rng protocol of the in-suite slow path
    rows = np.array([
        [0.3, 0.05, 4.0, -0.1, 5.0, 0.4, 0.15, 0.03],
        [1.0, -0.1, 2.5, 0.3, 6.0, -1.0, -0.4, -0.08],
    ])
    p = fullscale_params(dtype=jnp.float64)
    cfg = NMPCConfig()
    sol = solve_lattice_point(jnp.asarray(rows), p, cfg)
    assert bool(sol.feasible.all()), "pert gold rows must solve feasible"

    n_cand = 60
    rng = np.random.default_rng(0)
    lo = jnp.tile(jnp.asarray([-cfg.max_accel, -cfg.max_dsteer]), cfg.horizon)
    u_star = np.asarray(jnp.stack([sol.accel, sol.steer_vel], -1)
                        .reshape(rows.shape[0], -1))
    f_star, v_star = [], []
    f_cand = np.zeros((rows.shape[0], n_cand))
    v_cand = np.zeros((rows.shape[0], n_cand))
    cands = np.zeros((rows.shape[0], n_cand, 2 * cfg.horizon))
    for b in range(rows.shape[0]):
        x0 = jnp.concatenate([jnp.zeros(1), rows[b, :4], rows[b, 5:7]])
        goal = jnp.zeros(7).at[3].set(rows[b, 4])
        smooth_j = jax.jit(partial(M._smooth_cost, x0=x0, goal=goal,
                                   curv=rows[b, 7], p=p, cfg=cfg))

        @jax.jit
        def viol_j(u_flat):
            xs = M._rollout_rk4(x0, u_flat.reshape(cfg.horizon, 2),
                                rows[b, 7], p, cfg)
            return jnp.max(jnp.maximum(
                M._state_box_violations(xs, cfg), 0.0))

        us = jnp.asarray(u_star[b])
        f_star.append(float(smooth_j(us)))
        v_star.append(float(viol_j(us)))
        improved = 0
        for c in range(n_cand):
            scale = rng.choice([1e-3, 1e-2, 1e-1])
            cand = jnp.clip(us + scale * rng.standard_normal(us.shape[0]),
                            lo, -lo)
            cands[b, c] = np.asarray(cand)
            f_cand[b, c] = float(smooth_j(cand))
            v_cand[b, c] = float(viol_j(cand))
            if (v_cand[b, c] <= v_star[b] + 1e-6
                    and f_cand[b, c] < f_star[b] - 1e-6):
                improved += 1
        assert improved == 0, (
            f"gold derivation found {improved} improving perturbations for "
            f"row {b} — the solver solution is NOT optimal; do not commit")

    out = OUT_DIR / "nmpc_pert_gold.npz"
    np.savez_compressed(
        out, rows=rows, u_star=u_star, f_star=np.asarray(f_star),
        v_star=np.asarray(v_star), cands=cands, f_cand=f_cand,
        v_cand=v_cand, seed=0, n_cand=n_cand)
    print(f"{out}: optimality proven for {rows.shape[0]} rows x "
          f"{n_cand} perturbations")


def main():
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    rows = nmpc_fixture_rows()
    t0 = time.time()
    oracle = solve_oracle_rows(rows, fullscale_params(dtype=jnp.float64),
                               NMPCConfig(), maxiter=300, ftol=1e-12)
    out = OUT_DIR / "nmpc_frenet_slsqp.npz"
    save_oracle(out, rows, oracle, seed=ORACLE_SEED, maxiter=300,
                ftol=1e-12, mu=1.0, cs=5.0)
    print(f"{out}: {rows.shape[0]} rows, "
          f"{int(oracle.feasible.sum())} oracle-feasible, "
          f"derived in {time.time() - t0:.1f}s")
    t0 = time.time()
    derive_perturbation_gold()
    print(f"perturbation gold derived in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
