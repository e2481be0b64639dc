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


if __name__ == "__main__":
    main()
