"""NMPC solver vs an independent NLP oracle (scipy SLSQP, f64 host).

The AL/projected-Newton device solver replaces the reference's IPOPT
(nonlinear_dmpc_frenet.py:605-649); this is the external anchor VERDICT r1
asked for: same single-shooting problem, completely independent solver.

The oracle side is a STORED artifact (tests/oracles/nmpc_frenet_slsqp.npz,
derived once by scripts/gen_test_oracles.py — the gym's legacy_scan.npz
pattern, SURVEY §4.4): the fast suite runs only the LIVE f64 device solver
and compares against the committed gold, which cuts the dominant suite cost
(the 100-row SLSQP host loop). ``pytest --runslow`` re-derives a row subset
with live SLSQP and asserts the artifact hasn't drifted.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from irbfn_tpu.dynamics.params import fullscale_params
from irbfn_tpu.solvers.nmpc import NMPCConfig
from irbfn_tpu.solvers.oracle import (compare_to_oracle, load_oracle,
                                      solve_oracle_rows)

ORACLE_NPZ = Path(__file__).parent / "oracles" / "nmpc_frenet_slsqp.npz"


@pytest.fixture(scope="module")
def stored():
    rows, oracle = load_oracle(ORACLE_NPZ)
    # the stored rows must be the seeded fixture lattice (provenance guard:
    # scripts/gen_test_oracles.py:nmpc_fixture_rows with seed 7)
    from scripts.gen_test_oracles import nmpc_fixture_rows
    np.testing.assert_allclose(rows, nmpc_fixture_rows(), rtol=0, atol=0)
    return rows, oracle


@pytest.fixture(scope="module")
def metrics(stored):
    rows, oracle = stored
    return compare_to_oracle(rows, fullscale_params(dtype=jnp.float64),
                             NMPCConfig(), oracle=oracle)


@pytest.mark.slow
def test_stored_oracle_matches_live_slsqp(stored):
    """Re-derive a 12-row subset with live SLSQP and assert the committed
    artifact hasn't drifted (same solutions to solver precision)."""
    rows, oracle = stored
    idx = np.arange(0, rows.shape[0], rows.shape[0] // 12)[:12]
    live = solve_oracle_rows(rows[idx], fullscale_params(dtype=jnp.float64),
                             NMPCConfig(), maxiter=300, ftol=1e-12)
    np.testing.assert_array_equal(live.feasible, oracle.feasible[idx])
    both = live.feasible
    np.testing.assert_allclose(live.objective[both],
                               oracle.objective[idx][both], rtol=1e-8)
    np.testing.assert_allclose(live.u[both], oracle.u[idx][both], atol=1e-6)


def test_feasible_set_overlap(metrics):
    """The AL feasibility mask is conservative: it may flag stragglers the
    oracle solves (tuned iteration budget), but must never claim feasible
    where the oracle proves the problem solvable yet finds the AL point
    badly suboptimal — and it must catch most of the oracle-feasible set."""
    assert metrics["oracle_feasible"] >= 0.9 * metrics["n_rows"]
    assert (metrics["both_feasible"]
            >= 0.9 * metrics["oracle_feasible"])
    # AL never claims feasibility on rows the oracle rejects outright
    # (200-row study: 2/200 the other way — scripts/eval_nmpc_oracle.py)
    assert metrics["oracle_misses_al_feasible"] <= max(
        1, metrics["n_rows"] // 33)


def test_objective_agreement(metrics):
    """On commonly-feasible rows the AL solver reaches the oracle's
    objective: median gap at solver precision, p90 within 0.01% (allows an
    occasional distinct-local-minimum row on this nonconvex problem;
    200-row study measured p50 ~-2e-15, p90 ~0)."""
    assert metrics["rel_obj_gap_p50"] < 1e-10
    assert metrics["rel_obj_gap_p90"] < 1e-4


def test_control_agreement(metrics):
    """Typical control agreement is tight (the BASELINE 'control drift'
    claim now has an external anchor; 200-row study p50 3e-6)."""
    assert metrics["du_max_p50"] < 1e-4
    assert metrics["du_rel_p90"] < 5e-2
