"""Cartesian + kinematic NMPC variant tests (reference nonlinear_dmpc.py /
nonlinear_kmpc.py problem families).

All default-config rows share ONE (5, 7) batched solve: the f64 cartesian
solver compile is among the heaviest XLA:CPU programs in the suite and each
distinct batch shape recompiles it (suite profile: per-test shapes cost
~300 s; shared-batch is one compile). The kinematic config is a different
program and keeps its own solve.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from irbfn_tpu.dynamics.params import f1tenth_params
from irbfn_tpu.solvers import cartesian_config, kinematic_config, solve_cartesian_point

# row: [v_car, x_goal, y_goal, t_goal, v_goal, beta, angv]
_I_STRAIGHT, _I_LATERAL, _I_MIRROR, _I_MIRROR_NEG, _I_ACCEL = range(5)
_MIRROR = np.array([2.0, 1.5, 1.0, 0.5, 2.0, 0.1, 0.3])
_ROWS = np.vstack([
    [2.0, 1.0, 0.0, 0.0, 2.0, 0.0, 0.0],   # straight goal
    [2.0, 1.5, 1.0, 0.5, 2.0, 0.0, 0.0],   # lateral goal
    _MIRROR,
    _MIRROR * np.array([1, 1, -1, -1, 1, -1, -1]),
    [0.5, 3.0, 0.0, 0.0, 6.0, 0.0, 0.0],   # accel saturation
])


@pytest.fixture(scope="module")
def params():
    return f1tenth_params(mu=1.0, cs=5.0, dtype=jnp.float64)


@pytest.fixture(scope="module")
def shared_sol(params):
    return solve_cartesian_point(jnp.asarray(_ROWS), params,
                                 cartesian_config())


def test_cartesian_straight_goal(shared_sol):
    """Goal straight ahead at the same speed: drive forward, no steering."""
    sol = shared_sol
    assert bool(sol.feasible[_I_STRAIGHT])
    np.testing.assert_allclose(sol.steer_vel[_I_STRAIGHT], 0.0, atol=1e-5)
    # endpoint near the goal x
    assert abs(float(sol.states[_I_STRAIGHT, -1, 0]) - 1.0) < 0.35


def test_cartesian_lateral_goal_steers(shared_sol):
    sol = shared_sol
    assert bool(sol.feasible[_I_LATERAL])
    # steering activity toward positive y
    assert float(jnp.abs(sol.steer_vel[_I_LATERAL]).max()) > 0.05
    assert float(sol.states[_I_LATERAL, -1, 1]) > 0.05


def test_cartesian_mirror_symmetry(shared_sol):
    """Mirrored goal (y, theta, beta, angv negated) -> mirrored steering."""
    sol = shared_sol
    np.testing.assert_allclose(sol.accel[_I_MIRROR], sol.accel[_I_MIRROR_NEG],
                               atol=1e-4)
    np.testing.assert_allclose(sol.steer_vel[_I_MIRROR],
                               -sol.steer_vel[_I_MIRROR_NEG], atol=1e-4)


def test_cartesian_respects_accel_box(shared_sol):
    """Large speed gap saturates accel at the Cartesian bound (3.0)."""
    cfg = cartesian_config()
    sol = shared_sol
    assert float(jnp.abs(sol.accel[_I_ACCEL]).max()) <= cfg.max_accel + 1e-9
    assert float(sol.accel[_I_ACCEL, 0]) == pytest.approx(cfg.max_accel,
                                                          abs=1e-5)


def test_kinematic_variant_runs(params):
    cfg = kinematic_config()
    row = jnp.asarray([[1.0, 2.0, 0.5, 0.3, 2.0, 0.0, 0.0]])
    sol = solve_cartesian_point(row, params, cfg)
    assert bool(sol.feasible[0])
    # kinematic model: psi_dot/beta slots stay zero through the rollout
    np.testing.assert_allclose(sol.states[0, :, 5], 0.0, atol=1e-10)
    np.testing.assert_allclose(sol.states[0, :, 6], 0.0, atol=1e-10)
