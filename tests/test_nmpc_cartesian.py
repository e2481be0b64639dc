"""Cartesian + kinematic NMPC variant tests (reference nonlinear_dmpc.py /
nonlinear_kmpc.py problem families)."""

import jax.numpy as jnp
import numpy as np
import pytest

from irbfn_tpu.dynamics.params import f1tenth_params
from irbfn_tpu.solvers import cartesian_config, kinematic_config, solve_cartesian_point


@pytest.fixture(scope="module")
def params():
    return f1tenth_params(mu=1.0, cs=5.0, dtype=jnp.float64)


def test_cartesian_straight_goal(params):
    """Goal straight ahead at the same speed: drive forward, no steering."""
    # row: [v_car, x_goal, y_goal, t_goal, v_goal, beta, angv]
    row = jnp.asarray([[2.0, 1.0, 0.0, 0.0, 2.0, 0.0, 0.0]])
    sol = solve_cartesian_point(row, params, cartesian_config())
    assert bool(sol.feasible[0])
    np.testing.assert_allclose(sol.steer_vel[0], 0.0, atol=1e-5)
    # endpoint near the goal x
    assert abs(float(sol.states[0, -1, 0]) - 1.0) < 0.35


def test_cartesian_lateral_goal_steers(params):
    row = jnp.asarray([[2.0, 1.5, 1.0, 0.5, 2.0, 0.0, 0.0]])
    sol = solve_cartesian_point(row, params, cartesian_config())
    assert bool(sol.feasible[0])
    # steering activity toward positive y
    assert float(jnp.abs(sol.steer_vel[0]).max()) > 0.05
    assert float(sol.states[0, -1, 1]) > 0.05


def test_cartesian_mirror_symmetry(params):
    """Mirrored goal (y, theta, beta, angv negated) -> mirrored steering."""
    row = jnp.asarray([2.0, 1.5, 1.0, 0.5, 2.0, 0.1, 0.3])
    mirrored = row * jnp.asarray([1, 1, -1, -1, 1, -1, -1])
    sol = solve_cartesian_point(jnp.stack([row, mirrored]), params,
                                cartesian_config())
    np.testing.assert_allclose(sol.accel[0], sol.accel[1], atol=1e-4)
    np.testing.assert_allclose(sol.steer_vel[0], -sol.steer_vel[1], atol=1e-4)


def test_cartesian_respects_accel_box(params):
    """Large speed gap saturates accel at the Cartesian bound (3.0)."""
    cfg = cartesian_config()
    row = jnp.asarray([[0.5, 3.0, 0.0, 0.0, 6.0, 0.0, 0.0]])
    sol = solve_cartesian_point(row, params, cfg)
    assert float(jnp.abs(sol.accel).max()) <= cfg.max_accel + 1e-9
    assert float(sol.accel[0, 0]) == pytest.approx(cfg.max_accel, abs=1e-5)


def test_kinematic_variant_runs(params):
    cfg = kinematic_config()
    row = jnp.asarray([[1.0, 2.0, 0.5, 0.3, 2.0, 0.0, 0.0]])
    sol = solve_cartesian_point(row, params, cfg)
    assert bool(sol.feasible[0])
    # kinematic model: psi_dot/beta slots stay zero through the rollout
    np.testing.assert_allclose(sol.states[0, :, 5], 0.0, atol=1e-10)
    np.testing.assert_allclose(sol.states[0, :, 6], 0.0, atol=1e-10)
