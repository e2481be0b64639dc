"""Lattice planner tests (nuPlan-pipeline analogue)."""

import jax.numpy as jnp
import numpy as np

from irbfn_tpu.planning import LatticePlanner, sample_lookahead_grid


def test_goal_grid_shape():
    goals = sample_lookahead_grid(15.0, 6.0, 4, 5, 3)
    assert goals.shape == (60, 3)
    assert float(goals[:, 0].min()) >= 7.5 - 1e-6
    assert float(goals[:, 0].max()) <= 15.0 + 1e-6


def test_oracle_lattice_plan_reaches_target():
    """With the exact clothoid solver as param_fn, the selected trajectory
    ends near the requested target."""
    planner = LatticePlanner(lookahead=15.0, half_width=6.0, grid=(6, 7, 3),
                             temperature=200.0)
    target = [12.0, 2.0]
    plan = planner.plan(target)
    end = np.asarray(plan.best_path[-1, :2])
    assert np.linalg.norm(end - np.asarray(target)) < 1.0
    np.testing.assert_allclose(float(plan.weights.sum()), 1.0, rtol=1e-5)


def test_obstacle_cost_diverts_plan():
    planner = LatticePlanner(lookahead=15.0, half_width=6.0, grid=(6, 9, 3),
                             temperature=200.0)
    target = [12.0, 0.0]
    free = planner.plan(target)
    # obstacle straight ahead on the free-space solution
    blocked = planner.plan(target, obstacles=[[10.0, 0.0]])
    y_free = float(free.argmin_path[-1, 1])
    y_blocked = float(blocked.argmin_path[-1, 1])
    # the executed (hard-argmin) plan deviates laterally around the obstacle
    assert abs(y_blocked) > abs(y_free) + 0.3


def test_net_param_fn_path():
    """A trained-net param_fn (here: a linear stub) plugs in unchanged."""
    import jax
    from flax import linen as nn

    class Stub(nn.Module):
        @nn.compact
        def __call__(self, g):
            return nn.Dense(5)(g)

    model = Stub()
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 3)))
    planner = LatticePlanner(model=model, params=params, grid=(3, 3, 3))
    plan = planner.plan([10.0, 0.0])
    assert plan.best_params.shape == (5,)
    assert np.isfinite(np.asarray(plan.costs)).all()
