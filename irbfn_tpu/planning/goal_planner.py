"""Goal-MPC planners: waypoint-following speed/steer control.

The reference deploys its goal MPC as a ROS node that picks a lookahead
waypoint and solves the linear-kinematic QP live (deprecated/goal_mpc_node.py
+ mpc_node.py), with the table/net pipeline as the offline compression of the
same map (goal_mpc_data_generator.py, train_goal_mpc.py).  Here both backends
share one jitted plan path:

    pose -> velocity-scaled raceline lookahead (planner.py:_lookahead_goal)
         -> body-frame goal (x_g, y_g, t_g) + v_car, v_goal
         -> y >= 0 mirror (the reference grid only covers y_goal in [0, 4],
            goal_mpc_data_generator.py:19-21 — lateral symmetry of the
            kinematic bicycle: flip y_g/t_g, negate steer on the way out)
         -> (speed, steer) from the batched ADMM solve OR one net forward

Outputs feed TrackEnv(control_mode="speed") — the gym's speed/steer action
interface (action.py:62-84), exactly what the reference node publishes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from irbfn_tpu.planning.planner import _lookahead_goal, _make_apply
from irbfn_tpu.sim.track import Track
from irbfn_tpu.solvers.clothoid import wrap_angle
from irbfn_tpu.solvers.goal_mpc import GoalMPCConfig, solve_goal_mpc


class GoalMPCPlanner:
    """Waypoint-following goal-MPC planner (solver- or net-backed).

    ``model``/``params`` None -> every plan is a live batched ADMM solve
    (the reference node's OSQP role); otherwise one WCRBF forward from a
    scripts/train_goal_mpc.py checkpoint.
    """

    def __init__(self, track: Track, model=None, params=None,
                 cfg: GoalMPCConfig = GoalMPCConfig(),
                 horizon_time: Optional[float] = None,
                 iters: int = 600, use_pallas="auto"):
        self.cfg = cfg
        # default lookahead = the MPC horizon preview (T * dt = 0.4 s)
        ht = (cfg.horizon * cfg.dt if horizon_time is None
              else horizon_time)
        rl = track.raceline
        rl_points = jnp.stack([rl.xs, rl.ys], axis=-1)
        apply_fn = None
        if model is not None:
            apply_fn = _make_apply(model, params, use_pallas)
            self._params = params
        else:
            self._params = None

        @jax.jit
        def plan_fn(net_params, x, y, theta, v):
            gx, gy, gtheta, gv = _lookahead_goal(rl_points, rl.vxs, rl.yaws,
                                                 x, y, v,
                                                 horizon_time=ht)
            dx, dy = gx - x, gy - y
            co, si = jnp.cos(theta), jnp.sin(theta)
            xg_b = co * dx + si * dy
            yg_b = -si * dx + co * dy
            tg_b = wrap_angle(gtheta - theta)
            # y >= 0 mirror (reference grid parity)
            flip = yg_b < 0.0
            sign = jnp.where(flip, -1.0, 1.0)
            inputs = jnp.stack([v, xg_b, sign * yg_b, sign * tg_b, gv],
                               axis=-1)
            if apply_fn is None:
                sol = solve_goal_mpc(inputs, cfg, iters=iters)
                speed, steer = sol.speed, sol.steer
            else:
                out = apply_fn(net_params, jnp.atleast_2d(inputs))
                speed, steer = out[..., 0], out[..., 1]
            speed = jnp.reshape(speed, jnp.shape(v))
            steer = jnp.reshape(steer, jnp.shape(v))
            return speed, sign * steer

        self._plan_fn = plan_fn

    def plan_batch(self, x, y, theta, v):
        """(speed, steer) actions for TrackEnv(control_mode='speed')."""
        return self._plan_fn(self._params, x, y, theta, v)

    def plan(self, obs):
        """Observation-dict/NamedTuple single-step ABI."""
        speed, steer = self.plan_batch(obs.pose_x, obs.pose_y,
                                       obs.pose_theta, obs.linear_vel_x)
        return speed, steer
