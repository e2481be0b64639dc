"""Lattice planner: sample a goal grid, run the net on every goal, integrate
the spirals, score, softargmin-select.

Capability match for the reference's nuPlan integration
(deprecated/planner.py): ``sample_lookahead_square`` goal sampling
(planner.py:125-180), batched net eval + spiral integration
(planner.py:94-95), smooth trajectory selection via softargmin
(planner.py:99-109).  TPU-first: the whole pipeline — goals -> net ->
integrate -> cost -> blend — is one jitted program; thousands of candidate
goals per control step is the batch-1024 serving shape of the north-star.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from irbfn_tpu.dynamics.spiral import sample_path


class LatticePlan(NamedTuple):
    best_params: jnp.ndarray  # (5,) softargmin-blended spiral params
    best_path: jnp.ndarray  # (n_pts, 4) [x, y, theta, kappa]
    argmin_params: jnp.ndarray  # (5,) hard-argmin params (multimodal-safe)
    argmin_path: jnp.ndarray  # (n_pts, 4)
    costs: jnp.ndarray  # (G,) per-goal cost
    weights: jnp.ndarray  # (G,) softargmin weights
    goals: jnp.ndarray  # (G, 3) sampled goals


def sample_lookahead_grid(lookahead: float, half_width: float,
                          n_lon: int, n_lat: int, n_theta: int,
                          theta_range: float = 0.6):
    """Goal grid ahead of the ego frame: (x in [la/2, la], y in +-half_width,
    theta in +-theta_range) — the lookahead-square sampler of
    planner.py:125-180, as a static meshgrid."""
    xs = np.linspace(lookahead * 0.5, lookahead, n_lon)
    ys = np.linspace(-half_width, half_width, n_lat)
    ts = np.linspace(-theta_range, theta_range, n_theta)
    X, Y, T = np.meshgrid(xs, ys, ts, indexing="ij")
    return jnp.asarray(np.stack([X, Y, T], axis=-1).reshape(-1, 3),
                       jnp.float32)


@partial(jax.jit, static_argnames=("param_fn", "n_path_points", "temperature"))
def plan_lattice(param_fn: Callable, goals: jnp.ndarray,
                 target_xy: jnp.ndarray, obstacle_xy: Optional[jnp.ndarray] = None,
                 n_path_points: int = 9, temperature: float = 50.0,
                 obstacle_radius: float = 1.0) -> LatticePlan:
    """Evaluate all candidate goals and softargmin-blend the best spiral.

    Args:
        param_fn: batched map (G, 3) goals -> (G, 5) spiral params (a trained
            net's forward, or the exact clothoid solver for oracle planning).
        goals: (G, 3) candidate goals in the ego frame.
        target_xy: (2,) desired position (e.g. raceline lookahead point).
        obstacle_xy: optional (M, 2) obstacle centers for collision cost.
    """
    params = param_fn(goals)  # (G, 5)
    paths = sample_path(params, n_points=n_path_points)  # (G, P, 4)
    endpoints = paths[:, -1, :2]
    cost = jnp.sum((endpoints - target_xy) ** 2, axis=-1)
    # curvature effort regularizer
    cost = cost + 0.1 * jnp.mean(paths[..., 3] ** 2, axis=-1)
    if obstacle_xy is not None:
        d = jnp.linalg.norm(paths[:, :, None, :2] - obstacle_xy[None, None],
                            axis=-1)  # (G, P, M)
        clearance = jnp.min(d, axis=(1, 2))
        cost = cost + 1e3 * jnp.maximum(0.0, obstacle_radius - clearance) ** 2

    # softargmin blend (planner.py:99-109): smooth, differentiable selection;
    # NOTE the blend can average symmetric detours (e.g. +-y around an
    # obstacle) back into the obstacle — argmin_* is the multimodal-safe
    # hard selection for execution, weights/best_* for gradients
    weights = jax.nn.softmax(-temperature * cost)
    best_params = jnp.einsum("g,gp->p", weights, params)
    best_path = sample_path(best_params, n_points=n_path_points)
    k = jnp.argmin(cost)
    argmin_params = params[k]
    argmin_path = paths[k]
    return LatticePlan(best_params, best_path, argmin_params, argmin_path,
                       cost, weights, goals)


class LatticePlanner:
    """Stateful wrapper: fixed goal grid + a trained (goal -> spiral) net."""

    def __init__(self, model=None, params=None, lookahead: float = 15.0,
                 half_width: float = 6.0, grid=(8, 9, 5),
                 temperature: float = 50.0):
        self.goals = sample_lookahead_grid(lookahead, half_width, *grid)
        self.temperature = temperature
        if model is not None:
            def param_fn(g):
                return model.apply(params, g)
        else:
            from irbfn_tpu.solvers.clothoid import solve_g1_lattice

            def param_fn(g):
                return solve_g1_lattice(g)

        self._param_fn = param_fn

    def plan(self, target_xy, obstacles=None) -> LatticePlan:
        return plan_lattice(self._param_fn, self.goals,
                            jnp.asarray(target_xy, jnp.float32),
                            obstacle_xy=None if obstacles is None
                            else jnp.asarray(obstacles, jnp.float32),
                            temperature=self.temperature)
