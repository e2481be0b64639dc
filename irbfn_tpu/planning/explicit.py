"""Explicit (lookup-table) planners — plan by querying the raw solver table.

Capability match for reference ``src/irbfn_mpc/explicit_planner.py``
(ExplicitPlanner, ExplicitFrenetPlanner, AdaptiveExplicitPlanner), TPU-first:

- the reference binary-searches each dimension with ``np.searchsorted`` on
  host (explicit_planner.py:165-172) or queries a scipy KDTree (``:219,383``,
  native component N6); here lookups are **grid-index arithmetic** — the
  tables ARE regular lattices, so the nearest row is round((q-lo)/step) per
  dimension, one fused device op, batched over queries;
- a brute-force nearest-neighbor path covers irregular (filtered) tables:
  distance argmin via one (B, N) matmul on the MXU — the pattern the
  reference prototypes at explicit_planner.py:21-25;
- infeasible (-999) rows are guarded by a validity mask instead of runtime
  value checks (explicit_planner.py:390-392).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class GridTable(NamedTuple):
    """A regular-lattice solution table.

    lows/steps/nums define the lattice (per input dim); outputs is
    (prod(nums), out_dim); valid marks feasible rows.
    """

    lows: jnp.ndarray  # (D,)
    steps: jnp.ndarray  # (D,)
    nums: tuple  # static (D,) python ints
    outputs: jnp.ndarray  # (N, O)
    valid: jnp.ndarray  # (N,) bool


def grid_table_from_arrays(inputs: np.ndarray, outputs: np.ndarray,
                           valid: Optional[np.ndarray] = None) -> GridTable:
    """Build a GridTable from reference-format (inputs, outputs) npz arrays
    (meshgrid-flattened 'ij' order, nmpc_data_generator_frenet.py:81-98)."""
    d = inputs.shape[1]
    axes = [np.unique(inputs[:, i]) for i in range(d)]
    nums = tuple(len(a) for a in axes)
    assert int(np.prod(nums)) == inputs.shape[0], (
        "inputs are not a full regular lattice")
    lows = np.array([a[0] for a in axes])
    steps = np.array([(a[-1] - a[0]) / max(len(a) - 1, 1) if len(a) > 1 else 1.0
                      for a in axes])
    from irbfn_tpu.parallel.datagen import controls_block

    out_flat = controls_block(outputs)
    if valid is None:
        valid = ~np.any(out_flat == -999.0, axis=1)
    return GridTable(jnp.asarray(lows, jnp.float32),
                     jnp.asarray(steps, jnp.float32), nums,
                     jnp.asarray(out_flat), jnp.asarray(valid))


@partial(jax.jit, static_argnames=("nums",))
def _grid_lookup(lows, steps, nums, outputs, valid, queries):
    idx = jnp.round((queries - lows) / steps).astype(jnp.int32)
    idx = jnp.clip(idx, 0, jnp.asarray(nums, jnp.int32) - 1)
    strides = np.concatenate([np.cumprod(np.asarray(nums[1:])[::-1])[::-1],
                              [1]]).astype(np.int32)
    flat = jnp.sum(idx * jnp.asarray(strides), axis=-1)
    return outputs[flat], valid[flat]


def grid_lookup(table: GridTable, queries: jnp.ndarray):
    """Nearest-lattice-row lookup, batched: (B, D) -> ((B, O), (B,) valid)."""
    return _grid_lookup(table.lows, table.steps, table.nums, table.outputs,
                        table.valid, queries)


@partial(jax.jit, static_argnames=("nums",))
def _grid_lookup_linear(lows, steps, nums, outputs, valid, queries):
    d = len(nums)
    corners = np.stack(np.meshgrid(*([[0, 1]] * d), indexing="ij"),
                       axis=-1).reshape(-1, d)  # (2^D, D) static
    strides = np.concatenate([np.cumprod(np.asarray(nums[1:])[::-1])[::-1],
                              [1]]).astype(np.int32)
    u = (queries - lows) / steps
    # singleton-axis guard: for a dim with one grid value, nums-2 is -1 and
    # the clip used to park the base index at -1, whose negative stride
    # aliased an unrelated table row into the blend; clamp the base cell to
    # 0 and zero that dim's fractional weight instead
    nums_np = np.asarray(nums, np.int32)
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0,
                  jnp.asarray(np.maximum(nums_np - 2, 0)))
    frac = jnp.clip(u - i0, 0.0, 1.0)  # (B, D)
    frac = jnp.where(jnp.asarray(nums_np == 1), 0.0, frac)
    idx = jnp.minimum(i0[:, None, :] + jnp.asarray(corners, jnp.int32),
                      jnp.asarray(nums_np - 1))  # (B, C, D)
    flat = jnp.sum(idx * jnp.asarray(strides), axis=-1)  # (B, C)
    cw = jnp.where(jnp.asarray(corners, bool), frac[:, None, :],
                   1.0 - frac[:, None, :])
    w = jnp.prod(cw, axis=-1) * valid[flat]  # (B, C) feasibility-masked
    wsum = jnp.sum(w, axis=-1)
    out = jnp.einsum("bc,bco->bo", w, outputs[flat])
    safe = jnp.maximum(wsum, 1e-12)
    return out / safe[:, None], wsum > 1e-6


def grid_lookup_linear(table: GridTable, queries: jnp.ndarray):
    """Feasibility-weighted multilinear interpolation over the 2^D cell
    corners: (B, D) -> ((B, O), (B,) valid).

    Nearest-cell lookup (the reference explicit planners' KDTree/searchsorted
    semantics) quantizes every input to half a grid step — on a coarse
    curvature axis that holds the controls at the straight-road cell until
    the car is already mid-corner, then jumps a full cell (measured
    bang-bang between opposite control bounds on consecutive steps).
    Interpolating the surrounding corners gives controls continuous in the
    state. Infeasible corners get zero weight (their -999 rows never leak);
    ``valid`` is False only when ALL 2^D corners are infeasible."""
    return _grid_lookup_linear(table.lows, table.steps, table.nums,
                               table.outputs, table.valid, queries)


def stack_grid_tables(tables: Sequence[GridTable]) -> GridTable:
    """Stack same-lattice tables (e.g. one per mu) into ONE GridTable with a
    leading integer 'arm' dimension.

    The arm index becomes grid dim 0 with lows=0, step=1: a query whose
    first coordinate is an exact integer arm id gets zero fractional weight
    on that axis, so both grid_lookup and grid_lookup_linear select exactly
    that arm's rows — a mixed-arm batch (each episode driving a different
    table, as the EXP3 adaptive planner does) stays ONE fused device lookup
    instead of a per-arm Python fan-out (reference AdaptiveExplicitPlanner
    keeps a list of planners and dispatches in Python,
    explicit_planner.py:452-608)."""
    base = tables[0]
    for t in tables[1:]:
        if t.nums != base.nums:
            raise ValueError("tables must share one lattice")
    a = len(tables)
    return GridTable(
        jnp.concatenate([jnp.zeros((1,), base.lows.dtype), base.lows]),
        jnp.concatenate([jnp.ones((1,), base.steps.dtype), base.steps]),
        (a,) + tuple(base.nums),
        jnp.concatenate([t.outputs for t in tables], axis=0),
        jnp.concatenate([t.valid for t in tables], axis=0))


class NNTable(NamedTuple):
    """Irregular table for brute-force nearest-neighbor lookup (the KDTree
    replacement). Queries use the matmul distance trick on the MXU."""

    inputs: jnp.ndarray  # (N, D), pre-scaled
    outputs: jnp.ndarray  # (N, O)
    scale: jnp.ndarray  # (D,) per-dim scaling applied to inputs


def nn_table_from_arrays(inputs, outputs, scale=None) -> NNTable:
    inputs = np.asarray(inputs, np.float32)
    from irbfn_tpu.parallel.datagen import controls_block

    out_flat = controls_block(outputs)
    valid = ~np.any(out_flat == -999.0, axis=1)
    inputs, out_flat = inputs[valid], out_flat[valid]
    if scale is None:
        span = inputs.max(0) - inputs.min(0)
        scale = 1.0 / np.where(span > 0, span, 1.0)
    return NNTable(jnp.asarray(inputs * scale), jnp.asarray(out_flat),
                   jnp.asarray(scale, jnp.float32))


@jax.jit
def nn_lookup(table: NNTable, queries: jnp.ndarray):
    """Exact nearest neighbor via ||q - x||^2 = ||q||^2 - 2 q.x + ||x||^2;
    the q.x term is one (B, N) matmul (MXU), argmin over N."""
    q = queries * table.scale
    x_sq = jnp.sum(table.inputs**2, axis=-1)
    cross = q @ table.inputs.T
    d2 = x_sq[None] - 2.0 * cross + jnp.sum(q * q, axis=-1, keepdims=True)
    idx = jnp.argmin(d2, axis=-1)
    return table.outputs[idx], idx


class ExplicitFrenetPlanner:
    """Plan by table lookup in the Frenet frame (reference
    ExplicitFrenetPlanner, explicit_planner.py:210-449)."""

    def __init__(self, table, track, use_grid: bool = True,
                 interpolate: bool = True, horizon_time: float = 0.5):
        """``interpolate``: multilinear over the surrounding cells (see
        grid_lookup_linear) instead of nearest-cell; GridTable only.
        ``horizon_time``: the table generator's horizon * dt, for
        horizon-end goal-speed sampling (sim.track.horizon_goal_speed)."""
        self.table = table
        self.track = track
        self.use_grid = use_grid and isinstance(table, GridTable)
        self.interpolate = interpolate
        self.horizon_time = horizon_time

    def plan_batch(self, s, ey, epsi, delta, vx, vy, wz):
        from irbfn_tpu.sim.track import horizon_goal_speed, interp_wrapped

        rl = self.track.raceline
        curv = interp_wrapped(rl.ss, rl.ks, s, rl.length)
        vx_goal = horizon_goal_speed(rl, s, vx, self.horizon_time)
        q = jnp.stack([ey, delta, vx, vy, vx_goal, wz, epsi, curv], axis=-1)
        if self.use_grid:
            lookup = grid_lookup_linear if self.interpolate else grid_lookup
            out, valid = lookup(self.table, q)
        else:
            out, _ = nn_lookup(self.table, q)
            valid = jnp.ones(out.shape[:-1], bool)
        return out, valid

    def plan(self, obs) -> tuple:
        s, ey, epsi = self.track.cartesian_to_frenet(
            obs["pose_x"], obs["pose_y"], obs["pose_theta"])
        out, valid = self.plan_batch(
            jnp.atleast_1d(s), jnp.atleast_1d(ey), jnp.atleast_1d(epsi),
            jnp.atleast_1d(jnp.asarray(obs["delta"])),
            jnp.atleast_1d(jnp.asarray(obs["linear_vel_x"])),
            jnp.atleast_1d(jnp.asarray(obs["linear_vel_y"])),
            jnp.atleast_1d(jnp.asarray(obs["ang_vel_z"])))
        if not bool(valid[0]):
            return 0.0, 0.0  # infeasible cell: coast (ref guard :390-392)
        T = out.shape[-1] // 2
        return float(out[0, 0]), float(out[0, T])


class AdaptiveExplicitPlanner:
    """EXP3 over a bank of explicit tables (reference
    AdaptiveExplicitPlanner, explicit_planner.py:452-608)."""

    def __init__(self, planners: Sequence, gamma: float = 0.2, seed: int = 0):
        from irbfn_tpu.planning.bandits import EXP3

        self.planners = list(planners)
        self.bandit = EXP3(len(self.planners), gamma, seed)
        self.current_arm = 0

    def select(self) -> int:
        self.current_arm = self.bandit.pull_arm()
        return self.current_arm

    def reward(self, r: float):
        self.bandit.update_dist(self.current_arm, r)

    def plan(self, obs):
        return self.planners[self.current_arm].plan(obs)
