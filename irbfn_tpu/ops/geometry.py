"""Raceline geometry primitives, vectorized jnp (numba-njit replacement).

Replaces the reference's LLVM-jitted host loops (``nearest_point`` /
``intersect_point``, reference ``src/irbfn_mpc/planner_utils.py:109-240``,
native component N5) with branchless array code that runs on device, batches
over query points, and fuses into the surrounding planner computation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def nearest_point(point: jnp.ndarray, trajectory: jnp.ndarray):
    """Nearest point on a piecewise-linear trajectory.

    Args:
        point: (..., 2) query point(s)
        trajectory: (N, 2) polyline (points must be distinct)
    Returns:
        (projection (..., 2), distance (...,), t (...,), segment index (...,))
        matching the reference's return contract (planner_utils.py:110-124).
    """
    starts = trajectory[:-1]  # (S, 2)
    diffs = trajectory[1:] - starts  # (S, 2)
    l2 = jnp.sum(diffs * diffs, axis=-1)  # (S,)
    rel = point[..., None, :] - starts  # (..., S, 2)
    t = jnp.clip(jnp.sum(rel * diffs, axis=-1) / l2, 0.0, 1.0)  # (..., S)
    proj = starts + t[..., None] * diffs  # (..., S, 2)
    d2 = jnp.sum((point[..., None, :] - proj) ** 2, axis=-1)
    idx = jnp.argmin(d2, axis=-1)
    proj_best = jnp.take_along_axis(proj, idx[..., None, None], axis=-2).squeeze(-2)
    t_best = jnp.take_along_axis(t, idx[..., None], axis=-1).squeeze(-1)
    d_best = jnp.sqrt(jnp.take_along_axis(d2, idx[..., None], axis=-1).squeeze(-1))
    return proj_best, d_best, t_best, idx


@partial(jax.jit, static_argnames=("wrap",))
def intersect_point(point: jnp.ndarray, radius, trajectory: jnp.ndarray,
                    t: float = 0.0, wrap: bool = False):
    """First intersection of the trajectory with a circle of ``radius``
    around ``point``, searching forward from fractional index ``t``.

    Branchless reformulation of the reference's early-exit segment scan
    (planner_utils.py:148-240): solve the quadratic for every segment at
    once, mask invalid/behind-start hits, and argmin the first valid segment
    index.  Returns (intersection point (2,), segment index, segment
    fraction); index is -1 (and point is NaN) when no intersection exists.
    """
    n_seg = trajectory.shape[0] - 1
    start_i = jnp.floor(t).astype(jnp.int32)
    start_t = jnp.mod(t, 1.0)

    if wrap:
        # every segment once, ordered forward from start_i then wrapping
        seg_order = (start_i + jnp.arange(n_seg)) % n_seg
    else:
        seg_order = jnp.arange(n_seg)

    starts = trajectory[seg_order]
    ends = trajectory[(seg_order + 1) % trajectory.shape[0]] + 1e-6
    V = ends - starts

    a = jnp.sum(V * V, axis=-1)
    to_start = starts - point
    b = 2.0 * jnp.sum(V * to_start, axis=-1)
    c = jnp.sum(to_start * to_start, axis=-1) - radius * radius
    disc = b * b - 4.0 * a * c
    valid = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)

    is_first = seg_order == start_i
    lo = jnp.where(is_first, start_t, 0.0)
    t1_ok = valid & (t1 >= lo) & (t1 <= 1.0)
    t2_ok = valid & (t2 >= lo) & (t2 <= 1.0)
    t_seg = jnp.where(t1_ok, t1, jnp.where(t2_ok, t2, jnp.inf))
    hit = jnp.isfinite(t_seg)
    if not wrap:
        # forward search only: ignore segments before the start index
        hit = hit & (seg_order >= start_i)

    order_pos = jnp.arange(seg_order.shape[0])
    first_pos = jnp.argmin(jnp.where(hit, order_pos, jnp.iinfo(jnp.int32).max))
    any_hit = jnp.any(hit)
    seg_idx = jnp.where(any_hit, seg_order[first_pos], -1)
    t_hit = t_seg[first_pos]
    p_hit = starts[first_pos] + t_hit * V[first_pos]
    p_hit = jnp.where(any_hit, p_hit, jnp.full_like(p_hit, jnp.nan))
    return p_hit, seg_idx, jnp.where(any_hit, t_hit, jnp.nan)


def rotation_matrix(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)


def zero_to_2pi(angle):
    return jnp.mod(angle, 2.0 * jnp.pi)
