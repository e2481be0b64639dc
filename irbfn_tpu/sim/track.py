"""Track / raceline representation with cartesian<->Frenet conversion.

Replaces the capability surface of f1tenth_gym's ``Track`` that the reference
planners consume (SURVEY.md §1 L1): a raceline with ``xs/ys/yaws/vxs/ks``
arrays and arc-length ``ss``, plus ``cartesian_to_frenet`` /
``frenet_to_cartesian`` (used at ``nonlinear_dmpc_frenet.py:473-477,529``).

Design: the raceline is a densely sampled closed polyline (built host-side
from control points with a periodic Catmull-Rom spline); conversions are
pure-jnp nearest-segment projections so they run jitted on device and batch
over query poses — no scipy, no host round-trips in the planner loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from irbfn_tpu.solvers.clothoid import wrap_angle


class Raceline(NamedTuple):
    ss: jnp.ndarray  # arc length (N,)
    xs: jnp.ndarray
    ys: jnp.ndarray
    yaws: jnp.ndarray
    ks: jnp.ndarray  # curvature
    vxs: jnp.ndarray  # speed profile
    length: jnp.ndarray  # total track length (scalar)

    @property
    def n_points(self):
        return self.xs.shape[0]

    @property
    def points(self):
        return jnp.stack([self.xs, self.ys], axis=-1)


class Track(NamedTuple):
    raceline: Raceline

    # -- conversions ------------------------------------------------------
    def cartesian_to_frenet(self, x, y, theta):
        """(x, y, theta) -> (s, ey, epsi); batched over leading axes."""
        return cartesian_to_frenet(self.raceline, x, y, theta)

    def frenet_to_cartesian(self, s, ey, epsi):
        return frenet_to_cartesian(self.raceline, s, ey, epsi)

    def curvature_at(self, s):
        return interp_wrapped(self.raceline.ss, self.raceline.ks, s,
                              self.raceline.length)


def _resample_closed(points: np.ndarray, n_samples: int):
    """Periodic Catmull-Rom resampling of closed control polygon."""
    m = points.shape[0]
    # chordal parameterization
    d = np.linalg.norm(np.roll(points, -1, axis=0) - points, axis=1)
    t_knots = np.concatenate([[0.0], np.cumsum(d)])
    total = t_knots[-1]
    ts = np.linspace(0.0, total, n_samples, endpoint=False)

    out = np.zeros((n_samples, 2))
    for dim in range(2):
        p = points[:, dim]
        out[:, dim] = _catmull_rom_periodic(t_knots, p, ts)
    return out


def _catmull_rom_periodic(t_knots, values, ts):
    m = len(values)
    total = t_knots[-1]
    res = np.zeros_like(ts)
    seg = np.searchsorted(t_knots, ts, side="right") - 1
    seg = np.clip(seg, 0, m - 1)
    for i, (t, s) in enumerate(zip(ts, seg)):
        t0, t1 = t_knots[s], t_knots[s + 1]
        u = (t - t0) / max(t1 - t0, 1e-12)
        p0 = values[(s - 1) % m]
        p1 = values[s % m]
        p2 = values[(s + 1) % m]
        p3 = values[(s + 2) % m]
        res[i] = (
            0.5 * ((2 * p1) + (-p0 + p2) * u
                   + (2 * p0 - 5 * p1 + 4 * p2 - p3) * u**2
                   + (-p0 + 3 * p1 - 3 * p2 + p3) * u**3))
    return res


def from_control_points(points: np.ndarray, n_samples: int = 1024,
                        speed: float | np.ndarray = 4.0,
                        dtype=jnp.float32) -> Track:
    """Build a closed Track from (M, 2) control points."""
    xy = _resample_closed(np.asarray(points, np.float64), n_samples)
    d = np.linalg.norm(np.roll(xy, -1, axis=0) - xy, axis=1)
    ss = np.concatenate([[0.0], np.cumsum(d)])[:-1]
    length = float(np.sum(d))
    tangents = np.roll(xy, -1, axis=0) - np.roll(xy, 1, axis=0)
    yaws = np.arctan2(tangents[:, 1], tangents[:, 0])
    # curvature via finite differences of unwrapped yaw over arc length
    yaw_unwrap = np.unwrap(yaws)
    dyaw = np.gradient(yaw_unwrap)
    ds = np.gradient(np.concatenate([ss, [length]])[:-1])
    ds[ds == 0] = 1e-9
    ks = dyaw / ds
    vxs = np.broadcast_to(np.asarray(speed, np.float64), (n_samples,))
    rl = Raceline(*[jnp.asarray(a, dtype) for a in
                    (ss, xy[:, 0], xy[:, 1], yaws, ks, vxs)],
                  jnp.asarray(length, dtype))
    return Track(rl)


def oval_track(length: float = 30.0, width: float = 15.0,
               n_samples: int = 1024, speed: float = 4.0) -> Track:
    """Synthetic rounded-rectangle test track."""
    t = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    # superellipse for rounded corners
    a, b, p = length / 2, width / 2, 4.0
    pts = np.stack([a * np.sign(np.cos(t)) * np.abs(np.cos(t)) ** (2 / p),
                    b * np.sign(np.sin(t)) * np.abs(np.sin(t)) ** (2 / p)],
                   axis=-1)
    return from_control_points(pts, n_samples, speed)


def centerline_from_arrays(xs, ys, speed=4.0, dtype=jnp.float32) -> Track:
    """Build a Track from raw centerline arrays (f1tenth-map style input)."""
    pts = np.stack([np.asarray(xs), np.asarray(ys)], axis=-1)
    return from_control_points(pts, n_samples=max(1024, 4 * len(pts)),
                               speed=speed, dtype=dtype)


def from_csv(path: str, x_col: int = 0, y_col: int = 1,
             speed_col: int | None = None, delimiter: str = ",",
             skip_header: int = 0, dtype=jnp.float32) -> Track:
    """Load a closed track from a raceline/centerline CSV (the f1tenth map
    format the reference consumes through f1tenth_gym's Raceline loaders,
    track.py:16-248 there)."""
    raw = np.genfromtxt(path, delimiter=delimiter, skip_header=skip_header)
    pts = raw[:, [x_col, y_col]]
    # drop a duplicated closing point if present
    if np.allclose(pts[0], pts[-1]):
        pts = pts[:-1]
    speed = raw[:, speed_col].mean() if speed_col is not None else 4.0
    return from_control_points(pts, n_samples=max(1024, 4 * len(pts)),
                               speed=float(speed), dtype=dtype)


# ---------------------------------------------------------------- conversions

@jax.jit
def cartesian_to_frenet(rl: Raceline, x, y, theta):
    """Project pose(s) onto the raceline. Batched over leading axes."""
    pts = rl.points  # (N, 2)
    closed = jnp.concatenate([pts, pts[:1]], axis=0)  # close the loop
    query = jnp.stack([jnp.asarray(x), jnp.asarray(y)], axis=-1)
    starts = closed[:-1]
    diffs = closed[1:] - starts
    l2 = jnp.sum(diffs * diffs, axis=-1)
    rel = query[..., None, :] - starts
    t = jnp.clip(jnp.sum(rel * diffs, axis=-1) / l2, 0.0, 1.0)
    proj = starts + t[..., None] * diffs
    d2 = jnp.sum((query[..., None, :] - proj) ** 2, axis=-1)
    idx = jnp.argmin(d2, axis=-1)
    t_best = jnp.take_along_axis(t, idx[..., None], axis=-1).squeeze(-1)
    seg_len = jnp.sqrt(l2)[idx]
    s = rl.ss[idx] + t_best * seg_len
    # signed lateral offset: cross(tangent, offset)
    tangent = diffs[idx] / jnp.sqrt(l2)[idx][..., None]
    proj_best = jnp.take_along_axis(proj, idx[..., None, None], axis=-2).squeeze(-2)
    off = query - proj_best
    ey = tangent[..., 0] * off[..., 1] - tangent[..., 1] * off[..., 0]
    yaw_ref = jnp.arctan2(tangent[..., 1], tangent[..., 0])
    epsi = wrap_angle(jnp.asarray(theta) - yaw_ref)
    return s, ey, epsi


@jax.jit
def frenet_to_cartesian(rl: Raceline, s, ey, epsi):
    s = jnp.mod(jnp.asarray(s), rl.length)
    idx = jnp.clip(jnp.searchsorted(rl.ss, s, side="right") - 1, 0,
                   rl.n_points - 1)
    nxt = (idx + 1) % rl.n_points
    seg_vec = jnp.stack([rl.xs[nxt] - rl.xs[idx], rl.ys[nxt] - rl.ys[idx]],
                        axis=-1)
    seg_len = jnp.linalg.norm(seg_vec, axis=-1)
    frac = jnp.clip((s - rl.ss[idx]) / jnp.maximum(seg_len, 1e-9), 0.0, 1.0)
    base = jnp.stack([rl.xs[idx], rl.ys[idx]], axis=-1) + frac[..., None] * seg_vec
    tangent = seg_vec / jnp.maximum(seg_len, 1e-9)[..., None]
    normal = jnp.stack([-tangent[..., 1], tangent[..., 0]], axis=-1)
    pos = base + jnp.asarray(ey)[..., None] * normal
    yaw_ref = jnp.arctan2(tangent[..., 1], tangent[..., 0])
    return pos[..., 0], pos[..., 1], wrap_angle(yaw_ref + jnp.asarray(epsi))


@jax.jit
def horizon_goal_speed(rl, s, vx, horizon_time: float = 0.5):
    """Raceline goal speed sampled at the END of the horizon's travel,
    ``s + vx * horizon_time`` — the reference's ``ref_path[3][-1]`` semantics
    (irbfn_planner.py:474), matching the table's vx_goal axis. Sampling at
    the current s instead loses corner-entry braking anticipation (the car
    only starts slowing once already AT the corner). One helper shared by
    every frenet planner so sweep comparisons aren't confounded by
    goal-speed semantics. ``horizon_time`` = horizon * control dt."""
    return interp_wrapped(rl.ss, rl.vxs, s + vx * horizon_time, rl.length)


def interp_wrapped(ss, vals, s, length):
    s = jnp.mod(jnp.asarray(s), length)
    idx = jnp.clip(jnp.searchsorted(ss, s, side="right") - 1, 0, ss.shape[0] - 1)
    nxt = (idx + 1) % ss.shape[0]
    s1 = jnp.where(nxt == 0, length, ss[nxt])
    w = jnp.clip((s - ss[idx]) / jnp.maximum(s1 - ss[idx], 1e-9), 0.0, 1.0)
    return (1 - w) * vals[idx] + w * vals[nxt]
