"""Planar lidar scan simulation against track boundaries.

Capability match for f1tenth_gym's ray-marched scan simulator
(envs/laser_models.py: njit ray marching over a distance-transformed
occupancy bitmap, ``get_scan``/``ScanSimulator2D``) for the track-shaped
worlds this framework simulates.

TPU-first formulation: instead of marching rays step-by-step on the host,
every (pose, beam, sample) triple is evaluated at once — sample points along
all beams, convert to track-frame lateral offset via the raceline projection,
and take the first sample outside the drivable corridor with a masked argmin.
One fused (B, n_beams, n_samples) computation, batched over poses.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from irbfn_tpu.sim.track import Track


class LidarSpec(NamedTuple):
    n_beams: int = 64
    fov: float = 4.7  # radians (the f1tenth 270-degree scanner)
    max_range: float = 10.0
    n_samples: int = 64  # samples per ray


@partial(jax.jit, static_argnames=("spec",))
def scan(track_points: jnp.ndarray, half_width: float, x, y, theta,
         spec: LidarSpec = LidarSpec()):
    """Simulate a scan. Batched over leading axes of (x, y, theta).

    Args:
        track_points: (N, 2) raceline polyline.
        half_width: drivable corridor half width around the raceline.
    Returns:
        ranges (..., n_beams)
    """
    angles = jnp.linspace(-spec.fov / 2, spec.fov / 2, spec.n_beams)
    ts = jnp.linspace(0.0, 1.0, spec.n_samples) * spec.max_range

    beam_theta = jnp.asarray(theta)[..., None] + angles  # (..., B)
    dir_x = jnp.cos(beam_theta)
    dir_y = jnp.sin(beam_theta)
    px = jnp.asarray(x)[..., None, None] + dir_x[..., None] * ts  # (..., B, S)
    py = jnp.asarray(y)[..., None, None] + dir_y[..., None] * ts

    # lateral distance of each sample to the raceline polyline (min over
    # segments): outside the corridor -> wall
    pts = jnp.stack([px, py], axis=-1)  # (..., B, S, 2)
    starts = track_points  # (N, 2)
    diffs = jnp.roll(track_points, -1, axis=0) - starts
    l2 = jnp.sum(diffs * diffs, axis=-1)
    rel = pts[..., None, :] - starts  # (..., B, S, N, 2)
    t = jnp.clip(jnp.sum(rel * diffs, axis=-1) / l2, 0.0, 1.0)
    proj = starts + t[..., None] * diffs
    d2 = jnp.sum((pts[..., None, :] - proj) ** 2, axis=-1)
    dist_to_line = jnp.sqrt(jnp.min(d2, axis=-1))  # (..., B, S)

    outside = dist_to_line > half_width
    # first outside sample per beam (masked argmin over the sample axis)
    sample_idx = jnp.argmax(outside, axis=-1)
    any_hit = jnp.any(outside, axis=-1)
    hit_range = ts[sample_idx]
    return jnp.where(any_hit, hit_range, spec.max_range)


def make_scanner(track: Track, half_width: float = 2.0,
                 spec: LidarSpec = LidarSpec(), decimate: int = 4):
    """Bind a track into a jittable ``(x, y, theta) -> ranges`` scanner.

    ``decimate`` subsamples the raceline polyline to bound the (B, S, N)
    distance tensor; corridor walls are smooth so 4x decimation changes
    ranges well below the scanner's sample resolution.
    """
    pts = jnp.asarray(np.asarray(track.raceline.points)[::decimate])

    def scanner(x, y, theta):
        return scan(pts, half_width, x, y, theta, spec)

    return scanner


def min_clearance(track_points: jnp.ndarray, half_width: float, x, y):
    """Distance from pose(s) to the corridor wall (negative = outside) —
    the collision-check primitive (f1tenth collision_models capability)."""
    pts = jnp.stack([jnp.asarray(x), jnp.asarray(y)], axis=-1)
    starts = track_points
    diffs = jnp.roll(track_points, -1, axis=0) - starts
    l2 = jnp.sum(diffs * diffs, axis=-1)
    rel = pts[..., None, :] - starts
    t = jnp.clip(jnp.sum(rel * diffs, axis=-1) / l2, 0.0, 1.0)
    proj = starts + t[..., None] * diffs
    d = jnp.sqrt(jnp.min(jnp.sum((pts[..., None, :] - proj) ** 2, axis=-1),
                         axis=-1))
    return half_width - d
