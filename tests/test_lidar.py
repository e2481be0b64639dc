"""Lidar scan + collision primitive tests."""

import jax.numpy as jnp
import numpy as np

from irbfn_tpu.sim import oval_track
from irbfn_tpu.sim.lidar import LidarSpec, make_scanner, min_clearance


def test_scan_on_centerline_sees_walls():
    track = oval_track(length=30.0, width=15.0, n_samples=256)
    spec = LidarSpec(n_beams=32, max_range=8.0, n_samples=96)
    scanner = make_scanner(track, half_width=2.0, spec=spec)
    rl = track.raceline
    x, y, th = float(rl.xs[0]), float(rl.ys[0]), float(rl.yaws[0])
    ranges = scanner(x, y, th)
    assert ranges.shape == (32,)
    r = np.asarray(ranges)
    # side beams (perpendicular) see the wall at ~half_width
    side = np.argmin(np.abs(np.linspace(-2.35, 2.35, 32) - np.pi / 2))
    assert abs(r[side] - 2.0) < 0.5
    # forward beam sees farther than the side beams
    fwd = np.argmin(np.abs(np.linspace(-2.35, 2.35, 32)))
    assert r[fwd] > r[side]


def test_scan_batched():
    track = oval_track(n_samples=128)
    spec = LidarSpec(n_beams=16, n_samples=32)
    scanner = make_scanner(track, half_width=2.0, spec=spec)
    rl = track.raceline
    xs = jnp.asarray([float(rl.xs[0]), float(rl.xs[30])])
    ys = jnp.asarray([float(rl.ys[0]), float(rl.ys[30])])
    ths = jnp.asarray([float(rl.yaws[0]), float(rl.yaws[30])])
    ranges = scanner(xs, ys, ths)
    assert ranges.shape == (2, 16)
    single = scanner(xs[0], ys[0], ths[0])
    np.testing.assert_allclose(ranges[0], single, atol=1e-6)


def test_min_clearance_sign():
    track = oval_track(n_samples=128)
    pts = track.raceline.points
    rl = track.raceline
    on_line = min_clearance(pts, 2.0, rl.xs[0], rl.ys[0])
    assert float(on_line) > 1.5  # centerline: full clearance
    far = min_clearance(pts, 2.0, rl.xs[0] + 100.0, rl.ys[0])
    assert float(far) < 0.0  # far outside: collision
