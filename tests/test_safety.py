"""Tests for sim/safety.py: beam geometry, iTTC check, PID low-level
controller, and the env's action modes.

Oracle style: the branchless batched implementations are checked against
direct Python ports of the reference's loop/branch logic
(base_classes.py:138-164, laser_models.py:252-279, dynamic_models.py:419-461).
"""

import jax.numpy as jnp
import numpy as np

from irbfn_tpu.dynamics.params import f1tenth_params
from irbfn_tpu.sim import (TrackEnv, beam_geometry, oval_track, pid_lowlevel,
                           speed_action, ttc_in_collision)


def _side_distances_oracle(n_beams, fov, width, length):
    """Four-quadrant branch port (base_classes.py:138-164)."""
    dist_sides = width / 2.0
    dist_fr = length / 2.0
    incr = fov / (n_beams - 1)
    out = np.zeros(n_beams)
    for i in range(n_beams):
        angle = -fov / 2.0 + i * incr
        if angle > 0:
            if angle < np.pi / 2:
                to_side = dist_sides / np.sin(angle)
                to_fr = dist_fr / np.cos(angle)
            else:
                to_side = dist_sides / np.cos(angle - np.pi / 2.0)
                to_fr = dist_fr / np.sin(angle - np.pi / 2.0)
        else:
            if angle > -np.pi / 2:
                with np.errstate(divide="ignore"):
                    to_side = dist_sides / np.sin(-angle)
                    to_fr = dist_fr / np.cos(-angle)
            else:
                to_side = dist_sides / np.cos(-angle - np.pi / 2)
                to_fr = dist_fr / np.sin(-angle - np.pi / 2)
        out[i] = min(to_side, to_fr)
    return out


def test_beam_geometry_matches_reference_quadrants():
    n_beams, fov, w, lf, lr = 54, 4.7, 0.31, 0.15875, 0.17145
    angles, cosines, side = beam_geometry(n_beams, fov, w, lf, lr)
    oracle = _side_distances_oracle(n_beams, fov, w, lf + lr)
    np.testing.assert_allclose(np.asarray(side), oracle, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cosines), np.cos(angles), rtol=1e-6)


def _ttc_oracle(scan, vel, cosines, side, thresh):
    """Per-beam loop port (laser_models.py:252-279)."""
    if vel == 0.0:
        return False
    for i in range(scan.shape[0]):
        proj = vel * cosines[i]
        with np.errstate(divide="ignore", invalid="ignore"):
            ttc = (scan[i] - side[i]) / proj
        if thresh > ttc >= 0.0:
            return True
    return False


def test_ttc_matches_reference_loop():
    rng = np.random.default_rng(0)
    angles, cosines, side = beam_geometry(32, 4.7)
    cosines_np, side_np = np.asarray(cosines), np.asarray(side)
    scans = np.asarray(side_np + rng.uniform(-0.02, 3.0, size=(64, 32)))
    vels = rng.uniform(-4.0, 8.0, size=64)
    vels[:4] = 0.0
    got = np.asarray(ttc_in_collision(jnp.asarray(scans), jnp.asarray(vels),
                                      cosines, side, 0.1))
    want = np.array([_ttc_oracle(scans[i], vels[i], cosines_np, side_np, 0.1)
                     for i in range(64)])
    np.testing.assert_array_equal(got, want)


def test_ttc_analytic_head_on():
    """Head-on at a wall: collision iff (range - nose_offset)/v < thresh."""
    angles, cosines, side = beam_geometry(3, 0.2, width=0.3, lf=0.15, lr=0.15)
    nose = float(side[1])
    scan = jnp.asarray([10.0, nose + 0.05, 10.0])
    # v=10 -> ttc central beam = 0.005 < 0.01 -> collision
    assert bool(ttc_in_collision(scan, 10.0, cosines, side, 0.01))
    # v=1 -> ttc = 0.05 > 0.01 -> safe
    assert not bool(ttc_in_collision(scan, 1.0, cosines, side, 0.01))
    # stationary -> safe even when scan < side offset
    assert not bool(ttc_in_collision(jnp.asarray([0.0, 0.0, 0.0]), 0.0,
                                     cosines, side, 0.01))


def _pid_oracle(speed, steer, v, delta, sv_max, a_max, v_max, v_min):
    """Branch port (dynamic_models.py:419-461)."""
    sd = steer - delta
    sv = (sd / abs(sd)) * sv_max if abs(sd) > 1e-4 else 0.0
    vd = speed - v
    if v > 0.0:
        kp = 10.0 * a_max / v_max if vd > 0 else 10.0 * a_max / (-v_min)
    else:
        kp = 2.0 * a_max / v_max if vd > 0 else 2.0 * a_max / (-v_min)
    return kp * vd, sv


def test_pid_matches_reference_branches():
    p = f1tenth_params()
    rng = np.random.default_rng(1)
    n = 256
    speed = rng.uniform(-3, 8, n)
    steer = rng.uniform(-0.4, 0.4, n)
    v = rng.uniform(-3, 8, n)
    delta = rng.uniform(-0.4, 0.4, n)
    delta[:8] = steer[:8]  # exact deadband hits
    accl, sv = pid_lowlevel(jnp.asarray(speed), jnp.asarray(steer),
                            jnp.asarray(v), jnp.asarray(delta), p)
    # v_min = -5.0: the reference gym's asymmetric reverse-speed limit
    # (see pid_lowlevel docstring)
    want = np.array([_pid_oracle(speed[i], steer[i], v[i], delta[i],
                                 float(p.sv_max), float(p.a_max),
                                 float(p.v_max), -5.0)
                     for i in range(n)])
    np.testing.assert_allclose(np.asarray(accl), want[:, 0], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sv), want[:, 1], rtol=1e-5,
                               atol=1e-6)


def test_speed_mode_env_tracks_commanded_speed():
    """'speed' control mode: the PID drives v toward the command and delta
    toward the commanded steering angle."""
    track = oval_track()
    p = f1tenth_params(dt=0.1)
    env = TrackEnv(track, p, control_mode="speed")
    sim = env.reset(speed0=0.5)
    cmd = jnp.asarray([3.0, 0.1])  # [speed, steer]
    for _ in range(30):
        sim = env.step(sim, cmd)
    assert abs(float(sim.x[3]) - 3.0) < 0.3
    # bang-bang steering chatters within one substep's sv_max*dt of target
    assert abs(float(sim.x[2]) - 0.1) < float(p.sv_max) * env.sim_dt + 1e-3
    # accl mode unchanged: same action vector means [accel, steer_vel]
    env2 = TrackEnv(track, p, control_mode="accl")
    sim2 = env2.reset(speed0=0.5)
    sim2 = env2.step(sim2, jnp.asarray([1.0, 0.0]))
    assert float(sim2.x[3]) > 0.55


def test_speed_action_batched_shape():
    p = f1tenth_params()
    state = jnp.zeros((5, 4, 7)).at[..., 3].set(2.0)
    act = jnp.broadcast_to(jnp.asarray([4.0, 0.2]), (5, 4, 2))
    out = speed_action(act, state, p)
    assert out.shape == (5, 4, 2)
    assert bool(jnp.all(out[..., 0] > 0))  # accelerating toward 4 m/s


def test_observation_factory_types():
    from irbfn_tpu.sim import observation_factory

    track = oval_track()
    p = f1tenth_params(dt=0.1)
    env = TrackEnv(track, p)
    sim = env.reset(batch_shape=(3,))
    obs = env.observe(sim)
    dyn = observation_factory(obs, "dynamic_state")
    assert set(dyn) == {"pose_x", "pose_y", "delta", "linear_vel_x",
                        "pose_theta", "ang_vel_z", "beta"}
    assert dyn["pose_x"].shape == (3,)
    fr = observation_factory(obs, "frenet_dynamic_state", sim=sim)
    assert {"s", "ey", "epsi"} <= set(fr)
    full = observation_factory(obs, "original", sim=sim)
    assert {"collision", "lap_time", "lap_count"} <= set(full)
    custom = observation_factory(obs, features=["ey", "epsi"])
    assert set(custom) == {"ey", "epsi"}
    try:
        observation_factory(obs, "nope")
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError for unknown type")
