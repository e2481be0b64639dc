"""Track / closed-loop simulator tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irbfn_tpu.dynamics.params import f1tenth_params
from irbfn_tpu.sim import TrackEnv, deviation_metrics, oval_track


@pytest.fixture(scope="module")
def track():
    return oval_track(length=30.0, width=15.0, n_samples=512, speed=3.0)


def test_frenet_roundtrip(track):
    """cartesian -> frenet -> cartesian is identity on and off the line."""
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.uniform(0, float(track.raceline.length), 32))
    ey = jnp.asarray(rng.uniform(-1.0, 1.0, 32))
    epsi = jnp.asarray(rng.uniform(-0.5, 0.5, 32))
    x, y, th = track.frenet_to_cartesian(s, ey, epsi)
    s2, ey2, epsi2 = track.cartesian_to_frenet(x, y, th)
    # s may wrap at the seam; compare positions after a second conversion
    x2, y2, th2 = track.frenet_to_cartesian(s2, ey2, epsi2)
    np.testing.assert_allclose(x2, x, atol=2e-2)
    np.testing.assert_allclose(y2, y, atol=2e-2)
    np.testing.assert_allclose(ey2, ey, atol=2e-2)
    np.testing.assert_allclose(epsi2, epsi, atol=2e-2)


def test_track_arrays_consistent(track):
    rl = track.raceline
    assert rl.xs.shape == rl.ys.shape == rl.yaws.shape == rl.ks.shape
    # arc length increases and total length matches the polyline
    ds = np.diff(np.asarray(rl.ss))
    assert (ds > 0).all()
    assert float(rl.length) > 2 * (30.0 + 15.0) * 0.8  # near perimeter


def test_env_straight_driving(track):
    """Constant-speed straight start stays near the line for a short time."""
    env = TrackEnv(track, f1tenth_params(dtype=jnp.float64))
    sim = env.reset(s0=2.0, speed0=3.0)
    obs0 = env.observe(sim)
    assert abs(float(obs0.ey)) < 0.05
    for _ in range(5):
        sim = env.step(sim, jnp.asarray([0.0, 0.0]))
    obs = env.observe(sim)
    assert float(sim.s) > 2.0 + 1.0  # progressed along the track
    assert abs(float(obs.ey)) < 0.5


def test_env_batched_rollout(track):
    env = TrackEnv(track, f1tenth_params(dtype=jnp.float64))
    sim = env.reset(s0=jnp.asarray([0.0, 5.0, 10.0, 15.0]),
                    speed0=2.0, batch_shape=(4,))

    def policy(obs):
        # steer-velocity P control toward the line + speed hold
        sv = -1.5 * obs.ey * jnp.sign(jnp.cos(obs.epsi)) - 0.5 * obs.delta
        return jnp.stack([jnp.zeros_like(sv), jnp.clip(sv, -3.2, 3.2)], axis=-1)

    final, traj = env.rollout(sim, policy, n_steps=20)
    assert final.x.shape == (4, 7)
    ey_mean, epsi_mean = deviation_metrics(traj)
    assert ey_mean.shape == (4,)
    assert bool(jnp.all(final.s > sim.s))  # everyone progressed


def test_env_lap_counting(track):
    env = TrackEnv(track, f1tenth_params(dtype=jnp.float64))
    length = float(track.raceline.length)
    sim = env.reset(s0=length - 0.5, speed0=5.0)
    for _ in range(4):
        sim = env.step(sim, jnp.asarray([0.0, 0.0]))
    assert int(sim.laps) >= 1


def test_env_offtrack_terminates_and_freezes(track):
    """Leaving the corridor sets done (the gym's collision-with-map
    termination, eval_dnmpc.py:77-80) and the episode freezes in place."""
    env = TrackEnv(track, f1tenth_params(dtype=jnp.float64), half_width=0.3)
    sim = env.reset(s0=2.0, speed0=3.0)
    # hard constant steer drives off the 0.3 m corridor quickly
    for _ in range(20):
        sim = env.step(sim, jnp.asarray([0.0, 3.0]))
    assert bool(sim.done)
    frozen = env.step(sim, jnp.asarray([5.0, 3.0]))
    np.testing.assert_array_equal(np.asarray(frozen.x), np.asarray(sim.x))
    assert float(frozen.s) == float(sim.s)
    assert float(frozen.t) == float(sim.t)


def test_deviation_metrics_mask_post_termination(track):
    """Metrics only average live steps: a crashed episode's frozen tail
    must not dilute (or inflate) its deviation statistics."""
    env = TrackEnv(track, f1tenth_params(dtype=jnp.float64), half_width=0.8)
    sim = env.reset(s0=jnp.asarray([2.0, 2.0]), speed0=2.0, batch_shape=(2,))

    def policy(obs):
        # episode 0 tracks the line; episode 1 steers hard off-track
        sv_stab = jnp.clip(-1.5 * obs.ey - 1.0 * obs.epsi - 0.5 * obs.delta,
                           -3.2, 3.2)
        sv = jnp.where(jnp.arange(2) == 1, 3.0, sv_stab)
        return jnp.stack([jnp.zeros_like(sv), sv], axis=-1)

    final, traj = env.rollout(sim, policy, n_steps=40)
    assert not bool(final.done[0]) and bool(final.done[1])
    ey_mask, _ = deviation_metrics(traj)
    ey_all, _ = deviation_metrics(traj.obs)  # unmasked fallback path
    # unmasked average includes the frozen off-track tail -> differs
    assert abs(float(ey_mask[1]) - float(ey_all[1])) > 1e-6
    # the surviving episode is unaffected by masking
    np.testing.assert_allclose(float(ey_mask[0]), float(ey_all[0]), rtol=1e-6)
