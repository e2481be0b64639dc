"""Multi-agent simulator tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from irbfn_tpu.dynamics.params import f1tenth_params
from irbfn_tpu.sim import oval_track
from irbfn_tpu.sim.multi_agent import MultiAgentEnv, pairwise_collisions


@pytest.fixture(scope="module")
def env():
    track = oval_track(n_samples=256, speed=3.0)
    return MultiAgentEnv(track, f1tenth_params(dtype=jnp.float64), n_agents=3)


def test_reset_staggers_agents(env):
    st = env.reset(s0=jnp.asarray([0.0, 2.0, 4.0]), speed0=1.0)
    assert st.x.shape == (3, 7)
    d01 = np.linalg.norm(np.asarray(st.x[0, :2] - st.x[1, :2]))
    assert 1.0 < d01 < 3.0
    assert not bool(st.collided.any())


def test_separated_agents_no_collision(env):
    st = env.reset(s0=jnp.asarray([0.0, 5.0, 10.0]), speed0=2.0)
    for _ in range(5):
        st = env.step(st, jnp.zeros((3, 2)))
    assert not bool(st.collided.any())


def test_pairwise_collision_detects_overlap(env):
    st = env.reset(s0=jnp.asarray([0.0, 0.15, 10.0]), speed0=0.0)
    hits = pairwise_collisions(st.x, env.params)
    assert bool(hits[0]) and bool(hits[1])
    assert not bool(hits[2])


def test_collided_agents_freeze(env):
    st = env.reset(s0=jnp.asarray([0.0, 0.15, 10.0]), speed0=2.0)
    st = env.step(st, jnp.zeros((3, 2)))
    assert bool(st.collided[0]) and bool(st.collided[1])
    x_before = np.asarray(st.x[:2, :2])
    st2 = env.step(st, jnp.zeros((3, 2)))
    np.testing.assert_allclose(np.asarray(st2.x[:2, :2]), x_before)  # frozen
    # agent 2 keeps moving
    assert np.linalg.norm(np.asarray(st2.x[2, :2] - st.x[2, :2])) > 0.1


def test_observe_shapes(env):
    st = env.reset(s0=jnp.asarray([0.0, 5.0, 10.0]))
    obs = env.observe(st)
    assert obs["s"].shape == (3,)
    assert obs["opponent_offsets"].shape == (3, 3, 2)
