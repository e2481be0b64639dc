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


def test_sat_rects_overlap_exact():
    """SAT oriented-rectangle test against analytic cases: clearly
    overlapping, clearly separated, and rotation-dependent close passes a
    disc proxy gets wrong."""
    import jax.numpy as jnp

    from irbfn_tpu.sim.multi_agent import rects_overlap

    L, W = 0.58, 0.31
    c0 = jnp.zeros(2)
    # same place: overlap
    assert bool(rects_overlap(c0, 0.0, c0, 0.0, L, W))
    # nose-to-tail with a gap: no overlap
    assert not bool(rects_overlap(c0, 0.0, jnp.asarray([L + 0.02, 0.0]),
                                  0.0, L, W))
    # nose-to-tail touching region: overlap
    assert bool(rects_overlap(c0, 0.0, jnp.asarray([L - 0.02, 0.0]),
                              0.0, L, W))
    # side-by-side with a lateral gap: no overlap
    assert not bool(rects_overlap(c0, 0.0, jnp.asarray([0.0, W + 0.02]),
                                  0.0, L, W))
    # the rotation-sensitive case: second car at 90 deg, offset laterally
    # by between W/2+W/2 and W/2+L/2 -> rectangles MISS, but bounding
    # discs (radius ~ L/2) would "collide"
    off = jnp.asarray([0.0, W / 2 + L / 2 - 0.02])
    assert bool(rects_overlap(c0, 0.0, off, jnp.pi / 2, L, W))
    off2 = jnp.asarray([L / 2 + W / 2 + 0.02, 0.0])
    assert not bool(rects_overlap(c0, 0.0, off2, jnp.pi / 2, L, W))
    # diagonal corner clip at 45 deg
    d = (L / 2 + (L + W) / (2 * jnp.sqrt(2.0))) - 0.02
    assert bool(rects_overlap(c0, 0.0, jnp.asarray([float(d), 0.0]),
                              jnp.pi / 4, L, W))


def test_pairwise_rect_vs_disc_models():
    """rect model flags the true side-swipe and clears the near-miss the
    disc proxy falsely flags."""
    import jax.numpy as jnp

    from irbfn_tpu.dynamics.params import f1tenth_params
    from irbfn_tpu.sim.multi_agent import pairwise_collisions

    p = f1tenth_params()
    # two cars side by side, 0.4 m apart laterally (> W=0.31: no contact),
    # same heading
    x = jnp.zeros((2, 7)).at[1, 1].set(0.4)
    assert not bool(pairwise_collisions(x, p, collision_model="rect").any())
    # 0.25 m apart: real side contact
    x2 = jnp.zeros((2, 7)).at[1, 1].set(0.25)
    assert bool(pairwise_collisions(x2, p, collision_model="rect").all())
    # disc proxy is conservative on the 0.4 m case (radius 0.255 per disc)
    assert bool(pairwise_collisions(x, p, collision_model="discs").any())


def test_footprint_clearance_orientation_sensitive():
    """A long narrow footprint fits a corridor lengthwise but collides
    crosswise — the single-disc proxy can't tell the difference."""
    import jax.numpy as jnp
    import numpy as np

    from irbfn_tpu.sim.map import footprint_clearance, from_bitmap

    # 1 m wide horizontal corridor in a 4x4 m map
    res = 0.02
    n = int(4.0 / res)
    free = np.zeros((n, n), bool)
    half = int(0.5 / res)
    free[n // 2 - half:n // 2 + half, :] = True
    omap = from_bitmap(free, res, (-2.0, -2.0, 0.0))
    # car aligned with the corridor: clear
    c_along = float(footprint_clearance(omap, 0.0, 0.0, 0.0,
                                        length=1.4, width=0.3))
    # car across the corridor: nose/tail would poke the walls
    c_across = float(footprint_clearance(omap, 0.0, 0.0, jnp.pi / 2,
                                         length=1.4, width=0.3))
    assert c_along > 0
    assert c_across < 0
