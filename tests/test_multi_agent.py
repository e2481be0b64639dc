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


def test_ray_segment_distance_analytic():
    from irbfn_tpu.sim.multi_agent import ray_segment_distance

    va = jnp.asarray([5.0, -1.0])
    vb = jnp.asarray([5.0, 1.0])
    # straight ahead along +x: hits the vertical segment at x=5
    d = ray_segment_distance(0.0, 0.0, 0.0, va, vb)
    np.testing.assert_allclose(float(d), 5.0, rtol=1e-6)
    # ray pointing away: miss
    assert np.isinf(float(ray_segment_distance(0.0, 0.0, np.pi, va, vb)))
    # ray that passes beside the segment: miss
    assert np.isinf(float(ray_segment_distance(0.0, 2.0, 0.0, va, vb)))
    # 45-degree hit on a long wall: sqrt(2) * 5
    vaw = jnp.asarray([5.0, -20.0])
    vbw = jnp.asarray([5.0, 20.0])
    d45 = ray_segment_distance(0.0, 0.0, np.pi / 4, vaw, vbw)
    np.testing.assert_allclose(float(d45), 5.0 * np.sqrt(2.0), rtol=1e-6)
    # parallel (never intersects): miss
    assert np.isinf(float(ray_segment_distance(0.0, 0.0, np.pi / 2, va, vb)))


def test_ray_cast_footprints_opponent_ahead():
    """Center beam of an agent looking straight at an opponent reads the
    gap minus the opponent's rear half-length; side beams stay open."""
    from irbfn_tpu.sim.map import ScanSpec
    from irbfn_tpu.sim.multi_agent import ray_cast_footprints

    L, W = 0.58, 0.31
    spec = ScanSpec(n_beams=9, fov=np.pi / 2)
    angles = jnp.linspace(-spec.fov / 2, spec.fov / 2, spec.n_beams)
    x = jnp.zeros((2, 7)).at[1, 0].set(5.0)  # opponent 5 m dead ahead
    base = jnp.full((2, 9), spec.max_range)
    scan = np.asarray(ray_cast_footprints(x, base, angles, L, W))
    np.testing.assert_allclose(scan[0, 4], 5.0 - L / 2, rtol=1e-5)
    # widest beams (45 deg) miss the car
    assert scan[0, 0] == spec.max_range and scan[0, -1] == spec.max_range
    # the opponent looks backwards at the ego too (symmetric geometry)
    np.testing.assert_allclose(scan[1, 4], spec.max_range)  # fov faces +x
    # self-footprint never shortens a single agent's scan
    solo = np.asarray(ray_cast_footprints(x[:1], base[:1], angles, L, W))
    assert (solo == spec.max_range).all()


def test_ray_cast_footprints_matches_loop_oracle():
    """Random poses: the branchless all-pairs grid equals a per-(beam, edge)
    loop port of the published ray-segment intersection (the gym's
    get_range semantics, laser_models.py:316-346)."""
    from irbfn_tpu.sim.multi_agent import (footprint_vertices,
                                           ray_cast_footprints)

    rng = np.random.default_rng(3)
    L, W = 0.58, 0.31
    A, B = 3, 21
    x = np.zeros((A, 7))
    x[:, 0] = rng.uniform(-3, 3, A)
    x[:, 1] = rng.uniform(-3, 3, A)
    x[:, 4] = rng.uniform(-np.pi, np.pi, A)
    angles = np.linspace(-2.35, 2.35, B)
    base = np.full((A, B), 30.0)
    got = np.asarray(ray_cast_footprints(jnp.asarray(x), jnp.asarray(base),
                                         jnp.asarray(angles), L, W))
    verts = np.asarray(footprint_vertices(jnp.asarray(x), L, W))  # (A,4,2)
    want = base.copy()
    for i in range(A):
        o = x[i, :2]
        for b in range(B):
            t = x[i, 4] + angles[b]
            n = np.array([-np.sin(t), np.cos(t)])
            for j in range(A):
                if j == i:
                    continue
                for k in range(4):
                    va = verts[j, k]
                    vb = verts[j, (k + 1) % 4]
                    v1, v2 = o - va, vb - va
                    den = v2 @ n
                    if abs(den) < 1e-12:
                        continue
                    d1 = (v2[0] * v1[1] - v2[1] * v1[0]) / den
                    d2 = (v1 @ n) / den
                    if d1 >= 0 and 0 <= d2 <= 1 and d1 < want[i, b]:
                        want[i, b] = d1
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_multi_agent_scan_and_ttc_stop():
    """An ego driving at a stopped opponent dead ahead emergency-brakes on
    iTTC (gym check_ttc parity) before the rectangles ever touch."""
    from irbfn_tpu.sim.map import ScanSpec
    from irbfn_tpu.sim.track import oval_track

    track = oval_track(n_samples=256, speed=3.0)
    env = MultiAgentEnv(track, f1tenth_params(dtype=jnp.float64), n_agents=2,
                        scan_spec=ScanSpec(n_beams=33, fov=4.7),
                        enable_ttc=True, ttc_thresh=0.4)
    st = env.reset(s0=jnp.asarray([0.0, 3.0]), speed0=0.0)
    st = st._replace(x=st.x.at[0, 3].set(2.0))  # ego closes at 2 m/s
    obs = env.observe(st)
    assert obs["scan"].shape == (2, 33)
    # ego's forward beam sees the opponent, not open space
    assert float(obs["scan"][0].min()) < 3.0
    hit_step = None
    for k in range(20):
        st = env.step(st, jnp.zeros((2, 2)))
        if bool(st.collided[0]):
            hit_step = k
            break
    assert hit_step is not None, "TTC never triggered"
    # stopped by the safety check, not by rectangle contact: still a gap
    gap = float(jnp.linalg.norm(st.x[1, :2] - st.x[0, :2]))
    assert gap > 0.58  # more than a car length apart center-to-center
    assert float(st.x[0, 3]) == 0.0  # velocity zeroed in place
    assert not bool(st.collided[1])  # the parked opponent is untouched


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
