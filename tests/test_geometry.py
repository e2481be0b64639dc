"""Geometry-op tests: jnp nearest/intersect vs straightforward references."""

import jax.numpy as jnp
import numpy as np

from irbfn_tpu.ops.geometry import intersect_point, nearest_point


def _poly():
    t = np.linspace(0, 2 * np.pi, 50, endpoint=False)
    return np.stack([10 * np.cos(t), 5 * np.sin(t)], axis=-1)


def test_nearest_point_on_segment():
    traj = jnp.asarray([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]])
    p, d, t, i = nearest_point(jnp.asarray([5.0, 3.0]), traj)
    np.testing.assert_allclose(p, [5.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(d, 3.0, atol=1e-12)
    np.testing.assert_allclose(t, 0.5, atol=1e-12)
    assert int(i) == 0


def test_nearest_point_clamps_to_vertex():
    traj = jnp.asarray([[0.0, 0.0], [10.0, 0.0]])
    p, d, t, i = nearest_point(jnp.asarray([12.0, 1.0]), traj)
    np.testing.assert_allclose(p, [10.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(t, 1.0, atol=1e-12)


def test_nearest_point_batched():
    traj = jnp.asarray(_poly())
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(16, 2)) * 3)
    p, d, t, i = nearest_point(pts, traj)
    assert p.shape == (16, 2) and d.shape == (16,)
    for k in range(16):
        pk, dk, tk, ik = nearest_point(pts[k], traj)
        np.testing.assert_allclose(p[k], pk, atol=1e-12)
        assert int(i[k]) == int(ik)


def test_intersect_point_circle_crossing():
    """Straight trajectory through origin; circle of radius 2 around origin
    must be exited at x=+2 searching forward."""
    traj = jnp.asarray(np.stack([np.linspace(-5, 5, 21),
                                 np.zeros(21)], axis=-1))
    p, i, t = intersect_point(jnp.asarray([0.0, 0.0]), 2.0, traj, t=0.0)
    # first crossing from the trajectory start: enters the circle at x=-2
    np.testing.assert_allclose(p[0], -2.0, atol=1e-5)
    np.testing.assert_allclose(p[1], 0.0, atol=1e-5)


def test_intersect_point_forward_search():
    traj = jnp.asarray(np.stack([np.linspace(-5, 5, 21),
                                 np.zeros(21)], axis=-1))
    # start searching from segment index 10 (x=0): finds the +2 exit
    p, i, t = intersect_point(jnp.asarray([0.0, 0.0]), 2.0, traj, t=10.0)
    np.testing.assert_allclose(p[0], 2.0, atol=1e-5)


def test_intersect_point_no_hit():
    traj = jnp.asarray([[10.0, 10.0], [11.0, 10.0]])
    p, i, t = intersect_point(jnp.asarray([0.0, 0.0]), 1.0, traj)
    assert int(i) == -1
    assert np.isnan(float(p[0]))
