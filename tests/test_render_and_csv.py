"""Render helpers + CSV track loading tests."""

import numpy as np

from irbfn_tpu.dynamics.params import f1tenth_params
from irbfn_tpu.sim import TrackEnv, from_csv, oval_track
from irbfn_tpu.sim.render import plot_episode


def test_from_csv_roundtrip(tmp_path):
    t = np.linspace(0, 2 * np.pi, 40, endpoint=False)
    pts = np.stack([12 * np.cos(t), 6 * np.sin(t),
                    np.full_like(t, 3.5)], axis=-1)
    path = str(tmp_path / "line.csv")
    np.savetxt(path, pts, delimiter=",", header="x,y,v", comments="# ")
    track = from_csv(path, speed_col=2, skip_header=1)
    assert float(track.raceline.length) > 50.0
    np.testing.assert_allclose(float(track.raceline.vxs[0]), 3.5, rtol=1e-5)


def test_plot_episode_renders(tmp_path):
    import jax.numpy as jnp

    track = oval_track(n_samples=128)
    env = TrackEnv(track, f1tenth_params())
    sim = env.reset(s0=0.0, speed0=2.0)
    _, traj = env.rollout(sim, lambda obs: jnp.asarray([0.0, 0.0]), 10)
    out = str(tmp_path / "ep.png")
    fig, ax = plot_episode(track, traj, goal_xy=(5.0, 0.0), path=out)
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_animate_episode_writes_gif(tmp_path):
    """RecordVideo-parity: a short batched episode renders to a GIF."""
    import jax.numpy as jnp

    from irbfn_tpu.dynamics.params import f1tenth_params
    from irbfn_tpu.sim import TrackEnv, oval_track
    from irbfn_tpu.sim.render import animate_episode

    track = oval_track()
    env = TrackEnv(track, f1tenth_params(dt=0.1))
    sim = env.reset(batch_shape=(2,), speed0=2.0)
    _, traj = env.rollout(sim, lambda o: jnp.zeros(o.ey.shape + (2,)), 8)
    out = tmp_path / "ep.gif"
    animate_episode(track, traj, str(out), fps=5)
    assert out.exists() and out.stat().st_size > 2000
