#!/usr/bin/env python
"""PPO-over-lattice training demo (reference deprecated/ppo.py capability):
train the categorical lattice-selection policy on the batched TrackEnv and
record the learning curve (reward / progress per update) to JSON.

The reference's ppo.py trains a Categorical policy over WCRBFN-generated
candidate trajectories in a Python gym loop with tensorboard logging; here
rollout -> GAE -> clipped-surrogate epochs is ONE jitted update on device
(train/ppo.py) and the envs are a vectorized batch.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax.numpy as jnp

from irbfn_tpu.dynamics.params import f1tenth_params
from irbfn_tpu.sim import TrackEnv, oval_track
from irbfn_tpu.train.ppo import PPOConfig, PPOTrainer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_updates", type=int, default=60)
    p.add_argument("--n_envs", type=int, default=64)
    p.add_argument("--n_steps", type=int, default=64)
    p.add_argument("--n_lattice", type=int, default=7)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="data/ppo_curve.json")
    args = p.parse_args()

    track = oval_track(n_samples=256, speed=3.0)
    env = TrackEnv(track, f1tenth_params(dtype=jnp.float32), sim_dt=0.02,
                   control_dt=0.1)
    cfg = PPOConfig(n_envs=args.n_envs, n_steps=args.n_steps)
    trainer = PPOTrainer(env, cfg, n_lattice=args.n_lattice, seed=args.seed)

    t0 = time.time()
    history = trainer.train(n_updates=args.n_updates)
    dt = time.time() - t0
    steps = args.n_updates * cfg.n_envs * cfg.n_steps
    rew = [h["reward"] for h in history]
    k = max(len(rew) // 10, 1)
    print(f"{args.n_updates} updates ({steps:,} env steps) in {dt:.1f}s "
          f"-> {steps / dt:,.0f} env steps/s")
    print(f"mean reward first-{k} {np.mean(rew[:k]):.4f} -> "
          f"last-{k} {np.mean(rew[-k:]):.4f}")
    with open(args.out, "w") as f:
        json.dump({"config": {k: getattr(args, k) for k in vars(args)},
                   "env_steps_per_s": steps / dt, "history": history}, f)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
