#!/usr/bin/env python
"""Trajectory-fan figure (the reference README's traj_out.png,
deprecated/evaluate.py:119-155): solve a fan of goal poses, integrate the
spirals, plot all trajectories."""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from irbfn_tpu.dynamics.spiral import sample_path  # noqa: E402
from irbfn_tpu.solvers import solve_g1_lattice  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="traj_out.png")
    p.add_argument("--config_f", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    args = p.parse_args()

    xs = np.linspace(8.0, 25.0, 6)
    ys = np.linspace(-7.0, 7.0, 15)
    ts = np.linspace(-1.2, 1.2, 5)
    X, Y, T = np.meshgrid(xs, ys, ts, indexing="ij")
    goals = jnp.asarray(np.stack([X, Y, T], axis=-1).reshape(-1, 3))

    if args.config_f:
        from irbfn_tpu.train import load_model

        model, params, _ = load_model(args.config_f, args.ckpt)
        spiral_params = model.apply({"params": params["params"]},
                                    goals.astype(jnp.float32))
        label = "net"
    else:
        spiral_params = solve_g1_lattice(goals)
        label = "solver"

    paths = np.asarray(sample_path(spiral_params, n_points=32))
    fig, ax = plt.subplots(figsize=(8, 6))
    for traj in paths:
        ax.plot(traj[:, 0], traj[:, 1], lw=0.4, alpha=0.5, color="tab:blue")
    ax.plot(np.asarray(goals[:, 0]), np.asarray(goals[:, 1]), ".",
            ms=2, color="tab:red", label="goals")
    ax.set_aspect("equal")
    ax.set_title(f"clothoid trajectory fan ({label}, {goals.shape[0]} goals)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
