#!/usr/bin/env python
"""Goal-MPC net evaluation (reference deprecated/evaluate_goal_mpc.py):
table accuracy + OFF-GRID generalization, where the truth is a fresh batched
ADMM solve — the check the reference can't run cheaply (each off-grid truth
row would be another OSQP process call; here it's one device dispatch).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from irbfn_tpu.solvers.goal_mpc import solve_goal_mpc  # noqa: E402
from irbfn_tpu.train import load_model  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_f", type=str, required=True)
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--npz_path", type=str, required=True)
    p.add_argument("--n_offgrid", type=int, default=4096)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    model, params, _ = load_model(args.config_f, args.ckpt)
    apply = jax.jit(lambda xb: model.apply(params, xb))

    data = np.load(args.npz_path)
    inputs = data["inputs"].astype(np.float32)
    outputs = data["outputs"].astype(np.float32)
    valid = data["valid"]
    inputs, outputs = inputs[valid], outputs[valid]

    # table accuracy (strided)
    stride = max(inputs.shape[0] // 65536, 1)
    idx = np.arange(0, inputs.shape[0], stride)[:65536]
    ae = np.zeros(2)
    for i0 in range(0, idx.size, 8192):
        blk = idx[i0:i0 + 8192]
        pred = np.asarray(apply(jnp.asarray(inputs[blk])))
        ae += np.abs(pred - outputs[blk]).sum(axis=0)
    print(f"table:    speed MAE {ae[0] / idx.size:.4f} m/s, "
          f"steer MAE {ae[1] / idx.size:.4f} rad ({idx.size:,} rows)")

    # off-grid: uniform random rows inside the lattice box, truth from a
    # fresh per-row ADMM solve
    lows, highs = data["lows"], data["highs"]
    rng = np.random.default_rng(args.seed)
    off = rng.uniform(lows, highs,
                      (args.n_offgrid, len(lows))).astype(np.float32)
    truth = solve_goal_mpc(jnp.asarray(off), iters=1200)
    keep = np.asarray(truth.converged)
    y_true = np.stack([np.asarray(truth.speed), np.asarray(truth.steer)],
                      axis=1)[keep]
    pred = np.asarray(apply(jnp.asarray(off)))[keep]
    mae = np.abs(pred - y_true).mean(axis=0)
    print(f"off-grid: speed MAE {mae[0]:.4f} m/s, "
          f"steer MAE {mae[1]:.4f} rad ({int(keep.sum()):,} rows vs "
          "fresh ADMM truth)")


if __name__ == "__main__":
    main()
