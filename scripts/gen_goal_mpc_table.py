#!/usr/bin/env python
"""Goal-MPC table generation — the reference's ">1.1 billion point" lattice
(deprecated/goal_mpc_data_generator.py:7-52: 5-D grid over
v_car x x_goal x y_goal x t_goal x v_goal, one cvxpy/OSQP solve per point
split over 45 joblib processes).

TPU-native: the lattice is organized as (v_car family) x (goal block) — every
goal in a family shares the condensed QP matrices and ONE KKT factorization
(solvers/goal_mpc.py), so each ADMM iteration over a goal chunk is two MXU
GEMMs.  One compiled program (v_car is a traced scalar) covers all families.

Output npz (reference row layout, goal_mpc_node.py:356-366): ``inputs``
(N, 5) = (v_car, x_goal, y_goal, t_goal, v_goal), ``outputs`` (N, 2) =
(speed, steer), ``valid`` = final-residual convergence mask, plus grid
metadata for the explicit planners' GridTable loader.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from irbfn_tpu.parallel import GridSpec, build_lattice  # noqa: E402
from irbfn_tpu.solvers.goal_mpc import (  # noqa: E402
    GoalMPCConfig,
    solve_goal_lattice_sharded,
)


def main():
    p = argparse.ArgumentParser()
    # reference grid (goal_mpc_data_generator.py:7-31), arange semantics
    # (inclusive endpoint via +step, the reference's float-arange quirk)
    for name, lo, hi, step in [
        ("v_car", -1.0, 8.0, 0.5), ("x_goal", -1.2, 4.0, 0.1),
        ("y_goal", 0.0, 4.0, 0.1), ("t_goal", -3.14, 3.14, 0.1),
        ("v_goal", -1.0, 8.0, 0.5),
    ]:
        p.add_argument(f"--{name}_min", type=float, default=lo)
        p.add_argument(f"--{name}_max", type=float, default=hi)
        p.add_argument(f"--d_{name}", type=float, default=step)
    p.add_argument("--save_path", type=str, default="./data")
    p.add_argument("--run_tag", type=str, default="")
    p.add_argument("--iters", type=int, default=600,
                   help="fixed ADMM sweeps (600 = every row of every "
                        "v_car family converges with the speed-scaled "
                        "rho law, measured on the full reference lattice)")
    p.add_argument("--chunk", type=int, default=262144,
                   help="goals per device dispatch")
    p.add_argument("--dtype", choices=["f32", "f64"], default="f32")
    args = p.parse_args()

    dims = ["v_car", "x_goal", "y_goal", "t_goal", "v_goal"]
    grid = []
    for d in dims:
        lo = getattr(args, f"{d}_min")
        hi = getattr(args, f"{d}_max")
        st = getattr(args, f"d_{d}")
        num = int(round((hi - lo) / st)) + 1
        grid.append(GridSpec(d, lo, hi, num))
    v_vals = grid[0].values()
    goal_grid = tuple(grid[1:])
    goals_raw = build_lattice(goal_grid, dtype=np.float32)  # (G, 4) x,y,t,v
    # solver goal ordering is (x, y, v, t) — the state layout
    goals = goals_raw[:, [0, 1, 3, 2]].astype(
        np.float32 if args.dtype == "f32" else np.float64)
    G = goals.shape[0]
    n_total = G * len(v_vals)
    print(f"lattice: {len(v_vals)} v_car families x {G:,} goals = "
          f"{n_total:,} QPs")

    dtype = jnp.float32 if args.dtype == "f32" else jnp.float64
    cfg = GoalMPCConfig()

    # mesh-sharded + transfer/compute pipelined per family; ONE compiled
    # program across families (v_car is a traced operand)
    n_dev = jax.device_count()
    bpd = max(min(args.chunk, G) // n_dev, 1)
    speed = np.empty((len(v_vals), G), np.float32)
    steer = np.empty((len(v_vals), G), np.float32)
    valid = np.empty((len(v_vals), G), bool)
    t0 = time.time()
    done = 0
    for vi, v in enumerate(v_vals):
        out = solve_goal_lattice_sharded(
            jnp.asarray(v, dtype), goals, cfg, iters=args.iters,
            batch_per_device=bpd)
        speed[vi] = out["speed"]
        steer[vi] = out["steer"]
        valid[vi] = out["converged"]
        done += G
        rate = done / (time.time() - t0)
        print(f"  family v_car={v:+.1f}: {done:,}/{n_total:,} "
              f"({rate:,.0f} QP solves/s incl. compile)")

    dt = time.time() - t0
    print(f"{n_total / dt:,.0f} QP solves/s overall; "
          f"{100 * valid.mean():.2f}% converged")

    # assemble reference row layout: v_car slowest axis (meshgrid 'ij' with
    # v_car first, goal_mpc_data_generator.py:38-47)
    inputs = np.concatenate(
        [np.repeat(v_vals, G).astype(np.float32)[:, None],
         np.tile(goals_raw, (len(v_vals), 1))], axis=1)
    outputs = np.stack([speed.reshape(-1), steer.reshape(-1)], axis=1)
    vmask = valid.reshape(-1)
    outputs[~vmask] = -999.0

    name = "x".join(str(g.num) for g in grid)
    out = f"{args.save_path}/goal_mpc_table_{name}{args.run_tag}.npz"
    np.savez_compressed(
        out, inputs=inputs, outputs=outputs, valid=vmask,
        lows=np.asarray([g.lo for g in grid], np.float32),
        highs=np.asarray([g.hi for g in grid], np.float32),
        nums=np.asarray([g.num for g in grid], np.int32),
        dims=np.asarray(dims))
    print(f"saved {out}")


if __name__ == "__main__":
    main()
