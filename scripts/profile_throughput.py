#!/usr/bin/env python
"""Trajectory-generation throughput profiling (reference
deprecated/evaluate.py:208-240's "TrajGen frequency Hz" harness).

Profiles the three serving paths over repeated batched evals with input
noise (as the reference does): net forward, net+integration (full plan), and
the online clothoid-solver baseline (the pyclothoids comparison,
evaluate.py:218-230 — here the baseline also runs on device).
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax
import jax.numpy as jnp

from irbfn_tpu.dynamics.spiral import sample_path
from irbfn_tpu.solvers import solve_g1_lattice
from irbfn_tpu.utils.profiling import throughput


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=500)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--config_f", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    goals = jnp.asarray(np.column_stack([
        rng.uniform(8, 20, args.batch), rng.uniform(-4, 4, args.batch),
        rng.uniform(-0.8, 0.8, args.batch)]).astype(np.float32))

    if args.config_f:
        from irbfn_tpu.train import load_model

        model, params, _ = load_model(args.config_f, args.ckpt)
        net = jax.jit(lambda g: jnp.sum(
            model.apply({"params": params["params"]}, g)))
    else:
        net = None

    results = {}
    solver_fn = jax.jit(lambda g: jnp.sum(solve_g1_lattice(g)))
    results["clothoid_solver"] = throughput(
        solver_fn, goals, items=args.batch, iters=args.iters, sync="fetch")

    full_fn = jax.jit(lambda g: jnp.sum(
        sample_path(solve_g1_lattice(g), n_points=9)))
    results["solve_plus_integrate"] = throughput(
        full_fn, goals, items=args.batch, iters=args.iters, sync="fetch")

    if net is not None:
        results["net_forward"] = throughput(
            net, goals, items=args.batch, iters=args.iters, sync="fetch")

    for name, stats in results.items():
        print(f"{name}: {stats['items_per_s']:,.0f} trajs/s "
              f"({1e3 * stats['median_s']:.3f} ms / batch-{args.batch})")
    print(json.dumps({k: v["items_per_s"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
