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
from irbfn_tpu.utils.profiling import chain_latency


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=500)
    p.add_argument("--config_f", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--c2", type=int, default=1024,
                   help="long chain length for the latency slope")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    goals = jnp.asarray(np.column_stack([
        rng.uniform(8, 20, args.batch), rng.uniform(-4, 4, args.batch),
        rng.uniform(-0.8, 0.8, args.batch)]).astype(np.float32))

    if args.config_f:
        from irbfn_tpu.train import load_model

        model, params, _ = load_model(args.config_f, args.ckpt)
        net = lambda g: model.apply({"params": params["params"]}, g)  # noqa: E731
    else:
        net = None

    # two-chain-length slope: a remote tunnel's ~25 ms RTT swamps a plain
    # wall-clock/batch measurement (it reports RTT, not the op)
    paths = {"clothoid_solver": solve_g1_lattice,
             "solve_plus_integrate":
                 lambda g: sample_path(solve_g1_lattice(g), n_points=9)}
    if net is not None:
        paths["net_forward"] = net

    results = {}
    for name, fwd in paths.items():
        per_call = chain_latency(fwd, goals, c2=args.c2)
        results[name] = args.batch / per_call
        print(f"{name}: {results[name]:,.0f} trajs/s "
              f"({1e6 * per_call:.1f} us / batch-{args.batch} on-device)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
