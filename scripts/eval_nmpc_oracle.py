#!/usr/bin/env python
"""NMPC-vs-oracle agreement report: solve sampled frenet lattice rows with
the batched AL/projected-Newton solver AND the independent scipy SLSQP
oracle (f64, host), print feasibility overlap + objective/control agreement
percentiles (VERDICT r1 item #4; the reference's IPOPT anchor,
nonlinear_dmpc_frenet.py:605-649).

Run on CPU (the oracle is host-side anyway):
  env JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu \
      python scripts/eval_nmpc_oracle.py --n_rows 200
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_rows", type=int, default=200)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--maxiter", type=int, default=300)
    p.add_argument("--json_out", type=str, default=None)
    args = p.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from irbfn_tpu.dynamics.params import fullscale_params
    from irbfn_tpu.solvers.nmpc import NMPCConfig
    from irbfn_tpu.solvers.oracle import compare_to_oracle

    rng = np.random.default_rng(args.seed)
    n = args.n_rows
    rows = np.column_stack([
        rng.uniform(-0.2, 2.0, n), rng.uniform(-0.3, 0.3, n),
        rng.uniform(1.0, 7.0, n), rng.uniform(-1.0, 1.0, n),
        rng.uniform(3.0, 7.0, n), rng.uniform(-2.6, 2.6, n),
        rng.uniform(-1.0, 1.0, n), rng.uniform(-0.1, 0.1, n)])
    m = compare_to_oracle(rows, fullscale_params(dtype=jnp.float64),
                          NMPCConfig(), maxiter=args.maxiter)
    printable = {k: v for k, v in m.items()
                 if k not in ("al_only_rel_gap", "both_mask")}
    for k, v in printable.items():
        print(f"{k}: {v}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(printable, f, indent=1)
        print(f"saved {args.json_out}")


if __name__ == "__main__":
    main()
