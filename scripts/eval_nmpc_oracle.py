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
    p.add_argument("--flagged_study", action="store_true",
                   help="false-infeasible study (VERDICT r2 item #2): "
                        "sample rows, take the subset the f32-budget AL "
                        "solver flags infeasible, check them against the "
                        "oracle (false-flag rate) and against a "
                        "--resolve_factor x budget re-solve (recovery "
                        "rate) — quantifies the -999 holes the table "
                        "generator's straggler pass fills")
    p.add_argument("--resolve_factor", type=int, default=4)
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

    params = fullscale_params(dtype=jnp.float64)
    cfg = NMPCConfig()

    if args.flagged_study:
        from irbfn_tpu.solvers.nmpc import solve_lattice_point
        from irbfn_tpu.solvers.oracle import solve_oracle_rows

        # f32 pass at the datagen budget: what the table generator flags
        sol32 = solve_lattice_point(jnp.asarray(rows, jnp.float32),
                                    fullscale_params(dtype=jnp.float32), cfg)
        flagged = ~np.asarray(sol32.feasible)
        rows_f = rows[flagged]
        print(f"{flagged.sum()}/{n} rows flagged infeasible at the "
              f"f32 datagen budget ({cfg.gn_iters}/{cfg.al_outer})")
        if not flagged.any():
            return
        oracle = solve_oracle_rows(rows_f, params, cfg,
                                   maxiter=args.maxiter)
        false_flag = oracle.feasible  # oracle-solvable but flagged
        cfg_hard = NMPCConfig(
            gn_iters=cfg.gn_iters * args.resolve_factor,
            al_outer=cfg.al_outer + 2)
        sol_hard = solve_lattice_point(jnp.asarray(rows_f, jnp.float32),
                                       fullscale_params(dtype=jnp.float32),
                                       cfg_hard)
        rec = np.asarray(sol_hard.feasible)
        m = {
            "n_rows": int(n),
            "flagged": int(flagged.sum()),
            "flagged_frac": float(flagged.mean()),
            "oracle_solvable_of_flagged": int(false_flag.sum()),
            "false_flag_rate_of_flagged": float(false_flag.mean()),
            "false_infeasible_frac_of_table": float(
                flagged.mean() * false_flag.mean()),
            "recovered_by_resolve": int(rec.sum()),
            "recovered_of_oracle_solvable": int((rec & false_flag).sum()),
            "residual_false_holes_frac": float(
                flagged.mean() * (false_flag & ~rec).mean()),
        }
        for k, v in m.items():
            print(f"{k}: {v}")
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(m, f, indent=1)
            print(f"saved {args.json_out}")
        return

    m = compare_to_oracle(rows, params, cfg, maxiter=args.maxiter)
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
