#!/usr/bin/env python
"""Straggler re-solve patch for an EXISTING table npz (VERDICT r2 item #2).

Tables generated before the straggler pass existed (or with
``--resolve_factor 0``) carry -999 holes where the f32 solver at the tuned
budget gave up on rows the problem actually admits. Instead of regenerating
the whole lattice (hours through the host tunnel for a GB-scale table),
re-solve ONLY the flagged rows at a multiplied iteration budget — they are
~9% of the table, so this is ~25x cheaper than a full regen — and patch
outputs/constraints/valid in place (same npz layout as
reference scripts/nmpc_data_generator_frenet.py:110-140).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from irbfn_tpu.dynamics.params import fullscale_params
from irbfn_tpu.parallel import TableSolution, solve_lattice_sharded
from irbfn_tpu.solvers import NMPCConfig, solve_lattice_point


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--npz_path", type=str, required=True)
    p.add_argument("--out", type=str, default=None,
                   help="output path (default: overwrite input)")
    p.add_argument("--mu", type=float, default=1.0)
    p.add_argument("--cs", type=float, default=5.0)
    p.add_argument("--resolve_factor", type=int, default=4)
    p.add_argument("--batch_per_device", type=int, default=8192)
    args = p.parse_args()

    data = dict(np.load(args.npz_path))
    valid = data["valid"].astype(bool)
    bad = np.nonzero(~valid)[0]
    n = valid.size
    print(f"{n:,} rows, {bad.size:,} flagged infeasible "
          f"({100 * bad.size / n:.1f}%)")
    if not bad.size:
        print("nothing to patch")
        return

    cfg = NMPCConfig()
    cfg_hard = NMPCConfig(
        gn_iters=cfg.gn_iters * max(args.resolve_factor, 1),
        al_outer=cfg.al_outer + 2)
    keep_onehot = "constraints" in data
    solve_hard = lambda r, pv: TableSolution.from_solution(  # noqa: E731
        solve_lattice_point(r, pv, cfg_hard), include_onehot=keep_onehot)
    params = fullscale_params(mu=args.mu, cs=args.cs)
    rows = data["inputs"][bad].astype(np.float32)
    t0 = time.time()
    sol = solve_lattice_sharded(solve_hard, rows,
                                batch_per_device=args.batch_per_device,
                                progress=True, args=(params,))
    rec = np.asarray(sol.feasible)
    dt = time.time() - t0
    print(f"re-solve ({args.resolve_factor}x budget): recovered "
          f"{int(rec.sum()):,}/{bad.size:,} in {dt:.0f}s "
          f"-> {100 * (valid.mean() + rec.sum() / n):.1f}% feasible")

    fixed = bad[rec]
    out_ctrl = np.stack([np.asarray(sol.accel)[rec],
                         np.asarray(sol.steer_vel)[rec]], axis=-1)
    data["outputs"][fixed] = out_ctrl.astype(data["outputs"].dtype)
    if keep_onehot:
        data["constraints"][fixed] = np.asarray(
            sol.active_onehot)[rec].astype(data["constraints"].dtype)
    data["valid"][fixed] = True

    out = args.out or args.npz_path
    t0 = time.time()
    np.savez(out, **data)
    print(f"saved {out} in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
