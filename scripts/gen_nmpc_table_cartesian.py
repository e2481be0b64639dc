#!/usr/bin/env python
"""Cartesian NMPC table generation (reference scripts/nmpc_data_generator.py
equivalent): 7-D (v_car, x_goal, y_goal, t_goal, v_goal, beta, angv) lattice
solved by the batched Cartesian AL/Newton NMPC, sharded over the mesh."""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from irbfn_tpu.dynamics.params import f1tenth_params
from irbfn_tpu.parallel import GridSpec, build_lattice, save_table, solve_lattice_sharded
from irbfn_tpu.solvers import cartesian_config, solve_cartesian_point
from irbfn_tpu.utils.args import add_io_args, add_vehicle_args


def main():
    p = argparse.ArgumentParser()
    # 7-D grid, defaults matching reference arg_utils.py:4-27 (step-based)
    for name, lo, hi, step in [
        ("v_car", 0.0, 7.0, 1.0), ("x_goal", 0.0, 3.5, 0.2),
        ("y_goal", 0.0, 3.5, 0.2), ("t_goal", -3.1, 3.1, 0.1),
        ("v_goal", 0.0, 7.0, 1.0), ("beta", -0.6, 0.6, 0.2),
        ("angv_z", -3.0, 3.0, 0.5),
    ]:
        p.add_argument(f"--{name}_min", type=float, default=lo)
        p.add_argument(f"--{name}_max", type=float, default=hi)
        p.add_argument(f"--d_{name}", type=float, default=step)
    add_vehicle_args(p)
    add_io_args(p)
    p.add_argument("--batch_per_device", type=int, default=8192)
    p.add_argument("--phase1_iters", type=int, default=12,
                   help="Newton cap for the cheap first pass of the tiered "
                        "solve (0 = flat). The feasibility certificate is "
                        "budget-independent, so cheap-pass-certified rows "
                        "are final and only flagged rows pay the full "
                        "budget (see gen_nmpc_table_frenet.py)")
    p.add_argument("--resolve_factor", type=int, default=4,
                   help="iteration-budget multiplier for the straggler "
                        "re-solve over still-flagged rows (0 disables)")
    args = p.parse_args()

    dims = ["v_car", "x_goal", "y_goal", "t_goal", "v_goal", "beta", "angv_z"]
    grid = []
    for d in dims:
        lo = getattr(args, f"{d}_min")
        hi = getattr(args, f"{d}_max")
        st = getattr(args, f"d_{d}")
        num = int(round((hi - lo) / st)) + 1
        grid.append(GridSpec(d, lo, hi, num))
    rows = build_lattice(tuple(grid), dtype=np.float32)
    print(f"lattice: {rows.shape[0]:,} NMPC problems")

    params = f1tenth_params(mu=args.mu, cs=args.cs)
    cfg = cartesian_config()

    def table_fields(r, cfg_):
        """Fetch ONLY what the table stores. The full NMPCSolution is
        ~560 B/row (states + the 86-wide onehot); at the full-resolution
        106.5M-row reference lattice that is ~59 GB through the ~10 MB/s
        dev tunnel — the fetch, not the solve, would set the wall clock.
        Returning (accel, steer_vel, feasible) cuts it to ~41 B/row and
        lets XLA dead-code-eliminate the unused output paths."""
        s = solve_cartesian_point(r, params, cfg_)
        return s.accel, s.steer_vel, s.feasible

    class Sol:
        """Host-side mutable copy of the table-relevant solution fields."""

        def __init__(self, s):
            self.accel = np.asarray(s[0]).copy()
            self.steer_vel = np.asarray(s[1]).copy()
            self.feasible = np.asarray(s[2]).copy()

    def resolve_flagged(sol, cfg2, tag):
        bad = np.nonzero(~sol.feasible)[0]
        if not bad.size:
            return sol
        t0 = time.time()
        s2 = solve_lattice_sharded(
            lambda r: table_fields(r, cfg2), rows[bad],
            batch_per_device=args.batch_per_device)
        rec = np.asarray(s2[2])
        sol.accel[bad] = np.asarray(s2[0])
        sol.steer_vel[bad] = np.asarray(s2[1])
        sol.feasible[bad] = rec
        print(f"  {tag}: recovered {int(rec.sum()):,}/{bad.size:,} flagged "
              f"rows in {time.time() - t0:.0f}s -> "
              f"{100 * float(sol.feasible.mean()):.1f}% feasible")
        return sol

    t0 = time.time()
    if args.phase1_iters > 0:
        cfg1 = cartesian_config(gn_iters=args.phase1_iters)
        sol = Sol(solve_lattice_sharded(
            lambda r: table_fields(r, cfg1), rows,
            batch_per_device=args.batch_per_device, progress=True))
        print(f"cheap pass ({args.phase1_iters}-cap) certified "
              f"{100 * float(sol.feasible.mean()):.1f}%")
        sol = resolve_flagged(sol, cfg, "full-budget re-solve")
    else:
        sol = Sol(solve_lattice_sharded(
            lambda r: table_fields(r, cfg), rows,
            batch_per_device=args.batch_per_device, progress=True))
    dt = time.time() - t0
    feas = float(np.asarray(sol.feasible).mean())
    print(f"{rows.shape[0] / dt:,.0f} solves/s, {100 * feas:.1f}% feasible")
    if args.resolve_factor > 0:
        cfg_hard = cartesian_config(
            gn_iters=cfg.gn_iters * max(args.resolve_factor, 1),
            al_outer=cfg.al_outer + 2)
        sol = resolve_flagged(
            sol, cfg_hard,
            f"straggler re-solve ({args.resolve_factor}x budget)")

    accel = np.asarray(sol.accel)
    sv = np.asarray(sol.steer_vel)
    outputs = np.concatenate([accel, sv], axis=-1)  # (N, 2T) ref layout
    valid = np.asarray(sol.feasible)
    outputs[~valid] = -999.0
    name = "x".join(str(g.num) for g in grid)
    out = (f"{args.save_path}/cart_table_{name}_mu{args.mu}_cs{args.cs}"
           f"{args.run_tag}.npz")
    save_table(out, {"inputs": rows, "outputs": outputs, "valid": valid})
    print(f"saved {out}")


if __name__ == "__main__":
    main()
