#!/usr/bin/env python
"""Clothoid G1-Hermite LUT generation (reference deprecated/genlut.py
equivalent): a 3-D (x, y, theta) goal lattice solved on-device, sharded over
the mesh — one XLA dispatch per chunk instead of 100 joblib processes.

Output npz layout matches the reference (``lut`` of shape
(nx, ny, nt, 5) = [k0, k1, k2, k3, s] plus the axis arrays, genlut.py:69-71).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from irbfn_tpu.parallel import GridSpec, build_lattice, solve_lattice_sharded
from irbfn_tpu.solvers import solve_g1_lattice
from irbfn_tpu.utils.args import add_clothoid_grid_args, add_io_args


def main():
    p = argparse.ArgumentParser()
    add_clothoid_grid_args(p)
    add_io_args(p)
    args = p.parse_args()

    nx = int(round((args.maxx - args.minx) / args.dx)) + 1
    ny = int(round((args.maxy - args.miny) / args.dy)) + 1
    nt = int(round((args.maxt - args.mint) / args.dt)) + 1
    grid = (GridSpec("x", args.minx, args.maxx, nx),
            GridSpec("y", args.miny, args.maxy, ny),
            GridSpec("theta", args.mint, args.maxt, nt))
    goals = build_lattice(grid, dtype=np.float32)
    print(f"lattice: {goals.shape[0]:,} goals ({nx}x{ny}x{nt})")

    t0 = time.time()
    params = solve_lattice_sharded(lambda g: solve_g1_lattice(g), goals)
    dt = time.time() - t0
    print(f"solved in {dt:.2f}s -> {goals.shape[0] / dt:,.0f} solves/s")

    lut = params.reshape(nx, ny, nt, 5)
    out = f"{args.save_path}/lut_allkappa{args.run_tag}.npz"
    np.savez(out, lut=lut, xlut=grid[0].values(), ylut=grid[1].values(),
             tlut=grid[2].values())
    print(f"saved {out}")


if __name__ == "__main__":
    main()
