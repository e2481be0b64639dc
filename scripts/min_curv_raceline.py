#!/usr/bin/env python
"""Minimum-curvature width-feasible raceline via the framework's box-QP.

The EDT push projection (make_feasible_raceline.py) guarantees clearance but
converges to margin-contour geometry — |kappa| ~ 0.6+ at Oschersleben's
pinches, outside the planner tables' +-0.45 curvature coverage AND above
the grip limit at the tables' vx_goal floor (3.8 m/s needs k <= mu*g/3.8^2
~ 0.45 at mu 0.9). This solves the line the raceline literature solves
(TUM min-curvature QP): parameterize the path as centerline + alpha(s) *
normal(s), minimize the summed squared second differences (curvature
energy, quadratic in alpha), box-constrain alpha to the measured corridor
minus the clearance margin, and solve the single box-QP with
``solvers.qp._solve_box_qp_shared`` — the same ADMM the goal-MPC/quadrotor
lattices use.  An outer loop re-measures TRUE clearance with the sim's EDT
(`sim/map.py:distance_at` — the field the collision model actually uses)
and tightens the violated boxes, because the centerline CSV's constant
width columns overstate the corridor at corners.

Usage:
  python scripts/min_curv_raceline.py \
      --map_dir .../Oschersleben --margin 0.35 \
      --out data/Oschersleben_raceline_feasible.csv
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

from irbfn_tpu.sim.map import distance_at, load_track_bundle  # noqa: E402


def resample_closed(arr: np.ndarray, n: int) -> np.ndarray:
    """Arc-length resample of closed per-point data (first 2 cols = xy)."""
    xy = arr[:, :2]
    d = np.linalg.norm(np.roll(xy, -1, axis=0) - xy, axis=-1)
    s = np.concatenate([[0.0], np.cumsum(d)])
    si = np.linspace(0.0, s[-1], n, endpoint=False)
    cols = [np.interp(si, s, np.concatenate([arr[:, j], arr[:1, j]]))
            for j in range(arr.shape[1])]
    return np.stack(cols, -1)


def geometry(xy: np.ndarray):
    d = np.linalg.norm(np.roll(xy, -1, axis=0) - xy, axis=-1)
    s = np.concatenate([[0.0], np.cumsum(d)])[:-1]
    tang = 0.5 * (np.roll(xy, -1, axis=0) - np.roll(xy, 1, axis=0))
    yaw = np.arctan2(tang[:, 1], tang[:, 0])
    ds = 0.5 * (d + np.roll(d, 1))
    dyaw = np.angle(np.exp(1j * (np.roll(yaw, -1) - np.roll(yaw, 1))))
    k = dyaw / np.maximum(np.roll(ds, -1) + ds, 1e-9)
    return s, yaw, k, float(s[-1] + d[-1])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--map_dir", type=str, required=True)
    p.add_argument("--margin", type=float, default=0.35)
    p.add_argument("--n_points", type=int, default=800)
    p.add_argument("--a_lat", type=float, default=6.0,
                   help="lateral-accel budget for the speed cap (m/s^2); "
                        "~0.7g so the mu sweep's low-grip rows can hold it")
    p.add_argument("--admm_iters", type=int, default=60000)
    p.add_argument("--outer", type=int, default=4,
                   help="EDT-verify + box-tighten rounds")
    p.add_argument("--geom_smooth_m", type=float, default=1.0)
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    name = os.path.basename(os.path.normpath(args.map_dir))
    cl = np.loadtxt(os.path.join(args.map_dir, f"{name}_centerline.csv"),
                    delimiter=",", skiprows=1)  # x, y, w_right, w_left
    track, omap = load_track_bundle(args.map_dir, prefer="raceline")
    rl = track.raceline
    s0 = np.asarray(rl.ss)
    vx0 = np.asarray(rl.vxs)

    n = args.n_points
    cl = resample_closed(cl, n)
    c, wr, wl = cl[:, :2], cl[:, 2], cl[:, 3]
    s, yaw, _, length = geometry(c)
    h = length / n
    tang = np.stack([np.cos(yaw), np.sin(yaw)], -1)
    nrm = np.stack([-tang[:, 1], tang[:, 0]], -1)  # left of travel

    # which width column is +normal? probe the EDT half a width out each way
    d_plus = np.asarray(distance_at(omap, *(c + 0.5 * nrm).T))
    d_minus = np.asarray(distance_at(omap, *(c - 0.5 * nrm).T))
    if d_plus.mean() < d_minus.mean():
        pass  # +normal heads toward the nearer wall: wl bounds +alpha
    lo = -(wr - args.margin)
    hi = wl - args.margin

    # curvature energy: D2 (periodic second difference) of p = c + alpha*nrm
    D2 = (np.roll(np.eye(n), -1, 1) - 2 * np.eye(n)
          + np.roll(np.eye(n), 1, 1)) / h**2
    Bx, By = D2 * nrm[:, 0][None, :], D2 * nrm[:, 1][None, :]
    bx, by = D2 @ c[:, 0], D2 @ c[:, 1]
    P = 2.0 * (Bx.T @ Bx + By.T @ By)
    q = 2.0 * (Bx.T @ bx + By.T @ by)

    def solve_box_qp_active_set(P, q, lo, hi, rounds=60):
        """Exact box-QP via active-set Newton: the biharmonic P's condition
        number scales as (n/pi)^4 (~1e10 at n=800), which defeats the
        first-order ADMM (60k iters stalled at r_prim ~1e-2 in a probe) —
        but only the handful of pinch points bind, so fixing the active set
        and solving the reduced EQUALITY system exactly (dense f64 solve)
        converges in a few rounds."""
        n_ = P.shape[0]
        active_lo = np.zeros(n_, bool)
        active_hi = np.zeros(n_, bool)
        for _ in range(rounds):
            free = ~(active_lo | active_hi)
            x = np.where(active_lo, lo, np.where(active_hi, hi, 0.0))
            rhs = -(q + P[:, ~free] @ x[~free])
            xf = np.linalg.solve(P[np.ix_(free, free)], rhs[free])
            x[free] = xf
            # KKT: release actives whose multiplier sign is wrong
            g = P @ x + q
            rel_lo = active_lo & (g < -1e-12)
            rel_hi = active_hi & (g > 1e-12)
            viol_lo = free & (x < lo - 1e-12)
            viol_hi = free & (x > hi + 1e-12)
            if not (rel_lo.any() or rel_hi.any()
                    or viol_lo.any() or viol_hi.any()):
                return np.clip(x, lo, hi), True
            active_lo = (active_lo & ~rel_lo) | viol_lo
            active_hi = (active_hi & ~rel_hi) | viol_hi
        return np.clip(x, lo, hi), False

    alpha = None
    for outer in range(args.outer):
        alpha, conv = solve_box_qp_active_set(P, q, lo, hi)
        xy = c + alpha[:, None] * nrm
        d = np.asarray(distance_at(omap, xy[:, 0], xy[:, 1]))
        k_now = np.abs(geometry(xy)[2]).max()
        print(f"outer {outer}: active-set converged {conv}, "
              f"min EDT clearance {d.min():.3f} m, max|kappa| {k_now:.3f}")
        bad = d < args.margin - 1e-3
        if not bad.any():
            break
        # the constant-width columns overstate the corridor here: pull the
        # violated boxes toward the centerline by the measured deficit
        deficit = (args.margin - d)[bad]
        sign = np.sign(alpha[bad] + 1e-12)
        hi[bad] = np.where(sign > 0, np.maximum(alpha[bad] - deficit, 0.0),
                           hi[bad])
        lo[bad] = np.where(sign < 0, np.minimum(alpha[bad] + deficit, 0.0),
                           lo[bad])

    s, yaw, k, length = geometry(xy)
    win = max(3, int(round(args.geom_smooth_m / (length / n))) | 1)
    kern = np.ones(win) / win

    def cfilt(a):
        pad = np.concatenate([a[-win:], a, a[:win]])
        return np.convolve(pad, kern, mode="same")[win:-win]

    yaw = np.angle(np.exp(1j * cfilt(np.unwrap(yaw))))
    k = cfilt(k)
    vx = np.interp(s / length * s0[-1], s0, vx0)
    vx = np.minimum(vx, np.sqrt(args.a_lat / np.maximum(np.abs(k), 1e-6)))
    header = ("# s_m; x_m; y_m; psi_rad; kappa_radpm; vx_mps\n"
              f"# min-curvature width-feasible line for {args.map_dir} "
              f"(margin {args.margin} m) — scripts/min_curv_raceline.py\n")
    rows = np.stack([s, xy[:, 0], xy[:, 1], yaw, k, vx], -1)
    with open(args.out, "w") as f:
        f.write(header)
        np.savetxt(f, rows, delimiter="; ", fmt="%.6f")
    print(f"saved {args.out}: {n} pts, length {length:.1f} m, max|kappa| "
          f"{np.abs(k).max():.3f}, vx [{vx.min():.2f}, {vx.max():.2f}] m/s, "
          f"min clearance {d.min():.3f} m")


if __name__ == "__main__":
    main()
