#!/usr/bin/env python
"""Project a bundled raceline to width feasibility (VERDICT r3 item #9).

Some reference raceline CSVs run sub-half-car-width from the occupancy wall
(Oschersleben pinches to 0.143 m at s~135.7) — physically undrivable under
this repo's wall-contact-terminating collision model, which is STRICTER than
the reference gym (agent-agent GJK + iTTC only, no map-collision
termination, base_classes.py:215-357). This script produces a drivable line:

1. resample the raceline densely and measure EDT clearance along it
   (`sim/map.py:distance_at` — the same field the sim collides against),
2. push sub-margin points outward along the EDT gradient (the direction
   that locally maximizes wall distance) until every point clears
   ``margin``, re-smoothing with a curvature-penalizing periodic Laplacian
   between pushes so the projection doesn't kink the line,
3. recompute s / yaw / curvature from the final geometry and cap the speed
   profile at the lateral-acceleration budget the ORIGINAL line implied
   (vx <= sqrt(a_lat / |k|)), so pushed sections slow down exactly as much
   as their new curvature demands and untouched sections keep raceline
   pace,
4. write a reference-format raceline CSV (s; x; y; psi; kappa; vx — the
   track.py:100-116 column layout `raceline_from_csv` parses).

Usage:
  python scripts/make_feasible_raceline.py \
      --map_dir /root/reference/deprecated/f1tenth_gym/gym/f110_gym/maps/Oschersleben \
      --margin 0.35 --out data/Oschersleben_raceline_feasible.csv
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from irbfn_tpu.sim.map import distance_at, load_track_bundle  # noqa: E402


def edt_clearance_and_grad(omap, xy: np.ndarray, eps: float = 0.05):
    """Clearance and its central-difference world-frame gradient at (N, 2)
    points (the EDT is piecewise-bilinear; eps of a cell width reads the
    local slope robustly)."""
    x, y = jnp.asarray(xy[:, 0]), jnp.asarray(xy[:, 1])
    d = distance_at(omap, x, y)
    gx = (distance_at(omap, x + eps, y) - distance_at(omap, x - eps, y)) / (
        2 * eps)
    gy = (distance_at(omap, x, y + eps) - distance_at(omap, x, y - eps)) / (
        2 * eps)
    g = np.stack([np.asarray(gx), np.asarray(gy)], -1)
    n = np.linalg.norm(g, axis=-1, keepdims=True)
    return np.asarray(d), g / np.maximum(n, 1e-9)


def smooth_periodic(xy: np.ndarray, alpha: float, iters: int) -> np.ndarray:
    """Periodic Laplacian smoothing: xy <- xy + alpha * (roll-avg - xy)."""
    for _ in range(iters):
        nbr = 0.5 * (np.roll(xy, 1, axis=0) + np.roll(xy, -1, axis=0))
        xy = xy + alpha * (nbr - xy)
    return xy


def resample_closed(xy: np.ndarray, n: int) -> np.ndarray:
    """Arc-length resample of a closed polyline to n uniform points."""
    d = np.linalg.norm(np.roll(xy, -1, axis=0) - xy, axis=-1)
    s = np.concatenate([[0.0], np.cumsum(d)])
    total = s[-1]
    si = np.linspace(0.0, total, n, endpoint=False)
    xs = np.interp(si, s, np.concatenate([xy[:, 0], xy[:1, 0]]))
    ys = np.interp(si, s, np.concatenate([xy[:, 1], xy[:1, 1]]))
    return np.stack([xs, ys], -1)


def geometry(xy: np.ndarray):
    """(s, yaw, curvature) of a closed polyline via periodic gradients."""
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
    p.add_argument("--margin", type=float, default=0.35,
                   help="required EDT clearance (m): half car width 0.155 "
                        "+ the sim's default 0.15 disc + tracking slack")
    p.add_argument("--n_points", type=int, default=2000)
    p.add_argument("--push_iters", type=int, default=200)
    p.add_argument("--smooth_alpha", type=float, default=0.25)
    p.add_argument("--blend_centerline", type=int, default=1,
                   help="1: pre-blend toward the centerline at sub-margin "
                        "sections (corridor-shaped curvature) before the "
                        "push projection; 0: pure EDT push (round-4 mode)")
    p.add_argument("--blend_dilate", type=int, default=60,
                   help="rolling-max rounds widening the blend window so "
                        "the transition into/out of a pinch is gradual")
    p.add_argument("--relax_iters", type=int, default=2000,
                   help="smooth+re-push relaxation rounds for the curvature "
                        "cap (see the post-projection pass below)")
    p.add_argument("--k_max", type=float, default=0.42,
                   help="target max |curvature| (inside the planner tables' "
                        "+-0.45 coverage)")
    p.add_argument("--a_lat", type=float, default=None,
                   help="lateral-accel budget (m/s^2) for the corner speed "
                        "cap; default = p98 of the original raceline's "
                        "|k|v^2. The default is ~0.95g here — fine for the "
                        "one corner the raceline takes at that load, but a "
                        "blended section capped AT it is pinned above "
                        "mu<=0.9 grip for long arcs; pass ~6 for a line "
                        "drivable across the mu sweep")
    p.add_argument("--geom_smooth_m", type=float, default=1.5,
                   help="moving-average window (meters) for the written "
                        "yaw/kappa columns (see the geometry filter below)")
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()

    jax.config.update("jax_platforms", "cpu")
    track, omap = load_track_bundle(args.map_dir, prefer="raceline")
    rl = track.raceline
    xy0 = np.stack([np.asarray(rl.xs), np.asarray(rl.ys)], -1)
    vx0 = np.asarray(rl.vxs)
    k0 = np.asarray(rl.ks)
    s0 = np.asarray(rl.ss)

    # the original line's lateral-acceleration budget: the speed cap law
    # below reproduces raceline pace wherever geometry is unchanged
    a_lat = (args.a_lat if args.a_lat is not None else
             float(np.percentile(np.abs(k0) * vx0**2, 98)))
    xy = resample_closed(xy0, args.n_points)
    d, _ = edt_clearance_and_grad(omap, xy)
    print(f"original: min clearance {d.min():.3f} m at s="
          f"{geometry(xy)[0][d.argmin()]:.1f}; a_lat budget {a_lat:.2f}")

    if args.blend_centerline:
        # Pure outward EDT pushing leaves a near-kink at each pinch: the
        # margin contour around a convex wall corner has radius ~= margin
        # (round-4's committed line peaked at |kappa| 1.0 — outside the
        # planner tables' +-0.45 coverage — and every closed-loop run died
        # there). The CENTERLINE threads the same pinch with corridor-shaped
        # curvature (max 0.61 here) and maximal clearance, so: blend toward
        # the centerline exactly where the raceline lacks margin, keep
        # raceline geometry (and pace) everywhere else.
        import os

        name = os.path.basename(os.path.normpath(args.map_dir))
        cpath = os.path.join(args.map_dir, f"{name}_centerline.csv")
        c = np.loadtxt(cpath, delimiter=",", skiprows=1)[:, :2]
        c = resample_closed(c, args.n_points)
        # nearest-centerline target per raceline sample
        d2 = ((xy[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        target = c[d2.argmin(1)]
        need = np.maximum(args.margin - d, 0.0) > 0.0
        w = need.astype(float)
        for _ in range(args.blend_dilate):
            w = np.maximum(w, 0.5 * (np.roll(w, 1) + np.roll(w, -1)))
        xy = xy + w[:, None] * (target - xy)
        xy = resample_closed(smooth_periodic(xy, 0.3, 4), args.n_points)
        d, _ = edt_clearance_and_grad(omap, xy)
        print(f"centerline blend over {int(need.sum())} deficient pts "
              f"(dilated {int((w > 0.01).sum())}): min clearance "
              f"{d.min():.3f} m, max|kappa| "
              f"{np.abs(geometry(xy)[2]).max():.3f}")

    for it in range(args.push_iters):
        d, g = edt_clearance_and_grad(omap, xy)
        need = np.maximum(args.margin - d, 0.0)
        if need.max() == 0.0 and it > 0:
            break
        xy = xy + (need[:, None] * g)
        # local smoothing only around pushed points (dilate the mask) so
        # untouched raceline geometry stays exactly raceline
        mask = need > 0
        for _ in range(8):
            mask = mask | np.roll(mask, 1) | np.roll(mask, -1)
        sm = smooth_periodic(xy, args.smooth_alpha, 2)
        xy = np.where(mask[:, None], sm, xy)
    # finishing pass: pure push (no smoothing) clears the residual few mm
    # the last smoothing iteration pulled back under margin
    for _ in range(20):
        d, g = edt_clearance_and_grad(omap, xy)
        need = np.maximum(args.margin - d, 0.0)
        if need.max() == 0.0:
            break
        xy = xy + need[:, None] * g
    d, _ = edt_clearance_and_grad(omap, xy)
    print(f"projected in {it + 1} iters: min clearance {d.min():.3f} m")
    assert d.min() >= args.margin - 1e-3, "projection failed to clear margin"

    # curvature relaxation: pushing outward along the EDT gradient leaves a
    # near-kink at each pinch (round-4's committed line peaked at
    # |kappa| 1.0 vs the raceline's 0.38 — outside the planner tables'
    # +-0.45 coverage, and every closed-loop run died exactly there).
    # Alternate gentle global smoothing with a re-push to the margin: a
    # relaxation whose fixed point is a smooth line ON the margin boundary.
    k_abs = np.abs(geometry(xy)[2]).max()
    for rx in range(args.relax_iters):
        if k_abs <= args.k_max:
            break
        xy = smooth_periodic(xy, 0.1, 1)
        for _ in range(5):
            d, g = edt_clearance_and_grad(omap, xy)
            need = np.maximum(args.margin - d, 0.0)
            if need.max() == 0.0:
                break
            xy = xy + need[:, None] * g
        xy = resample_closed(xy, args.n_points)
        k_abs = np.abs(geometry(xy)[2]).max()
    d, _ = edt_clearance_and_grad(omap, xy)
    print(f"curvature relaxation: max|kappa| {k_abs:.3f} after {rx} iters, "
          f"min clearance {d.min():.3f} m")
    assert d.min() >= args.margin - 5e-3, "relaxation lost the margin"

    s, yaw, k, length = geometry(xy)
    # Low-pass the consumed geometry columns: finite-difference yaw/kappa
    # of the pushed polyline carry ~86x the bundle raceline's high-frequency
    # noise (measured hf-rms 0.036 vs 0.0004), and the planner reads curv
    # and epsi straight off these columns — jitter there is jitter in the
    # steering. The xy path itself is untouched (margin stays true); the
    # filtered columns are what a smooth line through the same samples has.
    win = max(3, int(round(args.geom_smooth_m / (length / len(s)))) | 1)
    kern = np.ones(win) / win

    def cfilt(a):  # periodic moving average
        pad = np.concatenate([a[-win:], a, a[:win]])
        return np.convolve(pad, kern, mode="same")[win:-win]

    yaw_u = np.unwrap(yaw)
    yaw = np.angle(np.exp(1j * cfilt(yaw_u)))
    k = cfilt(k)
    # speed: original profile interpolated by arc fraction, capped by the
    # new curvature at the original a_lat budget
    vx = np.interp(s / length * s0[-1], s0, vx0)
    vx_cap = np.sqrt(a_lat / np.maximum(np.abs(k), 1e-6))
    vx = np.minimum(vx, vx_cap)
    print(f"geometry filter (window {win} pts ~ {args.geom_smooth_m} m): "
          f"k hf-rms {np.std(k - cfilt(k)):.4f}, max|k| {np.abs(k).max():.3f}")
    header = ("# s_m; x_m; y_m; psi_rad; kappa_radpm; vx_mps\n"
              f"# width-feasible projection of {args.map_dir} raceline "
              f"(margin {args.margin} m) — scripts/make_feasible_raceline.py"
              "\n")
    rows = np.stack([s, xy[:, 0], xy[:, 1], yaw, k, vx], -1)
    with open(args.out, "w") as f:
        f.write(header)
        np.savetxt(f, rows, delimiter="; ", fmt="%.6f")
    print(f"saved {args.out}: {len(rows)} pts, length {length:.1f} m, "
          f"vx [{vx.min():.2f}, {vx.max():.2f}] m/s")


if __name__ == "__main__":
    main()
