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
    a_lat = float(np.percentile(k0**2 * 0 + np.abs(k0) * vx0**2, 98))
    xy = resample_closed(xy0, args.n_points)
    d, _ = edt_clearance_and_grad(omap, xy)
    print(f"original: min clearance {d.min():.3f} m at s="
          f"{geometry(xy)[0][d.argmin()]:.1f}; a_lat budget {a_lat:.2f}")

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

    s, yaw, k, length = geometry(xy)
    # speed: original profile interpolated by arc fraction, capped by the
    # new curvature at the original a_lat budget
    vx = np.interp(s / length * s0[-1], s0, vx0)
    vx_cap = np.sqrt(a_lat / np.maximum(np.abs(k), 1e-6))
    vx = np.minimum(vx, vx_cap)
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
