#!/usr/bin/env python
"""Trajectory endpoint-error evaluation (reference
deprecated/evaluate_newlut.py:294-358 capability): integrate LUT entries (or
a trained net's predictions) and report endpoint error against the goal
poses, plus the classical RBF-interpolation error bound.

The bound follows the standard fill-distance argument the reference evaluates
in closed form (evaluate_newlut.py:318-358): for a C^2 target interpolated on
a grid with fill distance h, |f - s| = O(h^2) with the constant estimated
from the table's second differences.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax.numpy as jnp

from irbfn_tpu.dynamics import integrate_endpoint_gl
from irbfn_tpu.solvers.clothoid import wrap_angle


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lut_path", type=str, required=True)
    p.add_argument("--config_f", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--chunk", type=int, default=1 << 18,
                   help="rows per device dispatch (bounds the (B,R,K) "
                        "distance intermediate)")
    args = p.parse_args()

    data = np.load(args.lut_path)
    lut = data["lut"]
    xg, yg, tg = data["xlut"], data["ylut"], data["tlut"]
    X, Y, T = np.meshgrid(xg, yg, tg, indexing="ij")
    goals = np.stack([X, Y, T], axis=-1).reshape(-1, 3)
    params = lut.reshape(-1, 5)

    if args.config_f:
        import jax

        from irbfn_tpu.train import load_model

        model, net_params, _ = load_model(args.config_f, args.ckpt)
        # chunked forward: the (B, R, K) distance intermediate on a
        # multi-million-row LUT would exceed HBM in one call
        apply = jax.jit(lambda x: model.apply(
            {"params": net_params["params"]}, x))
        chunks = []
        for i0 in range(0, goals.shape[0], args.chunk):
            chunks.append(np.asarray(apply(
                jnp.asarray(goals[i0:i0 + args.chunk], jnp.float32))))
        params = np.concatenate(chunks, axis=0)
        label = "net prediction"
    else:
        label = "LUT entry"

    ends = []
    for i0 in range(0, params.shape[0], args.chunk):
        ends.append(np.asarray(integrate_endpoint_gl(
            jnp.asarray(params[i0:i0 + args.chunk], jnp.float64))))
    end = np.concatenate(ends, axis=0)
    ex = np.abs(end[:, 0] - goals[:, 0])
    ey = np.abs(end[:, 1] - goals[:, 1])
    et = np.abs(np.asarray(wrap_angle(jnp.asarray(end[:, 2] - goals[:, 2]))))
    print(f"{label} endpoint error over {goals.shape[0]:,} goals:")
    print(f"  x:     mean {ex.mean():.2e}  max {ex.max():.2e}")
    print(f"  y:     mean {ey.mean():.2e}  max {ey.max():.2e}")
    print(f"  theta: mean {et.mean():.2e}  max {et.max():.2e}")
    # tail distribution of the planar miss (the worst-corner metric:
    # long-chord goals amplify param error ~s^2/2)
    exy = np.hypot(end[:, 0] - goals[:, 0], end[:, 1] - goals[:, 1])
    print(f"  planar miss: p99 {np.percentile(exy, 99):.3f}  "
          f"p99.9 {np.percentile(exy, 99.9):.3f}  max {exy.max():.3f}  "
          f">1m {100 * (exy > 1).mean():.3f}%  "
          f">5m {100 * (exy > 5).mean():.4f}%")

    # classical interpolation bound: h^2 * max second difference
    hs = [np.diff(g).mean() for g in (xg, yg, tg) if len(g) > 1]
    h = float(np.linalg.norm(hs))
    curv_est = 0.0
    k0 = lut[..., 0]
    for ax in range(3):
        if lut.shape[ax] > 2:
            d2 = np.diff(k0, n=2, axis=ax) / (hs[ax] ** 2 if ax < len(hs) else 1)
            curv_est = max(curv_est, float(np.abs(d2).max()))
    bound = 0.25 * curv_est * h**2
    print(f"theoretical O(h^2) interpolation bound on k0: {bound:.2e} "
          f"(fill distance h={h:.3f}, N={goals.shape[0]:,})")


if __name__ == "__main__":
    main()
