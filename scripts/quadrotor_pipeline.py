#!/usr/bin/env python
"""2-D quadrotor (double-integrator) domain: MPC datagen + WCRBF fit + eval.

Capability match for the reference's quadrotor pipeline
(deprecated/2D_quadrotor_MPC.py, 2D_quadrotor_data_generator.py,
train_2D_mpc.py, evaluate_2D_mpc.py): proves the solve-a-lattice ->
fit-a-net recipe is model-agnostic.  The cvxpy/OSQP MPC becomes the batched
ADMM linear-MPC (irbfn_tpu.solvers.qp); datagen + fit run in one script.

Evaluation goes beyond the reference's offline test-grid MAE
(evaluate_2D_mpc.py:95-116): OFF-grid MAE against fresh ADMM solves, and a
closed-loop regulation rollout with the net in the loop vs the re-solved MPC
(the deployment the reference trains for but never demonstrates).  Writes the
YAML-config + orbax checkpoint pair plus data/quadrotor_results.json.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from irbfn_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax
import jax.numpy as jnp

from irbfn_tpu.models import WCRBFNet, get_basis
from irbfn_tpu.parallel import GridSpec, build_lattice
from irbfn_tpu.solvers.qp import double_integrator_mpc, solve_linear_mpc_batch
from irbfn_tpu.train import create_train_state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n_grid", type=int, default=9,
                   help="lattice points per state dim")
    p.add_argument("--horizon", type=int, default=10)
    p.add_argument("--epochs", type=int, default=0,
                   help="Adam fine-tune epochs after the closed-form fit "
                        "(at lr 1e-4; lr 3e-3 full-batch steps measurably "
                        "DESTROY the per-region closed-form solution, L1 "
                        "0.42 -> 1.49). The reference's Adam-from-scratch "
                        "path is --no_direct_fit, where this is the whole "
                        "training run.")
    p.add_argument("--no_direct_fit", action="store_true",
                   help="reference-parity mode: Adam from scratch "
                        "(train_2D_mpc.py), no closed-form solve")
    p.add_argument("--num_k", type=int, default=256)
    p.add_argument("--splits", type=int, default=2,
                   help="region segments per state dim for the direct fit "
                        "(splits^4 per-region output heads)")
    p.add_argument("--n_extra", type=int, default=32768,
                   help="extra near-origin gaussian-sampled solves appended "
                        "to the lattice (regulation accuracy lives there)")
    p.add_argument("--save_path", type=str, default="./data")
    p.add_argument("--run_name", type=str, default="quadrotor_pr")
    p.add_argument("--n_test", type=int, default=4096)
    p.add_argument("--n_rollout", type=int, default=64)
    args = p.parse_args()
    if args.no_direct_fit and args.epochs == 0:
        p.error("--no_direct_fit trains with Adam from scratch; --epochs "
                "must be > 0 (the reference uses 300) or the saved net is "
                "random init")

    # lattice over start states [px, py, vx, vy] toward the origin, plus
    # gaussian-sampled near-origin rows: regulation error is dominated by the
    # net's bias where u* -> 0, and a uniform lattice spends <1% of its rows
    # inside the settling ball
    n = args.n_grid
    grid = (GridSpec("px", -3.0, 3.0, n), GridSpec("py", -3.0, 3.0, n),
            GridSpec("vx", -2.0, 2.0, n), GridSpec("vy", -2.0, 2.0, n))
    x_lat = build_lattice(grid, dtype=np.float32)
    rng0 = np.random.default_rng(2)
    x_ext = np.clip(
        rng0.normal(0.0, [1.2, 1.2, 0.8, 0.8], (args.n_extra, 4)),
        [-3, -3, -2, -2], [3, 3, 2, 2]).astype(np.float32)
    x0 = np.concatenate([x_lat, x_ext], axis=0)
    print(f"lattice: {x_lat.shape[0]:,} + {args.n_extra:,} near-origin "
          "MPC problems")

    mpc = double_integrator_mpc(horizon=args.horizon)
    goal = jnp.zeros((x0.shape[0], 4), jnp.float32)
    x0j = jnp.asarray(x0)
    controls, sol = solve_linear_mpc_batch(mpc, x0j, goal)  # warm/compile
    t0 = time.time()
    controls, sol = solve_linear_mpc_batch(mpc, x0j, goal)
    jax.block_until_ready(controls)
    controls = np.asarray(controls)
    print(f"{x0.shape[0] / (time.time() - t0):,.0f} QP solves/s (warm); "
          f"{float(np.asarray(sol.converged).mean()):.1%} converged")

    # fit: (state) -> first control [ax, ay].  The solution map is odd
    # (u*(-x) = -u*(x), the box constraints being symmetric), so mirror every
    # row; regulation accuracy is weighted toward the origin on top of the
    # near-origin densification (both measured load-bearing for closed-loop
    # settling: the unweighted single-region fit settled 6% of rollouts)
    from irbfn_tpu.models.fit import (choose_centers, data_scale, fit_direct,
                                      fit_per_region)
    from irbfn_tpu.models.wcrbf import build_region_bounds
    from irbfn_tpu.train.trainer import region_spec_from_table

    y = controls[:, 0]
    x_fit = np.concatenate([x0, -x0], axis=0)
    y_fit = np.concatenate([y, -y], axis=0)
    if args.no_direct_fit:
        # reference-parity mode (train_2D_mpc.py): single region, shared
        # head, Adam from scratch on the raw lattice
        x_fit, y_fit = x0, y
        input_scale = None
        head_mode = "shared"
        lower_bounds, upper_bounds = [[-3.5]], [[3.5]]
        dimension_ranges, activation_idx, delta = [[0]], [0], [5.0]
    else:
        input_scale = tuple(float(s) for s in data_scale(x_fit))
        head_mode = "per_region"
        lower_bounds, upper_bounds, dimension_ranges, delta = (
            region_spec_from_table(x_lat, [args.splits] * 4))
        activation_idx = [0, 1, 2, 3]
    num_regions = len(dimension_ranges)
    model = WCRBFNet(
        in_features=4, out_features=2, num_kernels=args.num_k,
        basis_func=get_basis("gaussian_wide"), num_regions=num_regions,
        lower_bounds=lower_bounds, upper_bounds=upper_bounds,
        dimension_ranges=dimension_ranges, activation_idx=activation_idx,
        delta=delta, input_scale=input_scale, head_mode=head_mode)
    lr = 3e-3 if args.no_direct_fit else 1e-4
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(x_fit[:8]), lr=lr)
    xj, yj = jnp.asarray(x_fit), jnp.asarray(y_fit)

    if not args.no_direct_fit:
        # closed-form per-region head solve with data-chosen centers/widths
        # (the framework's table-fitting path; the reference Adam-trains a
        # shared head from scratch, train_2D_mpc.py)
        lb, ub = build_region_bounds(lower_bounds, upper_bounds,
                                     dimension_ranges, activation_idx)
        w_scale = np.asarray([1.0, 1.0, 0.7, 0.7], np.float32)
        sample_weight = (0.25 + np.exp(
            -0.5 * np.sum((x_fit / w_scale) ** 2, axis=1))).astype(np.float32)
        centers, log_sigs = choose_centers(
            x_fit, num_kernels=args.num_k, num_regions=num_regions, seed=0,
            input_scale=input_scale, lb=lb, ub=ub,
            activation_idx=tuple(activation_idx), probs=sample_weight)
        t0 = time.time()
        fit = fit_per_region(x_fit, y_fit, centers, log_sigs,
                             jnp.asarray(lb), jnp.asarray(ub),
                             jnp.asarray(delta), tuple(activation_idx),
                             get_basis("gaussian_wide"),
                             input_scale=input_scale,
                             sample_weight=sample_weight)
        params = dict(state.params["params"])
        params["core"] = {"centers": fit.centers, "log_sigs": fit.log_sigs}
        params["head"] = {"kernel": fit.weights, "bias": fit.bias}
        state = state.replace(params={"params": params})
        loss = jnp.abs(state.apply_fn(state.params, xj) - yj).mean()
        print(f"closed-form fit in {time.time() - t0:.1f}s, "
              f"control L1 {float(loss):.5f}")

    @jax.jit
    def step(state, x, y):
        def loss_fn(p):
            return jnp.abs(state.apply_fn(p, x) - y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    for e in range(args.epochs):
        state, loss = step(state, xj, yj)
    if args.epochs:
        print(f"final control L1 after {args.epochs} Adam epochs: "
              f"{float(loss):.5f}")
    elif args.no_direct_fit:
        loss = jnp.abs(state.apply_fn(state.params, xj) - yj).mean()
    np.savez(f"{args.save_path}/quadrotor_table.npz", inputs=x0, outputs=y)
    print(f"saved {args.save_path}/quadrotor_table.npz")

    from irbfn_tpu.train import save_checkpoint, save_config

    save_config(f"configs/{args.run_name}.yaml", {
        "model_class": "WCRBFNet", "in_features": 4, "out_features": 2,
        "num_kernels": args.num_k, "basis_func": "gaussian_wide",
        "num_regions": num_regions, "lower_bounds": lower_bounds,
        "upper_bounds": upper_bounds, "dimension_ranges": dimension_ranges,
        "activation_idx": activation_idx, "delta": delta,
        "head_mode": head_mode,
        "input_scale": None if input_scale is None else list(input_scale),
        "epochs": args.epochs, "lr": lr, "seed": 0,
        "pipeline": "quadrotor"})
    import os

    ckpt_dir = os.path.abspath(f"ckpts/{args.run_name}")
    save_checkpoint(ckpt_dir, state, step=0)

    # --- off-grid accuracy vs fresh solves (the check the reference's
    # fixed test grid, evaluate_2D_mpc.py:95-116, approximates) ----------
    rng = np.random.default_rng(1)
    x_test = rng.uniform([-3, -3, -2, -2], [3, 3, 2, 2],
                         (args.n_test, 4)).astype(np.float32)
    u_true, sol_t = solve_linear_mpc_batch(
        mpc, jnp.asarray(x_test), jnp.zeros((args.n_test, 4), jnp.float32))
    u_pred = state.apply_fn(state.params, jnp.asarray(x_test))
    off_mae = float(jnp.abs(u_pred - u_true[:, 0]).mean())
    print(f"off-grid control MAE vs fresh ADMM: {off_mae:.5f} "
          f"({float(np.asarray(sol_t.converged).mean()):.1%} solves converged)")

    # --- closed-loop regulation: net in the loop vs re-solved MPC -------
    n_cl, T_cl = args.n_rollout, 80
    ang = np.linspace(0, 2 * np.pi, n_cl, endpoint=False)
    starts = np.stack([2.5 * np.cos(ang), 2.5 * np.sin(ang),
                       rng.uniform(-1, 1, n_cl), rng.uniform(-1, 1, n_cl)],
                      axis=1).astype(np.float32)
    Ad, Bd = mpc.Ad, mpc.Bd
    u_lo, u_hi = mpc.u_lo, mpc.u_hi
    goal0 = jnp.zeros((n_cl, 4), jnp.float32)

    @jax.jit
    def roll_net(x):
        def body(x, _):
            u = jnp.clip(state.apply_fn(state.params, x), u_lo, u_hi)
            x = x @ Ad.T + u @ Bd.T
            return x, x
        return jax.lax.scan(body, x, None, length=T_cl)[1]

    @jax.jit
    def roll_mpc(x):
        def body(x, _):
            u = solve_linear_mpc_batch(mpc, x, goal0, iters=400)[0][:, 0]
            x = x @ Ad.T + u @ Bd.T
            return x, x
        return jax.lax.scan(body, x, None, length=T_cl)[1]

    tr_net = np.asarray(roll_net(jnp.asarray(starts)))  # (T, n_cl, 4)
    tr_mpc = np.asarray(roll_mpc(jnp.asarray(starts)))
    d_net = np.linalg.norm(tr_net[:, :, :2], axis=2)  # (T, n_cl)
    d_mpc = np.linalg.norm(tr_mpc[:, :, :2], axis=2)
    res = {
        "train_l1": float(loss), "off_grid_mae": off_mae,
        "final_dist_net": float(d_net[-1].mean()),
        "final_dist_mpc": float(d_mpc[-1].mean()),
        "settle_frac_net": float((d_net[-1] < 0.1).mean()),
        "settle_frac_mpc": float((d_mpc[-1] < 0.1).mean()),
    }
    print(f"closed-loop 8s regulation from r=2.5 ring: final dist "
          f"net {res['final_dist_net']:.4f} m vs re-solved MPC "
          f"{res['final_dist_mpc']:.4f} m; settled(<0.1 m) "
          f"net {res['settle_frac_net']:.0%} / mpc {res['settle_frac_mpc']:.0%}")
    import json

    with open(f"{args.save_path}/quadrotor_results.json", "w") as f:
        json.dump(res, f, indent=1)
    print(f"saved {args.save_path}/quadrotor_results.json")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    for k in range(0, n_cl, max(n_cl // 16, 1)):
        ax.plot(tr_mpc[:, k, 0], tr_mpc[:, k, 1], color="0.7", lw=1.0,
                zorder=1)
        ax.plot(tr_net[:, k, 0], tr_net[:, k, 1], color="C0", lw=1.0,
                zorder=2)
        ax.plot(starts[k, 0], starts[k, 1], "k.", ms=4, zorder=3)
    ax.plot([], [], color="0.7", label="re-solved MPC")
    ax.plot([], [], color="C0", label="WCRBF net")
    ax.plot([], [], color="C3", lw=1.0, label="0.1 m settle ring")
    ax.add_patch(plt.Circle((0, 0), 0.1, fill=False, color="C3", lw=1.0))
    ax.set_aspect("equal")
    ax.legend(loc="upper right", fontsize=8)
    ax.set_title("quadrotor regulation: net vs re-solved MPC")
    fig.savefig(f"{args.save_path}/quadrotor_demo.png", dpi=130,
                bbox_inches="tight")
    print(f"saved {args.save_path}/quadrotor_demo.png")


if __name__ == "__main__":
    main()
