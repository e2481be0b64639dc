#!/usr/bin/env python
"""2-D quadrotor (double-integrator) domain: MPC datagen + WCRBF fit.

Capability match for the reference's quadrotor pipeline
(deprecated/2D_quadrotor_MPC.py, 2D_quadrotor_data_generator.py,
train_2D_mpc.py): proves the solve-a-lattice -> fit-a-net recipe is
model-agnostic.  The cvxpy/OSQP MPC becomes the batched ADMM linear-MPC
(irbfn_tpu.solvers.qp); datagen + fit run in one script.
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
    p.add_argument("--n_grid", type=int, default=7,
                   help="lattice points per state dim")
    p.add_argument("--horizon", type=int, default=10)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--num_k", type=int, default=64)
    p.add_argument("--save_path", type=str, default="./data")
    args = p.parse_args()

    # lattice over start states [px, py, vx, vy] toward the origin
    n = args.n_grid
    grid = (GridSpec("px", -3.0, 3.0, n), GridSpec("py", -3.0, 3.0, n),
            GridSpec("vx", -2.0, 2.0, n), GridSpec("vy", -2.0, 2.0, n))
    x0 = build_lattice(grid, dtype=np.float32)
    print(f"lattice: {x0.shape[0]:,} MPC problems")

    mpc = double_integrator_mpc(horizon=args.horizon)
    goal = jnp.zeros((x0.shape[0], 4), jnp.float32)
    t0 = time.time()
    controls, sol = solve_linear_mpc_batch(mpc, jnp.asarray(x0), goal)
    controls = np.asarray(controls)
    print(f"{x0.shape[0] / (time.time() - t0):,.0f} QP solves/s; "
          f"{float(np.asarray(sol.converged).mean()):.1%} converged")

    # fit: (state) -> first control [ax, ay]
    y = controls[:, 0]
    model = WCRBFNet(
        in_features=4, out_features=2, num_kernels=args.num_k,
        basis_func=get_basis("gaussian_wide"), num_regions=1,
        lower_bounds=[[-3.5]], upper_bounds=[[3.5]],
        dimension_ranges=[[0]], activation_idx=[0], delta=[5.0])
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(x0[:8]), lr=3e-3)

    @jax.jit
    def step(state, x, y):
        def loss_fn(p):
            return jnp.abs(state.apply_fn(p, x) - y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    xj, yj = jnp.asarray(x0), jnp.asarray(y)
    for e in range(args.epochs):
        state, loss = step(state, xj, yj)
    print(f"final control L1: {float(loss):.5f}")
    np.savez(f"{args.save_path}/quadrotor_table.npz", inputs=x0, outputs=y)
    print(f"saved {args.save_path}/quadrotor_table.npz")


if __name__ == "__main__":
    main()
