"""Pallas TPU kernel: the goal-MPC ADMM solve, fused across iterations.

MEASURED NEGATIVE RESULT — the XLA loop wins; this kernel is kept as the
tested counterexample, not a serving path.  Hypothesis: the XLA
``fori_loop`` carry round-trips HBM every iteration (~190 KB/row at 600
sweeps), so a VMEM-resident kernel should win.  Measured on v5e (262144-goal
family, 600 sweeps): XLA 2.06M QP solves/s vs this kernel 0.38M at
tile_g=256 (0.32M/0.23M at 128/64; tile_g=512 exceeds the 16 MB scoped-VMEM
stack).  Why: XLA's per-iteration GEMMs run at the FULL batch width —
(262144, 31)x(31, 16) — which amortizes MXU latency across a huge M and
streams the carry at full HBM bandwidth (78 lanes/row x 600 iters is only
~0.5 ms of traffic at 800 GB/s), while the kernel's per-tile (256, 16)
dots are latency-bound on a 600-deep sequential chain.  The lesson mirrors
the repo's clothoid finding (solver-beats-net): for tiny-operand iterative
solvers, batch-wide GEMM amortization beats working-set residency.

The kernel keeps the ENTIRE solver state in VMEM for all iterations:

  for each goal tile (grid dim 0):
      load q tile (TILE_G, n)                       [VMEM, once]
      x, z, u = 0                                   [VMEM, resident]
      for it in 1..iters:                           (in-kernel fori_loop)
          rhs = sigma x - q + (rho (z - u)) A       <- MXU
          x   = rhs Kinv^T                          <- MXU
          ax  = alpha (x A^T) + (1 - alpha) z       <- MXU
          z   = clip(ax + u, lo, hi); u += ax - z   <- VPU
      write x tile + final residuals               [HBM, once]

HBM traffic per row drops from ~190 KB to ~260 B (the q row in, the solution
row out) — the kernel is compute-bound instead.  The family matrices
(A 32x16, Kinv 16x16, bounds) are tiny replicated VMEM operands shared by
every tile; rho is a traced scalar in SMEM (it depends on the v_car family,
solvers/goal_mpc.py rho law).

All dots are HIGHEST precision: the same exact-f32 requirement as the XLA
path (default bf16 passes stall the iteration at r_prim ~1e-2 — the
serving-numerics lesson, BASELINE.md), and HIGHEST is the only elevated dot
precision Mosaic lowers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _admm_kernel(rho_ref, q_ref, a_ref, at_ref, kinvt_ref, lo_ref, hi_ref,
                 x_ref, res_ref, *, iters, sigma, alpha):
    """One goal tile: full ADMM iteration in VMEM.

    Shapes: q (TG, n), a (m, n), at (n, m), kinvt (n, n), lo/hi (1, m);
    outputs x (TG, n) and res (TG, 8) with [:, 0] = r_prim, [:, 1] = r_dual
    (lane-padded residual block — Mosaic wants >1 output lanes).
    """
    rho = rho_ref[0, 0]
    q = q_ref[:]
    a = a_ref[:]
    at = at_ref[:]
    kinvt = kinvt_ref[:]
    lo = lo_ref[:]
    hi = hi_ref[:]
    tg = q.shape[0]
    m = a.shape[0]

    def body(_, carry):
        x, z, u = carry
        rhs = sigma * x - q + jnp.dot(
            rho * (z - u), a, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        x = jnp.dot(rhs, kinvt, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
        ax = alpha * jnp.dot(x, at, precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32) \
            + (1.0 - alpha) * z
        z_new = jnp.clip(ax + u, lo, hi)
        u = u + ax - z_new
        return x, z_new, u

    x0 = jnp.zeros((tg, q.shape[1]), jnp.float32)
    z0 = jnp.clip(jnp.zeros((tg, m), jnp.float32), lo, hi)
    u0 = jnp.zeros((tg, m), jnp.float32)
    x, z, u = jax.lax.fori_loop(0, iters, body, (x0, z0, u0))

    ax = jnp.dot(x, at, precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
    z_next = jnp.clip(ax + u, lo, hi)
    r_prim = jnp.max(jnp.abs(ax - z_next), axis=-1, keepdims=True)
    r_dual = rho * jnp.max(jnp.abs(jnp.dot(
        z_next - z, a, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)), axis=-1, keepdims=True)
    x_ref[:] = x
    res_ref[:] = jnp.concatenate(
        [r_prim, r_dual, jnp.zeros((tg, res_ref.shape[1] - 2),
                                   jnp.float32)], axis=-1)


@functools.partial(jax.jit, static_argnames=("iters", "sigma", "alpha",
                                             "tile_g", "interpret"))
def admm_solve_pallas(q, A, kinv, lo, hi, rho, iters: int = 600,
                      sigma: float = 1e-6, alpha: float = 1.6,
                      tile_g: int = 512, interpret: bool = False):
    """Fused box-QP ADMM over a (G, n) batch sharing one factorization.

    Args:
        q: (G, n) linear terms; A: (m, n) row-normalized constraints;
        kinv: (n, n) inverse ADMM KKT; lo/hi: (m,); rho: traced scalar.
    Returns:
        x (G, n), r_prim (G,), r_dual (G,) — identical semantics to the
        XLA loop in solvers/goal_mpc.py (equality-tested).
    """
    G, n = q.shape
    m = A.shape[0]
    m_p = _round_up(m, 8)
    G_p = _round_up(G, tile_g)
    big = jnp.float32(1e30)
    # pad rows: zero constraint rows with open bounds never bind and
    # contribute exact zeros to every product and residual
    A_p = jnp.zeros((m_p, n), jnp.float32).at[:m].set(A)
    lo_p = jnp.full((1, m_p), -big).at[0, :m].set(lo)
    hi_p = jnp.full((1, m_p), big).at[0, :m].set(hi)
    q_p = jnp.zeros((G_p, n), jnp.float32).at[:G].set(q)
    rho_op = jnp.reshape(jnp.asarray(rho, jnp.float32), (1, 1))

    grid = (G_p // tile_g,)
    kernel = functools.partial(_admm_kernel, iters=iters, sigma=sigma,
                               alpha=alpha)
    x, res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_g, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_p, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, m_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_g, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_g, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G_p, n), jnp.float32),
            jax.ShapeDtypeStruct((G_p, 8), jnp.float32),
        ],
        interpret=interpret,
    )(rho_op, q_p, A_p, A_p.T, kinv.T, lo_p, hi_p)
    return x[:G], res[:G, 0], res[:G, 1]
