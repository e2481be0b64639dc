"""Cubic-spiral (polynomial-curvature) path representation and integration.

Re-implements the semantics of reference ``src/irbfn_mpc/planner_utils.py``:

- parameter layout ``[k0, k1, k2, k3, s_f]``: curvature values at arc-length
  fractions 0, 1/3, 2/3, 1 plus total arc length (the pyclothoids LUT output
  format, reference ``deprecated/genlut.py:57-67``)
- ``params_to_coefs`` maps knots -> cubic polynomial coefficients via the
  fixed 4x4 Lagrange-interpolation matrix (ref planner_utils.py:10-29)
- ``integrate_path``: trapezoid-rule path integration producing
  ``[x, y, theta, kappa]`` samples (ref planner_utils.py:44-77, N=9)

TPU-first notes:

- batched over leading axes (no per-sample vmap); the N-point trapezoid
  update is a ``lax.scan`` whose carry is the whole batch.
- ``integrate_endpoint_gl`` adds a high-accuracy composite Gauss-Legendre
  endpoint integrator used by the BVP solver and the <=1e-6 endpoint-error
  verification; theta(s) is available in closed form so only (x, y) need
  quadrature.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_PATH_POINTS = 9  # reference planner_utils.py:8

# Lagrange interpolation of a cubic through curvature knots at s/sf = 0, 1/3,
# 2/3, 1 (ref planner_utils.py:10-17); row i gives the coefficient of s^i
# before division by sf^i.
_KNOT_TO_COEF = np.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [-11.0 / 2.0, 9.0, -9.0 / 2.0, 1.0],
        [9.0, -45.0 / 2.0, 18.0, -9.0 / 2.0],
        [-9.0 / 2.0, 27.0 / 2.0, -27.0 / 2.0, 9.0 / 2.0],
    ]
)


def params_to_coefs(params: jnp.ndarray) -> jnp.ndarray:
    """Map spiral params ``(..., 5)`` -> polynomial coefs ``(..., 4)`` of
    kappa(s) = a0 + a1 s + a2 s^2 + a3 s^3."""
    knots = params[..., :4]
    sf = params[..., 4]
    mat = jnp.asarray(_KNOT_TO_COEF, dtype=params.dtype)
    a = jnp.einsum("ij,...j->...i", mat, knots)
    powers = jnp.stack([jnp.ones_like(sf), sf, sf**2, sf**3], axis=-1)
    return a / powers


def curvature_theta(coefs: jnp.ndarray, s: jnp.ndarray):
    """kappa(s) and theta(s) = integral of kappa, batched.

    coefs ``(..., 4)``, s ``(...,)`` or broadcastable.
    """
    a0, a1, a2, a3 = (coefs[..., i] for i in range(4))
    kappa = a0 + s * (a1 + s * (a2 + s * a3))
    theta = s * (a0 + s * (a1 / 2.0 + s * (a2 / 3.0 + s * a3 / 4.0)))
    return kappa, theta


def integrate_path(params: jnp.ndarray, n_points: int = N_PATH_POINTS) -> jnp.ndarray:
    """Trapezoid-rule spiral integration, batched.

    Matches reference ``integrate_path_mult`` (planner_utils.py:62-77): returns
    ``(..., n_points, 6)`` samples ``[x, y, theta, kappa, dx, dy]`` at
    arc-lengths ``linspace(0, sf, n_points)``; the running-average recursion
    reproduces the reference's incremental trapezoid exactly.
    """
    coefs = params_to_coefs(params)
    sf = params[..., 4]
    batch_shape = sf.shape

    # s_k = k/(n-1) * sf for k = 0..n-1, fed to scan with k index 1..n
    fracs = jnp.linspace(0.0, 1.0, n_points, dtype=params.dtype)

    init = jnp.zeros(batch_shape + (6,), dtype=params.dtype)
    init = init.at[..., 3].set(coefs[..., 0])  # kappa(0)

    def body(state, frac_and_k):
        frac, k = frac_and_k
        s_k = frac * sf
        kappa_k, theta_k = curvature_theta(coefs, s_k)
        theta_prev = state[..., 2]
        dx = state[..., 4] * (1.0 - 1.0 / k) + (jnp.cos(theta_k) + jnp.cos(theta_prev)) / 2.0 / k
        dy = state[..., 5] * (1.0 - 1.0 / k) + (jnp.sin(theta_k) + jnp.sin(theta_prev)) / 2.0 / k
        x = s_k * dx
        y = s_k * dy
        new = jnp.stack([x, y, theta_k, kappa_k, dx, dy], axis=-1)
        return new, new

    ks = jnp.arange(1, n_points + 1, dtype=params.dtype)
    _, states = jax.lax.scan(body, init, (fracs, ks))
    return jnp.moveaxis(states, 0, -2)


def _gl_nodes(order: int, segments: int, dtype):
    """Composite Gauss-Legendre nodes/weights on [0, 1] (host-side, static)."""
    x, w = np.polynomial.legendre.leggauss(order)
    nodes, weights = [], []
    for i in range(segments):
        a, b = i / segments, (i + 1) / segments
        nodes.append((x + 1.0) * 0.5 * (b - a) + a)
        weights.append(w * 0.5 * (b - a))
    return (jnp.asarray(np.concatenate(nodes), dtype=dtype),
            jnp.asarray(np.concatenate(weights), dtype=dtype))


@partial(jax.jit, static_argnames=("order", "segments"))
def integrate_endpoint_gl(params: jnp.ndarray, order: int = 16,
                          segments: int = 4) -> jnp.ndarray:
    """High-accuracy endpoint ``[x, y, theta, kappa]`` via composite
    Gauss-Legendre quadrature of (cos theta(s), sin theta(s)), batched.

    theta(s) is polynomial (closed form), so only the position integrals need
    quadrature; order*segments = 64 nodes gives < 1e-12 relative error for
    the lattice ranges used by the reference LUTs.
    """
    coefs = params_to_coefs(params)
    sf = params[..., 4]
    nodes, weights = _gl_nodes(order, segments, params.dtype)
    s_nodes = sf[..., None] * nodes  # (..., Q)
    _, theta_nodes = curvature_theta(coefs[..., None, :], s_nodes)
    x = sf * jnp.sum(weights * jnp.cos(theta_nodes), axis=-1)
    y = sf * jnp.sum(weights * jnp.sin(theta_nodes), axis=-1)
    kappa_f, theta_f = curvature_theta(coefs, sf)
    return jnp.stack([x, y, theta_f, kappa_f], axis=-1)


@partial(jax.jit, static_argnames=("n_points", "order"))
def sample_path(params: jnp.ndarray, n_points: int = N_PATH_POINTS,
                order: int = 8) -> jnp.ndarray:
    """Accurate spiral path sampling: ``(..., n_points, 4)`` of
    ``[x, y, theta, kappa]`` at arc-lengths ``linspace(0, sf, n_points)``.

    Unlike ``integrate_path`` (which reproduces the reference's first-order
    running-average trapezoid, planner_utils.py:44-59), each segment is
    integrated with ``order``-point Gauss-Legendre and cumulatively summed —
    machine-precision positions at any sample count.  This is the path the
    framework itself uses for planning/visualization rollouts.
    """
    coefs = params_to_coefs(params)
    sf = params[..., 4]
    x_gl, w_gl = np.polynomial.legendre.leggauss(order)
    x_gl = jnp.asarray((x_gl + 1.0) * 0.5, dtype=params.dtype)  # [0, 1]
    w_gl = jnp.asarray(w_gl * 0.5, dtype=params.dtype)

    n_seg = n_points - 1
    h = sf / n_seg  # (...,)
    # segment start fractions (n_seg,) -> node positions (..., n_seg, order)
    seg0 = jnp.arange(n_seg, dtype=params.dtype)
    s_nodes = (seg0[:, None] + x_gl[None, :]) * h[..., None, None]
    _, theta_nodes = curvature_theta(coefs[..., None, None, :], s_nodes)
    dx_seg = h[..., None] * jnp.sum(w_gl * jnp.cos(theta_nodes), axis=-1)
    dy_seg = h[..., None] * jnp.sum(w_gl * jnp.sin(theta_nodes), axis=-1)
    zeros = jnp.zeros_like(dx_seg[..., :1])
    xs = jnp.cumsum(jnp.concatenate([zeros, dx_seg], axis=-1), axis=-1)
    ys = jnp.cumsum(jnp.concatenate([zeros, dy_seg], axis=-1), axis=-1)

    fracs = jnp.linspace(0.0, 1.0, n_points, dtype=params.dtype)
    s_samples = sf[..., None] * fracs
    kappa_s, theta_s = curvature_theta(coefs[..., None, :], s_samples)
    return jnp.stack([xs, ys, theta_s, kappa_s], axis=-1)


def clothoid_to_params(k0, dk, s):
    """Convert clothoid (linear-curvature) solution to the 5-param spiral
    layout: curvature knots at s/3 spacings (ref deprecated/genlut.py:62-65)."""
    k1 = k0 + dk * s / 3.0
    k2 = k0 + 2.0 * dk * s / 3.0
    k3 = k0 + dk * s
    return jnp.stack([k0, k1, k2, k3, s], axis=-1)
