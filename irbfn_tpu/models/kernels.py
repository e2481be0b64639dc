"""Radial-basis-function kernel zoo + registry.

Same function set as the reference's ``flax_rbf`` dependency
(deprecated/f1tenth_gym/examples/flax_rbf/flax_rbf/flax_rbf.py:34-111, plus
the ``gaussian_narrow``/``gaussian_narrower`` additions imported at
scripts/train_nmpc_frenet.py:24-34).  The reference reconstructs kernels from
config files with ``eval(conf.basis_func)`` (irbfn_planner.py:73); here a
registry dict provides the safe round-trip.

All kernels are plain jnp elementwise maps ``alpha -> phi(alpha)`` applied to
the scaled center distances; they fuse into the surrounding matmul under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

_SQRT3 = 3.0**0.5
_SQRT5 = 5.0**0.5


def gaussian(alpha):
    return jnp.exp(-(alpha**2))


def gaussian_wide(alpha):
    return jnp.exp(-0.1 * alpha**2)


def gaussian_wider(alpha):
    return jnp.exp(-0.01 * alpha**2)


def gaussian_narrow(alpha):
    # scale inferred symmetrically from wide (0.1x) -> narrow (10x)
    return jnp.exp(-10.0 * alpha**2)


def gaussian_narrower(alpha):
    return jnp.exp(-100.0 * alpha**2)


def inverse_quadratic(alpha):
    return 1.0 / (1.0 + alpha**2)


def linear(alpha):
    return alpha


def quadratic(alpha):
    return alpha**2


def multiquadric(alpha):
    return jnp.sqrt(1.0 + alpha**2)


def inverse_multiquadric(alpha):
    return 1.0 / jnp.sqrt(1.0 + alpha**2)


def spline(alpha):
    return alpha**2 * jnp.log(alpha + 1.0)


def poisson_one(alpha):
    return (alpha - 1.0) * jnp.exp(-alpha)


def poisson_two(alpha):
    return ((alpha - 2.0) / 2.0) * alpha * jnp.exp(-alpha)


def matern32(alpha):
    return (1.0 + _SQRT3 * alpha) * jnp.exp(-_SQRT3 * alpha)


def matern52(alpha):
    return (1.0 + _SQRT5 * alpha + (5.0 / 3.0) * alpha**2) * jnp.exp(-_SQRT5 * alpha)


BASIS_FUNCTIONS = {
    fn.__name__: fn
    for fn in (
        gaussian, gaussian_wide, gaussian_wider, gaussian_narrow,
        gaussian_narrower, inverse_quadratic, linear, quadratic, multiquadric,
        inverse_multiquadric, spline, poisson_one, poisson_two, matern32,
        matern52,
    )
}


def get_basis(name_or_fn):
    """Resolve a basis function from a name (config round-trip) or callable."""
    if callable(name_or_fn):
        return name_or_fn
    try:
        return BASIS_FUNCTIONS[name_or_fn]
    except KeyError:
        raise KeyError(
            f"unknown basis function {name_or_fn!r}; "
            f"available: {sorted(BASIS_FUNCTIONS)}") from None
