"""Typed vehicle-parameter pytree.

The reference passes dynamics parameters as a positional 13-float vector
``[mu, m, I, lf, lr, C_Sf, C_Sr, h, dt, sv_max, a_max, s_max, v_max]``
(see reference ``src/irbfn_mpc/dynamics.py:24-36``).  Here the parameters are a
named pytree so they can be vmapped/sharded per-lattice-point (e.g. a mu sweep
becomes one extra batch axis instead of an outer Python loop), while
``from_vector``/``to_vector`` keep the reference ABI for parity tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

G = 9.81


class VehicleParams(NamedTuple):
    """Single-track vehicle parameters (CommonRoad conventions)."""

    mu: jnp.ndarray  # friction coefficient
    m: jnp.ndarray  # mass [kg]
    I: jnp.ndarray  # yaw moment of inertia [kg m^2]
    lf: jnp.ndarray  # CoG -> front axle [m]
    lr: jnp.ndarray  # CoG -> rear axle [m]
    C_Sf: jnp.ndarray  # front cornering stiffness
    C_Sr: jnp.ndarray  # rear cornering stiffness
    h: jnp.ndarray  # CoG height [m]
    dt: jnp.ndarray  # integration timestep [s]
    sv_max: jnp.ndarray  # max steering velocity [rad/s]
    a_max: jnp.ndarray  # max acceleration [m/s^2]
    s_max: jnp.ndarray  # max steering angle [rad]
    v_max: jnp.ndarray  # max velocity [m/s]

    @property
    def wheelbase(self):
        return self.lf + self.lr

    @classmethod
    def from_vector(cls, vec) -> "VehicleParams":
        """Build from the reference's 13-float parameter vector layout."""
        vec = jnp.asarray(vec)
        return cls(*[vec[..., i] for i in range(13)])

    def to_vector(self) -> jnp.ndarray:
        return jnp.stack(list(self), axis=-1)

    def astype(self, dtype) -> "VehicleParams":
        return VehicleParams(*[jnp.asarray(f, dtype=dtype) for f in self])


def f1tenth_params(mu: float = 1.0, cs: float = 5.0, dt: float = 0.1,
                   dtype=jnp.float32) -> VehicleParams:
    """F1TENTH-scale car, matching the constants hardcoded in the reference
    planners (reference ``src/irbfn_mpc/irbfn_planner.py:50-66``)."""
    vals = [mu, 1.0489, 0.04712, 0.15875, 0.17145, cs, cs, 0.074, dt,
            3.2, 9.51, 0.4189, 7.0]
    return VehicleParams(*[jnp.asarray(v, dtype=dtype) for v in vals])


def fullscale_params(mu: float = 1.0, cs: float = 5.0, dt: float = 0.1,
                     dtype=jnp.float32) -> VehicleParams:
    """Heavier vehicle used by the Frenet NMPC oracle
    (reference ``src/irbfn_mpc/nonlinear_dmpc_frenet.py:186-190``)."""
    vals = [mu, 15.32, 0.64332, 0.2735, 0.2585, cs, cs, 0.1875, dt,
            3.141592653589793, 9.51, 0.4189, 10.0]
    return VehicleParams(*[jnp.asarray(v, dtype=dtype) for v in vals])
