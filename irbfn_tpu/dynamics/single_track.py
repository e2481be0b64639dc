"""Cartesian single-track (dynamic bicycle) and kinematic-bicycle dynamics.

Reproduces the model semantics of reference ``src/irbfn_mpc/dynamics.py``:

- state layout  ``[x, y, delta, v, psi, psi_dot, beta]`` (7,)
- control layout ``[accl, steer_vel]`` (2,)
- dynamic single-track derivative (``dynamic_st_onestep``, ref lines 49-76)
- kinematic fallback (``f_ks``, ref lines 78-88) with the ``v > 3.0`` blend
  (ref line 90) expressed branchlessly with ``jnp.where``.

TPU-first design notes (intentional divergences from the reference):

- All functions are *natively batched*: they accept states of shape
  ``(..., 7)`` and controls ``(..., 2)`` and vectorize over every leading
  axis.  The reference instead wraps per-sample scalar code in ``jax.vmap``;
  writing structure-of-arrays code directly gives XLA clean (B, 7) tensors to
  fuse and avoids per-element ``jnp.array([...])`` stacking in the trace.
- Horizon rollouts use ``lax.scan`` over the time axis with the *batch* axis
  dense inside each step, so each scan step is a wide elementwise op (VPU
  friendly), not a vmapped scan-of-scalars.
- Euler and RK4 steppers share one derivative function.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from irbfn_tpu.dynamics.params import G, VehicleParams

# state indices
IX, IY, IDELTA, IV, IPSI, IPSIDOT, IBETA = range(7)
ST_STATE_DIM = 7
CONTROL_DIM = 2

V_BLEND = 3.0  # kinematic/dynamic switching speed [m/s] (ref dynamics.py:90)


def st_deriv(x: jnp.ndarray, u: jnp.ndarray, p: VehicleParams) -> jnp.ndarray:
    """Dynamic single-track derivative, batched over leading axes.

    Args:
        x: states ``(..., 7)`` = [x, y, delta, v, psi, psi_dot, beta]
        u: controls ``(..., 2)`` = [accl, steer_vel]
        p: vehicle params (scalars or broadcastable leading axes)
    Returns:
        dx/dt ``(..., 7)``
    """
    delta = jnp.clip(x[..., IDELTA], -p.s_max, p.s_max)
    v = jnp.clip(x[..., IV], -p.v_max, p.v_max)
    psi = x[..., IPSI]
    psi_dot = x[..., IPSIDOT]
    beta = x[..., IBETA]
    accl = jnp.clip(u[..., 0], -p.a_max, p.a_max)
    sv = jnp.clip(u[..., 1], -p.sv_max, p.sv_max)

    # axle load transfer terms
    load_f = G * p.lr - accl * p.h
    load_r = G * p.lf + accl * p.h
    wb = p.lf + p.lr

    # guard v≈0 for the 1/v terms; blend below selects kinematic there anyway
    v_safe = jnp.where(jnp.abs(v) < 1e-3, jnp.where(v < 0, -1e-3, 1e-3), v)

    psi_ddot = (p.mu * p.m / (p.I * wb)) * (
        p.lf * p.C_Sf * load_f * delta
        + (p.lr * p.C_Sr * load_r - p.lf * p.C_Sf * load_f) * beta
        - (p.lf**2 * p.C_Sf * load_f + p.lr**2 * p.C_Sr * load_r) * (psi_dot / v_safe)
    )
    beta_dot = (p.mu / (v_safe * wb)) * (
        p.C_Sf * load_f * delta
        - (p.C_Sr * load_r + p.C_Sf * load_f) * beta
        + (p.C_Sr * load_r * p.lr - p.C_Sf * load_f * p.lf) * (psi_dot / v_safe)
    ) - psi_dot

    return jnp.stack(
        [
            v * jnp.cos(psi + beta),
            v * jnp.sin(psi + beta),
            sv,
            accl,
            psi_dot,
            psi_ddot,
            beta_dot,
        ],
        axis=-1,
    )


def ks_deriv(x: jnp.ndarray, u: jnp.ndarray, p: VehicleParams) -> jnp.ndarray:
    """Kinematic-bicycle derivative in the 7-dim ST state layout, batched."""
    delta = jnp.clip(x[..., IDELTA], -p.s_max, p.s_max)
    v = jnp.clip(x[..., IV], -p.v_max, p.v_max)
    psi = x[..., IPSI]
    accl = jnp.clip(u[..., 0], -p.a_max, p.a_max)
    sv = jnp.clip(u[..., 1], -p.sv_max, p.sv_max)
    zero = jnp.zeros_like(v)
    return jnp.stack(
        [
            v * jnp.cos(psi),
            v * jnp.sin(psi),
            sv,
            accl,
            (v / (p.lf + p.lr)) * jnp.tan(delta),
            zero,
            zero,
        ],
        axis=-1,
    )


def blended_deriv(x: jnp.ndarray, u: jnp.ndarray, p: VehicleParams,
                  v_blend: float = V_BLEND) -> jnp.ndarray:
    """Speed-switched derivative: dynamic ST above ``v_blend``, kinematic
    below (ref dynamics.py:90), branchless for dense vmap/shard lattices."""
    v = jnp.clip(x[..., IV], -p.v_max, p.v_max)
    use_dyn = (v > v_blend)[..., None]
    return jnp.where(use_dyn, st_deriv(x, u, p), ks_deriv(x, u, p))


# --------------------------------------------------- CommonRoad-exact model

V_SWITCH_CR = 7.319  # wheel-spin switching speed [m/s] (gym dynamic_models.py:88)
V_LOW_CR = 0.5  # |v| below which ST falls back to KS-CoG (:324)


def accl_constraint(v, accl, p: VehicleParams, v_switch: float = V_SWITCH_CR,
                    v_min=None):
    """CommonRoad acceleration constraint (gym dynamic_models.py:81-112),
    branchless: the positive limit decays as a_max*v_switch/v above the
    wheel-spin speed; acceleration pushing past the velocity box is zeroed."""
    v_min = -p.v_max if v_min is None else v_min
    pos_limit = jnp.where(v > v_switch,
                          p.a_max * v_switch / jnp.maximum(v, 1e-9), p.a_max)
    a = jnp.clip(accl, -p.a_max, pos_limit)
    pinned = ((v <= v_min) & (accl <= 0)) | ((v >= p.v_max) & (accl >= 0))
    return jnp.where(pinned, 0.0, a)


def steer_constraint(delta, sv, p: VehicleParams, s_min=None, sv_min=None):
    """CommonRoad steering-velocity constraint (gym
    dynamic_models.py:115-146), branchless: steering pushing past the angle
    box is zeroed, otherwise rate-clipped."""
    s_min = -p.s_max if s_min is None else s_min
    sv_min = -p.sv_max if sv_min is None else sv_min
    svc = jnp.clip(sv, sv_min, p.sv_max)
    pinned = ((delta <= s_min) & (sv <= 0)) | ((delta >= p.s_max) & (sv >= 0))
    return jnp.where(pinned, 0.0, svc)


def st_deriv_cr(x: jnp.ndarray, u: jnp.ndarray, p: VehicleParams,
                v_switch: float = V_SWITCH_CR,
                v_low: float = V_LOW_CR) -> jnp.ndarray:
    """CommonRoad-exact single-track derivative, batched and branchless
    (gym dynamic_models.py:272-395 / the TUM commonroad-vehicle-models ST):
    input constraints applied to (sv, accl), raw (unclipped) states in the
    equations, and the KS-at-CoG fallback with derived (psi_ddot, beta_dot)
    below ``v_low`` — unlike :func:`blended_deriv`, which uses the irbfn
    reference's simpler v>3 switch to the plain rear-axle KS model
    (src/irbfn_mpc/dynamics.py:90)."""
    delta = x[..., IDELTA]
    v = x[..., IV]
    psi = x[..., IPSI]
    psi_dot = x[..., IPSIDOT]
    beta = x[..., IBETA]
    sv = steer_constraint(delta, u[..., 1], p)
    accl = accl_constraint(v, u[..., 0], p, v_switch=v_switch)
    wb = p.lf + p.lr

    # --- dynamic ST branch (|v| >= v_low)
    load_f = G * p.lr - accl * p.h
    load_r = G * p.lf + accl * p.h
    v_safe = jnp.where(jnp.abs(v) < 1e-3, jnp.where(v < 0, -1e-3, 1e-3), v)
    psi_ddot = (p.mu * p.m / (p.I * wb)) * (
        p.lf * p.C_Sf * load_f * delta
        + (p.lr * p.C_Sr * load_r - p.lf * p.C_Sf * load_f) * beta
        - (p.lf**2 * p.C_Sf * load_f + p.lr**2 * p.C_Sr * load_r)
        * (psi_dot / v_safe))
    beta_dot = (p.mu / (v_safe * wb)) * (
        p.C_Sf * load_f * delta
        - (p.C_Sr * load_r + p.C_Sf * load_f) * beta
        + (p.C_Sr * load_r * p.lr - p.C_Sf * load_f * p.lf)
        * (psi_dot / v_safe)) - psi_dot
    dyn = jnp.stack([v * jnp.cos(psi + beta), v * jnp.sin(psi + beta),
                     sv, accl, psi_dot, psi_ddot, beta_dot], axis=-1)

    # --- KS-at-CoG branch (|v| < v_low; gym dynamic_models.py:323-372)
    beta_ks = jnp.arctan(jnp.tan(delta) * p.lr / wb)
    cos_d2 = jnp.cos(delta) ** 2
    d_beta = (p.lr * sv) / (
        wb * cos_d2 * (1.0 + (jnp.tan(delta) * p.lr / wb) ** 2))
    dd_psi = (1.0 / wb) * (
        accl * jnp.cos(beta) * jnp.tan(delta)
        - v * jnp.sin(beta) * d_beta * jnp.tan(delta)
        + v * jnp.cos(beta) * sv / cos_d2)
    ks = jnp.stack([v * jnp.cos(psi + beta_ks), v * jnp.sin(psi + beta_ks),
                    sv, accl, v * jnp.cos(beta_ks) * jnp.tan(delta) / wb,
                    dd_psi, d_beta], axis=-1)

    return jnp.where((jnp.abs(v) < v_low)[..., None], ks, dyn)


def ks_deriv_cr(x: jnp.ndarray, u: jnp.ndarray,
                p: VehicleParams) -> jnp.ndarray:
    """CommonRoad kinematic single-track (rear-axle reference) with input
    constraints, in the 7-dim layout (gym dynamic_models.py:149-205)."""
    delta = x[..., IDELTA]
    v = x[..., IV]
    psi = x[..., IPSI]
    sv = steer_constraint(delta, u[..., 1], p)
    accl = accl_constraint(v, u[..., 0], p)
    zero = jnp.zeros_like(v)
    return jnp.stack([v * jnp.cos(psi), v * jnp.sin(psi), sv, accl,
                      (v / (p.lf + p.lr)) * jnp.tan(delta), zero, zero],
                     axis=-1)


def st_mixed_deriv(x: jnp.ndarray, u: jnp.ndarray, p: VehicleParams,
                   v_s: float = 3.0, v_b: float = 0.1) -> jnp.ndarray:
    """Tanh-blended kinematic/dynamic single-track derivative, batched.

    The Cartesian NMPC oracle's model (reference nonlinear_dmpc.py:259-325):
    below ``v_s`` a kinematic model *with sideslip geometry* (beta and its
    derivative follow from the steering geometry), above it the dynamic
    single-track, mixed with ``w = 0.5 (tanh((v - v_s)/v_b) + 1)`` and then
    hard-switched at ``v_s``.  Unsaturated (raw controls/states) — this is
    the solver-side model; bounds are handled by the optimizer.
    """
    delta = x[..., IDELTA]
    v = x[..., IV]
    psi = x[..., IPSI]
    psi_dot = x[..., IPSIDOT]
    beta = x[..., IBETA]
    accl = u[..., 0]
    sv = u[..., 1]

    wb = p.lf + p.lr
    load_f = G * p.lr - accl * p.h
    load_r = G * p.lf + accl * p.h
    v_safe = jnp.where(jnp.abs(v) < 1e-2, jnp.where(v < 0, -1e-2, 1e-2), v)

    # slow (kinematic-with-sideslip) yaw/yaw-rate/beta derivatives
    tan_d = jnp.tan(delta)
    cos_d2 = jnp.cos(delta) ** 2
    dyaw_slow = v * jnp.cos(beta) * tan_d / wb
    dbeta_slow = (p.lr * sv) / (wb * cos_d2 * (1.0 + (tan_d * p.lr / wb) ** 2))
    dyawrate_slow = (1.0 / wb) * (
        accl * jnp.cos(beta) * tan_d
        - v * jnp.sin(beta) * tan_d * dbeta_slow
        + v * jnp.cos(beta) * sv / cos_d2)

    # fast (dynamic single-track) yaw-rate/beta derivatives
    dyaw_fast = psi_dot
    dyawrate_fast = (
        -p.mu * p.m / (v_safe * p.I * wb)
        * (p.lf**2 * p.C_Sf * load_f + p.lr**2 * p.C_Sr * load_r) * psi_dot
        + p.mu * p.m / (p.I * wb)
        * (p.lr * p.C_Sr * load_r - p.lf * p.C_Sf * load_f) * beta
        + p.mu * p.m / (p.I * wb) * p.lf * p.C_Sf * load_f * delta)
    dbeta_fast = (
        (p.mu / (v_safe**2 * wb)
         * (p.C_Sr * load_r * p.lr - p.C_Sf * load_f * p.lf) - 1.0) * psi_dot
        - p.mu / (v_safe * wb) * (p.C_Sr * load_r + p.C_Sf * load_f) * beta
        + p.mu / (v_safe * wb) * p.C_Sf * load_f * delta)

    w = 0.5 * (jnp.tanh((v - v_s) / v_b) + 1.0)
    # mixed model, hard-selected against pure-slow below v_s (ref :325)
    sel = v > v_s
    dyaw = jnp.where(sel, w * dyaw_fast + (1 - w) * dyaw_slow, dyaw_slow)
    dyawrate = jnp.where(sel, w * dyawrate_fast + (1 - w) * dyawrate_slow,
                         dyawrate_slow)
    dbeta = jnp.where(sel, w * dbeta_fast + (1 - w) * dbeta_slow, dbeta_slow)

    return jnp.stack(
        [v * jnp.cos(psi + beta), v * jnp.sin(psi + beta), sv, accl,
         dyaw, dyawrate, dbeta], axis=-1)


def _bcast_dt(dt):
    """dt may be scalar or batched over leading axes; add a state-dim axis."""
    dt = jnp.asarray(dt)
    return dt[..., None] if dt.ndim > 0 else dt


def euler_step(deriv_fn, x, u, p: VehicleParams):
    return x + deriv_fn(x, u, p) * _bcast_dt(p.dt)


def rk4_step(deriv_fn, x, u, p: VehicleParams):
    dt = _bcast_dt(p.dt)
    k1 = deriv_fn(x, u, p)
    k2 = deriv_fn(x + 0.5 * dt * k1, u, p)
    k3 = deriv_fn(x + 0.5 * dt * k2, u, p)
    k4 = deriv_fn(x + dt * k3, u, p)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def rollout(x0: jnp.ndarray, controls: jnp.ndarray, p: VehicleParams,
            deriv_fn=blended_deriv, integrator: str = "euler") -> jnp.ndarray:
    """Integrate a control sequence. Batched over leading axes of ``x0``.

    Args:
        x0: initial states ``(..., 7)``
        controls: ``(..., T, 2)``
        integrator: "euler" (reference behavior) or "rk4"
    Returns:
        all states after each step, ``(..., T, 7)``
    """
    step = euler_step if integrator == "euler" else rk4_step
    u_t_first = jnp.moveaxis(controls, -2, 0)  # (T, ..., 2)

    def body(x, u):
        x_new = step(deriv_fn, x, u, p)
        return x_new, x_new

    _, xs = jax.lax.scan(body, x0, u_t_first)
    return jnp.moveaxis(xs, 0, -2)  # (..., T, 7)


@partial(jax.jit, static_argnames=("horizon",))
def integrate_st(x_and_u: jnp.ndarray, params_vec: jnp.ndarray,
                 horizon: int = 5) -> jnp.ndarray:
    """Reference-ABI 5-step blended rollout.

    Drop-in equivalent of reference ``integrate_st_mult`` (dynamics.py:94-100):
    input rows ``[x(7), accl_0..accl_{T-1}, sv_0..sv_{T-1}]`` with the control
    tail in column-major (accl block then sv block) order; returns all states
    ``(batch, T, 7)``.
    """
    p = VehicleParams.from_vector(params_vec)
    x0 = x_and_u[..., :ST_STATE_DIM]
    tail = x_and_u[..., ST_STATE_DIM:]
    controls = jnp.stack([tail[..., :horizon], tail[..., horizon:2 * horizon]], axis=-1)
    return rollout(x0, controls, p, deriv_fn=blended_deriv, integrator="euler")


@jax.jit
def kinematic_onestep(x_u: jnp.ndarray, params_vec: jnp.ndarray) -> jnp.ndarray:
    """Reference-ABI one-step kinematic Euler update.

    Equivalent of reference ``dynamic_st_onestep_aux`` (dynamics.py:103-187),
    which despite its name applies only the kinematic model (ref line 186).
    Input rows ``[x(7), accl, sv]`` -> next state ``(..., 7)``.
    """
    p = VehicleParams.from_vector(params_vec)
    x = x_u[..., :ST_STATE_DIM]
    u = x_u[..., ST_STATE_DIM:ST_STATE_DIM + 2]
    return x + ks_deriv(x, u, p) * _bcast_dt(p.dt)
