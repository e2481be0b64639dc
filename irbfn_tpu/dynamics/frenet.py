"""Frenet-frame single-track dynamics.

Reproduces the model semantics of reference ``src/irbfn_mpc/dynamics.py``
(``dynamic_frenet_onestep`` lines 190-281) and the CasADi NMPC model
(``src/irbfn_mpc/nonlinear_dmpc_frenet.py:358-416``):

- state layout  ``[s, ey, delta, vx, vy, wz, epsi]`` (7,) + path curvature
- control layout ``[accl, steer_vel]`` (2,)
- high-speed model with simplified-Pacejka lateral tire forces
  ``Fy = D sin(C atan(B alpha))``, ``D = mu m g / 2`` (ref lines 219-248)
- low-speed kinematic model (ref lines 267-277)
- speed switch at ``V_SWITCH`` (the CasADi oracle, ref dmpc_frenet:412-414);
  the reference's JAX loss path uses the low-speed model unconditionally
  (ref dynamics.py:280), which ``frenet_deriv(..., blend="ls")`` matches.

All functions are natively batched over leading axes (see single_track.py for
the rationale).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from irbfn_tpu.dynamics.params import G, VehicleParams

# state indices
IS, IEY, IDELTA, IVX, IVY, IWZ, IEPSI = range(7)
FRENET_STATE_DIM = 7

V_SWITCH = 1.0  # kinematic/dynamic switch speed (ref dmpc_frenet.py:174)
B_TIRE = 1.0  # Pacejka B (ref dmpc_frenet.py:180-181)


def tire_forces(delta, vx, vy, wz, p: VehicleParams):
    """Front/rear lateral tire forces with simplified Pacejka magic formula."""
    d_peak = p.mu * p.m * G / 2.0
    vx_safe = jnp.where(jnp.abs(vx) < 1e-3, 1e-3, vx)
    alpha_f = delta - jnp.arctan2(vy + p.lf * wz, vx_safe)
    # NOTE: the reference uses lf (not lr) in the rear slip angle too
    # (dynamics.py:240, dmpc_frenet.py:375); kept for parity.
    alpha_r = -jnp.arctan2(vy - p.lf * wz, vx_safe)
    fyf = d_peak * jnp.sin(p.C_Sf * jnp.arctan(B_TIRE * alpha_f))
    fyr = d_peak * jnp.sin(p.C_Sr * jnp.arctan(B_TIRE * alpha_r))
    return fyf, fyr



def _one_m_ke(ey, curv, eps_denom):
    """``1 - ey*curv`` with an optional magnitude floor.

    The exact form is singular where the lateral offset reaches the path's
    curvature center (ey*curv -> 1). Oracle-table rows keep it >= 0.1, and
    the NMPC solver must see the EXACT dynamics (eps_denom=None) for
    table/solver parity — but TRAINING rollouts integrate the net's raw
    early-epoch predictions, which can push ey far outside the valid tube:
    one singular row NaNs the loss and permanently poisons the Adam state
    (measured on the wide table's curv 0.45 grid at step ~1.9k). The 0.05
    floor is inactive on every valid state (table min 0.1) and keeps
    gradients finite outside the tube.
    """
    d = 1.0 - ey * curv
    if eps_denom is None:
        return d
    return jnp.where(d >= 0, jnp.maximum(d, eps_denom),
                     jnp.minimum(d, -eps_denom))

def frenet_hs_deriv(x: jnp.ndarray, u: jnp.ndarray, curv: jnp.ndarray,
                    p: VehicleParams, saturate: bool = True,
                    eps_denom: float | None = None) -> jnp.ndarray:
    """High-speed (dynamic, tire-force) Frenet derivative, batched.

    Args:
        x: states ``(..., 7)`` = [s, ey, delta, vx, vy, wz, epsi]
        u: controls ``(..., 2)`` = [accl, steer_vel]
        curv: path curvature at s, ``(...,)``
        saturate: clip delta/controls to their physical limits (the reference
            JAX dynamics do, dynamics.py:227-236). The NMPC solver passes
            False: its CasADi counterpart feeds raw variables and enforces
            bounds as constraints (dmpc_frenet.py:358-416,443-453), and the
            clip kinks sit exactly at the solver's box bounds, creating
            spurious nonsmooth minima.
    """
    ey = x[..., IEY]
    delta = x[..., IDELTA]
    vx = x[..., IVX]
    vy = x[..., IVY]
    wz = x[..., IWZ]
    epsi = x[..., IEPSI]
    a = u[..., 0]
    sv = u[..., 1]
    if saturate:
        delta = jnp.clip(delta, -p.s_max, p.s_max)
        a = jnp.clip(a, -p.a_max, p.a_max)
        sv = jnp.clip(sv, -p.sv_max, p.sv_max)

    fyf, fyr = tire_forces(delta, vx, vy, wz, p)
    one_m_ke = _one_m_ke(ey, curv, eps_denom)
    s_dot = (vx * jnp.cos(epsi) - vy * jnp.sin(epsi)) / one_m_ke

    return jnp.stack(
        [
            s_dot,
            vx * jnp.sin(epsi) + vy * jnp.cos(epsi),
            sv,
            a - (fyf * jnp.sin(delta)) / p.m + wz * vy,
            (fyf * jnp.cos(delta) + fyr) / p.m - wz * vx,
            (p.lf * fyf * jnp.cos(delta) - p.lr * fyr) / p.I,
            wz - s_dot * curv,
        ],
        axis=-1,
    )


def frenet_ls_deriv(x: jnp.ndarray, u: jnp.ndarray, curv: jnp.ndarray,
                    p: VehicleParams, saturate: bool = True,
                    eps_denom: float | None = None) -> jnp.ndarray:
    """Low-speed (kinematic) Frenet derivative, batched. vy/wz derivatives
    are zero (ref dynamics.py:267-277). See frenet_hs_deriv for
    ``saturate``."""
    ey = x[..., IEY]
    delta = x[..., IDELTA]
    vx = x[..., IVX]
    epsi = x[..., IEPSI]
    a = u[..., 0]
    sv = u[..., 1]
    if saturate:
        delta = jnp.clip(delta, -p.s_max, p.s_max)
        a = jnp.clip(a, -p.a_max, p.a_max)
        sv = jnp.clip(sv, -p.sv_max, p.sv_max)

    s_dot = (vx * jnp.cos(epsi)) / _one_m_ke(ey, curv, eps_denom)
    zero = jnp.zeros_like(vx)
    return jnp.stack(
        [
            s_dot,
            vx * jnp.sin(epsi),
            sv,
            a,
            zero,
            zero,
            (vx * jnp.tan(delta)) / (p.lr + p.lf) - curv * s_dot,
        ],
        axis=-1,
    )


def frenet_deriv(x, u, curv, p: VehicleParams, blend: str = "switch",
                 v_switch: float = V_SWITCH, saturate: bool = True,
                 eps_denom: float | None = None) -> jnp.ndarray:
    """Frenet derivative with selectable model blending.

    blend="switch": speed-switched (the CasADi oracle's if_else, branchless).
    blend="ls":     always low-speed (the reference JAX loss path).
    blend="hs":     always high-speed.
    """
    if blend == "ls":
        return frenet_ls_deriv(x, u, curv, p, saturate, eps_denom)
    if blend == "hs":
        return frenet_hs_deriv(x, u, curv, p, saturate, eps_denom)
    speed = jnp.sqrt(x[..., IVX] ** 2 + x[..., IVY] ** 2)
    use_hs = (speed >= v_switch)[..., None]
    return jnp.where(use_hs, frenet_hs_deriv(x, u, curv, p, saturate,
                                             eps_denom),
                     frenet_ls_deriv(x, u, curv, p, saturate, eps_denom))


def frenet_rollout(x0: jnp.ndarray, controls: jnp.ndarray, curv: jnp.ndarray,
                   p: VehicleParams, blend: str = "ls",
                   integrator: str = "euler",
                   eps_denom: float | None = None) -> jnp.ndarray:
    """Integrate a control sequence in the Frenet frame (constant curvature
    over the horizon, as the oracle's parameterization assumes).

    Args:
        x0: ``(..., 7)``; controls: ``(..., T, 2)``; curv: ``(...,)``
    Returns:
        states after each step, ``(..., T, 7)``
    """
    deriv = partial(frenet_deriv, blend=blend, eps_denom=eps_denom)

    def step_fn(x, u):
        if integrator == "euler":
            x_new = x + deriv(x, u, curv, p) * _dt(p)
        else:
            dt = _dt(p)
            k1 = deriv(x, u, curv, p)
            k2 = deriv(x + 0.5 * dt * k1, u, curv, p)
            k3 = deriv(x + 0.5 * dt * k2, u, curv, p)
            k4 = deriv(x + dt * k3, u, curv, p)
            x_new = x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        return x_new, x_new

    u_t_first = jnp.moveaxis(controls, -2, 0)
    _, xs = jax.lax.scan(step_fn, x0, u_t_first)
    return jnp.moveaxis(xs, 0, -2)


def _dt(p: VehicleParams):
    dt = jnp.asarray(p.dt)
    return dt[..., None] if dt.ndim > 0 else dt


@partial(jax.jit, static_argnames=("horizon", "eps_denom"))
def integrate_frenet(x_and_u: jnp.ndarray, params_vec: jnp.ndarray,
                     horizon: int = 5,
                     eps_denom: float | None = None) -> jnp.ndarray:
    """Reference-ABI 5-step low-speed Frenet rollout.

    Equivalent of reference ``integrate_frenet_mult`` (dynamics.py:284-290):
    input rows ``[s, ey, delta, vx, vy, wz, epsi, curv, accl_0.., sv_0..]``
    (control tail column-major); returns ``(batch, T, 8)`` where the last
    column carries the (constant) curvature, matching the reference's 8-dim
    scan carry.
    """
    p = VehicleParams.from_vector(params_vec)
    x0 = x_and_u[..., :FRENET_STATE_DIM]
    curv = x_and_u[..., FRENET_STATE_DIM]
    tail = x_and_u[..., FRENET_STATE_DIM + 1:]
    controls = jnp.stack([tail[..., :horizon], tail[..., horizon:2 * horizon]], axis=-1)
    states = frenet_rollout(x0, controls, curv, p, blend="ls",
                            integrator="euler", eps_denom=eps_denom)
    curv_col = jnp.broadcast_to(curv[..., None, None], states.shape[:-1] + (1,))
    return jnp.concatenate([states, curv_col], axis=-1)


@jax.jit
def frenet_onestep(x_u: jnp.ndarray, params_vec: jnp.ndarray) -> jnp.ndarray:
    """Reference-ABI one-step reduced-state update.

    Equivalent of reference ``dynamic_frenet_onestep_aux`` (dynamics.py:293-383):
    input rows ``[ey, delta, vx, vy, wz, epsi, curv, <unused>, accl, sv]``;
    returns the 6-dim reduced next state ``[ey, delta, vx, vy, wz, epsi]``
    (the s column is dropped, ref line 382).
    """
    p = VehicleParams.from_vector(params_vec)
    zeros = jnp.zeros_like(x_u[..., 0])
    x = jnp.stack([zeros, x_u[..., 0], x_u[..., 1], x_u[..., 2], x_u[..., 3],
                   x_u[..., 4], x_u[..., 5]], axis=-1)
    curv = x_u[..., 6]
    u = x_u[..., 8:10]
    x_new = x + frenet_ls_deriv(x, u, curv, p) * _dt(p)
    return x_new[..., 1:]
