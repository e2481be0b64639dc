"""Online effective-grip estimation from one-step lateral residuals.

The round-3 grid study showed the flagship learned planner's failures form a
clean grip frontier: every loss below raceline pace was pace selection, not
tracking (BASELINE.md "grip-aware pace" row) — but the 82/100 there came from
a HAND-PICKED global ``--speed_scale``.  This module closes that gap with an
observer the planner can run online, per episode lane, inside the jitted
closed-loop rollout.

Physics: in the sim's dynamic single-track model every lateral-force term
carries ``mu * C_S{f,r}`` linearly (single_track.py:st_deriv:67-76 — the
reference's dynamics.py:49-76 has the same structure), so with
``C_Sf = C_Sr`` the yaw/slip accelerations decompose EXACTLY as

    [psi_ddot, beta_dot](g) = g * tire(x, u) + base(x),   g = mu*cs / (mu0*cs0)

where ``tire = deriv(p0) - deriv(p0 with mu=0)`` and ``base = deriv(mu=0)``
are both computable from the NOMINAL params ``p0``.  One scalar ``g`` captures
both unknowns the robustness sweeps vary (friction mu and cornering stiffness
cs) because they only ever enter as a product in the linear-tire regime.

The estimator is a gated per-step least squares on that scalar: measure
``[d psi_dot, d beta] / dt`` across a control period, subtract ``base``,
project onto ``tire``, and EMA the quotient.  Gates: a previous sample must
exist, the speed must be above the sim's kinematic-blend switch (below it the
stepped model has no tire forces at all), and the tire prediction must be
large enough to divide by (straights carry no grip information).  The EMA is
asymmetric — grip revises DOWN faster than up — because the cost of
overestimating grip is a spin and the cost of underestimating is pace.

Used by ``GripAdaptiveFrenetPlanner`` (planner.py) to pick the nearest-mu arm
of a multi-mu net bank AND the pace scale sqrt(g) — the per-arm sqrt(mu) pace
law validated in scripts/eval_adaptive.py, now driven by the observer instead
of a per-run constant.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from irbfn_tpu.dynamics.params import VehicleParams
from irbfn_tpu.dynamics.single_track import V_BLEND, st_deriv

# lateral rows of the ST state derivative: psi_ddot (of psi_dot), beta_dot
_LAT = (5, 6)


class GripConfig(NamedTuple):
    """Observer gains. ``w_beta`` rescales the beta_dot row into psi_ddot
    units (beta_dot magnitudes are ~wheelbase/v smaller) so the projection
    isn't dominated by one row."""

    g0: float = 0.5          # conservative prior (pace sqrt(g0) ~ 0.71)
    beta_up: float = 0.10    # EMA rate when revising grip UP
    beta_down: float = 0.35  # EMA rate when revising grip DOWN (safety-fast)
    exc_min: float = 0.5     # min weighted |tire| [rad/s^2] to update
    v_min: float = V_BLEND + 0.5  # below the sim's kinematic blend: no info
    g_lo: float = 0.05
    g_hi: float = 2.5
    w_beta: float = 4.0


class GripState(NamedTuple):
    """Per-lane observer carry (all fields batched over the episode axes)."""

    g: jnp.ndarray          # (...,) effective lateral gain estimate
    prev_lat: jnp.ndarray   # (..., 2) previous [psi_dot, beta]
    prev_tire: jnp.ndarray  # (..., 2) tire-term prediction recorded then
    prev_base: jnp.ndarray  # (..., 2) mu=0 baseline prediction recorded then
    has_prev: jnp.ndarray   # (...,) bool


def grip_init(batch_shape, cfg: GripConfig = GripConfig(),
              dtype=jnp.float32) -> GripState:
    return GripState(
        g=jnp.full(batch_shape, cfg.g0, dtype),
        prev_lat=jnp.zeros(batch_shape + (2,), dtype),
        prev_tire=jnp.zeros(batch_shape + (2,), dtype),
        prev_base=jnp.zeros(batch_shape + (2,), dtype),
        has_prev=jnp.zeros(batch_shape, bool))


def _cart_state(obs) -> jnp.ndarray:
    """Rebuild the sim's 7-dim ST state from an Observation (env.observe is
    a bijection on these fields, sim/env.py:161-168)."""
    return jnp.stack([obs.pose_x, obs.pose_y, obs.delta, obs.linear_vel_x,
                      obs.pose_theta, obs.ang_vel_z, obs.beta], axis=-1)


def grip_update(state: GripState, obs, cfg: GripConfig,
                ctrl_dt: float) -> GripState:
    """Fold the newly observed lateral state into the gain estimate.

    Call at the TOP of the policy (before choosing the action): compares the
    lateral change over the last control period against the tire/base
    predictions recorded by ``grip_record`` when that action was issued.
    """
    lat = jnp.stack([obs.ang_vel_z, obs.beta], axis=-1)
    w = jnp.asarray([1.0, cfg.w_beta], lat.dtype)
    measured = (lat - state.prev_lat) / ctrl_dt
    resid = (measured - state.prev_base) * w
    tire = state.prev_tire * w
    tt = jnp.sum(tire * tire, axis=-1)
    g_inst = jnp.sum(tire * resid, axis=-1) / jnp.maximum(tt, 1e-12)
    g_inst = jnp.clip(g_inst, cfg.g_lo, cfg.g_hi)
    gate = (state.has_prev
            & (jnp.sqrt(tt) >= cfg.exc_min)
            & (obs.linear_vel_x >= cfg.v_min))
    beta = jnp.where(g_inst < state.g, cfg.beta_down, cfg.beta_up)
    g_new = jnp.where(gate, (1.0 - beta) * state.g + beta * g_inst, state.g)
    return state._replace(g=g_new.astype(state.g.dtype))


def grip_record(state: GripState, obs, action: jnp.ndarray,
                p_nominal: VehicleParams, cfg: GripConfig) -> GripState:
    """Record this step's tire/base predictions for the NEXT update.

    Call at the BOTTOM of the policy with the action about to be applied.
    ``p_nominal`` defines the g = 1 reference (e.g. the f1tenth params at
    mu = 1, C_S = 5 — the bank's training nominal).
    """
    x = _cart_state(obs)
    d_nom = st_deriv(x, action, p_nominal)
    p0 = p_nominal._replace(mu=jnp.zeros_like(p_nominal.mu))
    d_base = st_deriv(x, action, p0)
    lat = jnp.stack([obs.ang_vel_z, obs.beta], axis=-1)
    sl = slice(_LAT[0], _LAT[1] + 1)
    dt = state.prev_lat.dtype
    return state._replace(
        prev_lat=lat.astype(dt),
        prev_tire=(d_nom[..., sl] - d_base[..., sl]).astype(dt),
        prev_base=d_base[..., sl].astype(dt),
        has_prev=jnp.ones_like(state.has_prev))
