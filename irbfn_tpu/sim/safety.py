"""Low-level vehicle safety + control primitives.

Capability match for the reference RaceCar pipeline pieces that sit between
the planner and the integrator (reference
``deprecated/f1tenth_gym/gym/f110_gym/envs/base_classes.py:125-165`` beam
geometry precompute, ``envs/laser_models.py:252-279`` iTTC collision check,
``envs/dynamic_models.py:419-461`` PID speed/steer -> accel/steer-vel, and
``envs/action.py:43-91`` action-mode factory).

TPU-first formulation: every reference routine here is a per-beam or
per-agent scalar loop with data-dependent branches; they are rewritten as
branchless array expressions batched over arbitrary leading axes, so the TTC
safety check of a whole robustness sweep is one fused elementwise op on
device.
"""

from __future__ import annotations

import jax.numpy as jnp

from irbfn_tpu.dynamics.params import VehicleParams


def beam_geometry(n_beams: int = 64, fov: float = 4.7, width: float = 0.31,
                  lf: float = 0.15875, lr: float = 0.17145):
    """Per-beam scan angles, cosines, and car-edge offsets.

    ``side_distances[i]`` is the distance from the lidar (at the CoG) to the
    car body edge along beam i — the reference precomputes this with a
    four-quadrant branch (base_classes.py:138-164); all four cases reduce to
    ``min(half_width / |sin a|, half_length / |cos a|)`` (a rectangle's
    support function), which is what is computed here, branchlessly.

    Returns (scan_angles, cosines, side_distances), each (n_beams,).
    """
    angles = -fov / 2.0 + jnp.arange(n_beams) * (fov / (n_beams - 1))
    cosines = jnp.cos(angles)
    dist_sides = width / 2.0
    dist_fr = (lf + lr) / 2.0
    to_side = dist_sides / jnp.maximum(jnp.abs(jnp.sin(angles)), 1e-12)
    to_fr = dist_fr / jnp.maximum(jnp.abs(cosines), 1e-12)
    return angles, cosines, jnp.minimum(to_side, to_fr)


def ttc_in_collision(scan, vel, cosines, side_distances,
                     ttc_thresh: float = 0.005):
    """Instantaneous time-to-collision safety check (laser_models.py:252-279).

    For each beam, iTTC = (range - car_edge_offset) / (v cos a); the vehicle
    is "in collision" if any beam's iTTC lands in [0, ttc_thresh). A zero
    velocity never collides (reference :268,276-277).

    Args:
        scan: (..., n_beams) ranges.
        vel: (...,) longitudinal velocity.
    Returns:
        (...,) bool.
    """
    scan = jnp.asarray(scan)
    vel = jnp.asarray(vel)[..., None]
    proj_vel = vel * cosines
    safe = jnp.where(proj_vel == 0.0, 1.0, proj_vel)
    ttc = jnp.where(proj_vel == 0.0, jnp.inf,
                    (scan - side_distances) / safe)
    hit = (ttc >= 0.0) & (ttc < ttc_thresh) & (vel != 0.0)
    return jnp.any(hit, axis=-1)


def pid_lowlevel(speed, steer, current_speed, current_steer,
                 p: VehicleParams, v_min=None):
    """Speed/steer command -> (accel, steer-vel), the reference's low-level
    controller (dynamic_models.py:419-461), branchless and batched.

    Steering is bang-bang at sv_max outside a 1e-4 deadband; acceleration is
    proportional with gain 10*a_max/v_max forward (2* in reverse), with the
    braking gain normalized by |v_min| (reference :438-459).

    ``v_min`` defaults to the reference gym's -5.0 (its cars' reverse-speed
    limit is asymmetric: v_max 7.0 forward, 5.0 reverse — params dict in
    f110_env.py); VehicleParams carries no v_min field (the 13-float
    reference ABI has none), so callers with other vehicles pass it
    explicitly.
    """
    v_min = -5.0 if v_min is None else v_min
    steer_diff = steer - current_steer
    sv = jnp.where(jnp.abs(steer_diff) > 1e-4,
                   jnp.sign(steer_diff) * p.sv_max, 0.0)
    vel_diff = speed - current_speed
    fwd_gain = jnp.where(vel_diff > 0.0, 10.0 * p.a_max / p.v_max,
                         10.0 * p.a_max / (-v_min))
    rev_gain = jnp.where(vel_diff > 0.0, 2.0 * p.a_max / p.v_max,
                         2.0 * p.a_max / (-v_min))
    accl = jnp.where(current_speed > 0.0, fwd_gain, rev_gain) * vel_diff
    return accl, sv


def accl_action(action, state, p: VehicleParams):
    """'accl' control mode: action (..., 2) = [accel, steer_vel] passes
    through (action.py:43-59; saturation happens inside the dynamics)."""
    del state, p
    return jnp.asarray(action)


def speed_action(action, state, p: VehicleParams):
    """'speed' control mode: action (..., 2) = [speed, steer] is converted to
    [accel, steer_vel] by the PID against the current ST state
    (action.py:62-84: pid(speed, steer, state[3]=v, state[2]=delta, ...))."""
    action = jnp.asarray(action)
    accl, sv = pid_lowlevel(action[..., 0], action[..., 1],
                            state[..., 3], state[..., 2], p)
    return jnp.stack([accl, sv], axis=-1)


ACTION_MODES = {"accl": accl_action, "speed": speed_action}
