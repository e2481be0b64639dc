"""Differentiable vehicle dynamics and path geometry (layer L2)."""

from irbfn_tpu.dynamics.params import G, VehicleParams, f1tenth_params, fullscale_params
from irbfn_tpu.dynamics.single_track import (
    CONTROL_DIM,
    ST_STATE_DIM,
    V_BLEND,
    blended_deriv,
    euler_step,
    integrate_st,
    kinematic_onestep,
    ks_deriv,
    rk4_step,
    rollout,
    st_deriv,
)
from irbfn_tpu.dynamics.frenet import (
    FRENET_STATE_DIM,
    V_SWITCH,
    frenet_deriv,
    frenet_hs_deriv,
    frenet_ls_deriv,
    frenet_onestep,
    frenet_rollout,
    integrate_frenet,
    tire_forces,
)
from irbfn_tpu.dynamics.spiral import (
    N_PATH_POINTS,
    clothoid_to_params,
    curvature_theta,
    integrate_endpoint_gl,
    integrate_path,
    params_to_coefs,
    sample_path,
)

__all__ = [
    "G", "VehicleParams", "f1tenth_params", "fullscale_params",
    "CONTROL_DIM", "ST_STATE_DIM", "V_BLEND", "blended_deriv", "euler_step",
    "integrate_st", "kinematic_onestep", "ks_deriv", "rk4_step", "rollout",
    "st_deriv", "FRENET_STATE_DIM", "V_SWITCH", "frenet_deriv",
    "frenet_hs_deriv", "frenet_ls_deriv", "frenet_onestep", "frenet_rollout",
    "integrate_frenet", "tire_forces", "N_PATH_POINTS", "clothoid_to_params",
    "curvature_theta", "integrate_endpoint_gl", "integrate_path", "sample_path",
    "params_to_coefs",
]
