"""Solver layer (L3): batched trajectory-optimization solvers.

TPU-native replacements for the reference's native solver stack
(SURVEY.md §2.6): IPOPT/CasADi -> ``nmpc``; pyclothoids -> ``clothoid``;
generic least squares -> ``lm``; OSQP -> ``qp``.
"""

from irbfn_tpu.solvers.clothoid import (
    ClothoidSolution,
    solve_g1_hermite,
    solve_g1_lattice,
    wrap_angle,
)
from irbfn_tpu.solvers.goal_mpc import (
    GoalMPCConfig,
    GoalMPCSolution,
    solve_goal_family,
    solve_goal_mpc,
)
from irbfn_tpu.solvers.lm import LMResult, levenberg_marquardt
from irbfn_tpu.solvers.nmpc import (
    cartesian_config,
    kinematic_config,
    solve_cartesian_point,
    NMPCConfig,
    NMPCSolution,
    solve_lattice_point,
    solve_lattice_multi_params,
    solve_nmpc_batch,
)

__all__ = [
    "ClothoidSolution", "solve_g1_hermite", "solve_g1_lattice", "wrap_angle",
    "GoalMPCConfig", "GoalMPCSolution", "solve_goal_family", "solve_goal_mpc",
    "LMResult", "levenberg_marquardt", "NMPCConfig", "NMPCSolution",
    "solve_lattice_point", "solve_nmpc_batch", "cartesian_config",
    "kinematic_config", "solve_cartesian_point", "solve_lattice_multi_params",
]
