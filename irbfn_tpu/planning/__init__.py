"""Planner / runtime layer (L5)."""

from irbfn_tpu.planning.bandits import EXP3, exp3_init, exp3_probs, exp3_pull, exp3_update
from irbfn_tpu.planning.explicit import (
    AdaptiveExplicitPlanner,
    ExplicitFrenetPlanner,
    GridTable,
    NNTable,
    grid_lookup,
    grid_lookup_linear,
    grid_table_from_arrays,
    nn_lookup,
    nn_table_from_arrays,
)
from irbfn_tpu.planning.grip import (
    GripConfig,
    GripState,
    grip_init,
    grip_record,
    grip_update,
)
from irbfn_tpu.planning.planner import (
    AdaptiveIRBFNPlanner,
    GripAdaptiveFrenetPlanner,
    IRBFNFrenetPlanner,
    IRBFNPlanner,
    NMPCPlanner,
    PlanResult,
    stack_net_bank,
)

__all__ = [
    "EXP3", "exp3_init", "exp3_probs", "exp3_pull", "exp3_update",
    "AdaptiveExplicitPlanner", "ExplicitFrenetPlanner", "GridTable",
    "NNTable", "grid_lookup", "grid_lookup_linear", "grid_table_from_arrays", "nn_lookup",
    "nn_table_from_arrays", "AdaptiveIRBFNPlanner", "IRBFNFrenetPlanner",
    "IRBFNPlanner", "NMPCPlanner", "PlanResult", "stack_net_bank",
    "GripConfig", "GripState", "grip_init", "grip_record", "grip_update",
    "GripAdaptiveFrenetPlanner",
]

from irbfn_tpu.planning.lattice import (  # noqa: E402
    LatticePlan,
    LatticePlanner,
    plan_lattice,
    sample_lookahead_grid,
)

__all__ += ["LatticePlan", "LatticePlanner", "plan_lattice",
            "sample_lookahead_grid"]

from irbfn_tpu.planning.goal_planner import GoalMPCPlanner  # noqa: E402

__all__ += ["GoalMPCPlanner"]
