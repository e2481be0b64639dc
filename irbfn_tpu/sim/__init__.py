"""Simulator layer (L1): track, Frenet frame, closed-loop env."""

from irbfn_tpu.sim.env import (Observation, SimState, StepRecord, TrackEnv,
                               deviation_metrics, observation_factory)
from irbfn_tpu.sim.track import (
    Raceline,
    Track,
    cartesian_to_frenet,
    centerline_from_arrays,
    frenet_to_cartesian,
    from_control_points,
    interp_wrapped,
    oval_track,
)

__all__ = [
    "Observation", "SimState", "StepRecord", "TrackEnv", "deviation_metrics",
    "observation_factory",
    "Raceline",
    "Track", "cartesian_to_frenet", "centerline_from_arrays",
    "frenet_to_cartesian", "from_control_points", "interp_wrapped",
    "oval_track",
]

from irbfn_tpu.sim.track import from_csv  # noqa: E402
from irbfn_tpu.sim import render  # noqa: E402
from irbfn_tpu.sim import lidar  # noqa: E402
from irbfn_tpu.sim.multi_agent import MultiAgentEnv, MultiAgentState, pairwise_collisions  # noqa: E402
from irbfn_tpu.sim.map import (OccupancyMap, ScanSpec, distance_at,  # noqa: E402
                               load_map_yaml, load_track_bundle,
                               map_clearance, rasterize_track, save_map_yaml,
                               trace_rays)

from irbfn_tpu.sim.safety import (ACTION_MODES, accl_action,  # noqa: E402
                                  beam_geometry, pid_lowlevel, speed_action,
                                  ttc_in_collision)

__all__ += ["from_csv", "render", "lidar", "MultiAgentEnv", "MultiAgentState",
            "pairwise_collisions", "OccupancyMap", "ScanSpec", "distance_at",
            "load_map_yaml", "load_track_bundle", "map_clearance",
            "rasterize_track", "save_map_yaml", "trace_rays",
            "ACTION_MODES", "accl_action", "beam_geometry", "pid_lowlevel",
            "speed_action", "ttc_in_collision"]
