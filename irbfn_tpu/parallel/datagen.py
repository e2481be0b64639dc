"""Sharded lattice data generation (the joblib-fan-out replacement).

The reference generates solution tables by forking 100 CPU processes, each
running a CasADi/IPOPT solver point-by-point
(scripts/nmpc_data_generator_frenet.py:100-113, N7 in SURVEY.md §2.6).  Here
the lattice is one sharded array:

    grid spec -> meshgrid rows -> shard over mesh 'data' axis ->
    per-shard vmapped solve (clothoid or NMPC) -> all_gather -> host save

The per-point solve is already batched (vmap inside jit), so ``shard_map``
only partitions the lattice across devices; XLA lays the all-gather on ICI.
Solver failures come back as a validity mask in the same row positions
(replacing the -999 sentinel convention; a ``to_sentinel_rows`` helper
reproduces the reference's on-disk format for drop-in table compatibility).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from irbfn_tpu.parallel.mesh import DATA_AXIS, make_mesh


@dataclass(frozen=True)
class GridSpec:
    """One lattice axis: linspace(lo, hi, num) (endpoint inclusive, matching
    the reference's np.linspace grids, nmpc_data_generator_frenet.py:41-60)."""

    name: str
    lo: float
    hi: float
    num: int

    def values(self) -> np.ndarray:
        return np.linspace(self.lo, self.hi, self.num, endpoint=True)


# the reference's default frenet lattice (arg_utils.py:39-72)
FRENET_GRID = (
    GridSpec("ey", -0.2, 2.0, 12),
    GridSpec("delta", -0.3, 0.3, 7),
    GridSpec("vx_car", 1.0, 7.0, 11),
    GridSpec("vy_car", -1.0, 1.0, 11),
    GridSpec("vx_goal", 3.0, 7.0, 5),
    GridSpec("wz", -2.6, 2.6, 11),
    GridSpec("epsi", -1.0, 1.0, 11),
    GridSpec("curv", -0.1, 0.1, 3),
)

# the reference's clothoid LUT lattice (deprecated/genlut.py:33-46)
CLOTHOID_GRID = (
    GridSpec("x", 5.0, 30.0, 251),
    GridSpec("y", -8.0, 8.0, 161),
    GridSpec("theta", -1.57, 1.57, 158),
)


def build_lattice(grid: Sequence[GridSpec], dtype=np.float32) -> np.ndarray:
    """Meshgrid the axes into flat rows (N, D), 'ij' indexing like the
    reference so row order (and therefore table layout) matches."""
    axes = [g.values() for g in grid]
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack([m.reshape(-1) for m in mesh], axis=-1).astype(dtype)


def _pad_rows(rows: np.ndarray, multiple: int) -> Tuple[np.ndarray, int]:
    n = rows.shape[0]
    n_pad = ((n + multiple - 1) // multiple) * multiple
    if n_pad != n:
        rows = np.concatenate(
            [rows, np.broadcast_to(rows[-1:], (n_pad - n,) + rows.shape[1:])])
    return rows, n


def solve_lattice_sharded(solve_fn: Callable, rows: np.ndarray,
                          mesh=None, batch_per_device: int = 65536,
                          progress: bool = False, args=(),
                          pipeline_depth: int = 2):
    """Run ``solve_fn`` (a batched jittable rows->pytree solver) over a
    lattice, sharded across the mesh's data axis.

    Args:
        solve_fn: maps ``(B, D)`` rows (plus ``*args``) to a pytree of
            ``(B, ...)`` results.
        rows: the full lattice ``(N, D)``.
        mesh: a Mesh (defaults to all devices on one 'data' axis).
        batch_per_device: chunk size per device per dispatch; chunking keeps
            peak HBM bounded for multi-hundred-million-row lattices.
        args: extra pytree operands passed through as TRACED inputs
            (replicated). Sweep parameters (e.g. mu) must come through here
            — baked into the closure they become compile-time constants and
            every sweep value recompiles the solver.
        pipeline_depth: chunks kept in flight. The device->host fetch of
            chunk i is a blocking RPC (slow through the dev tunnel, ~10 MB/s)
            but the device computes asynchronously — dispatching chunk i+1
            BEFORE materializing chunk i overlaps transfer with compute
            (measured 2x on multi-million-row TPU datagen runs). Depth bounds
            in-flight HBM at (depth+1) chunks.
    Returns:
        pytree of np arrays with leading dim N.
    """
    if mesh is None:
        mesh = make_mesh(expert=1)
    n_dev = mesh.devices.size
    chunk_rows = n_dev * batch_per_device
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    # prefix-pytree shardings: one replicated spec per extra operand tree
    jitted = jax.jit(solve_fn,
                     in_shardings=(sharding,) + tuple(repl for _ in args),
                     out_shardings=repl)

    outs = []
    n_total = rows.shape[0]
    import time as _time

    t_start = _time.time()
    inflight: list = []  # (device result, n_valid, rows done at dispatch)

    def _drain_one():
        result, n_valid, done = inflight.pop(0)
        outs.append(jax.tree.map(lambda a: np.asarray(a)[:n_valid], result))
        if progress:
            rate = done / max(_time.time() - t_start, 1e-9)
            print(f"  lattice progress {done:,}/{n_total:,} "
                  f"({rate:,.0f} rows/s incl. compile)", flush=True)

    for start in range(0, n_total, chunk_rows):
        chunk = rows[start:start + chunk_rows]
        # pad the tail chunk to the full chunk size so every dispatch reuses
        # one compiled program (a second shape would recompile the solver)
        chunk, n_valid = _pad_rows(chunk, chunk_rows if n_total > chunk_rows
                                   else n_dev)
        inflight.append((jitted(jnp.asarray(chunk), *args), n_valid,
                         min(start + chunk_rows, n_total)))
        if len(inflight) > pipeline_depth:
            _drain_one()
    while inflight:
        _drain_one()
    return jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *outs)


class TableSolution(NamedTuple):
    """The table-relevant slice of an NMPCSolution: what datagen actually
    persists (frenet_table below). Fetching ONLY this over the host link —
    with the activation one-hot as bool — cuts the per-row payload 4x vs the
    full solution (states/kkt are discarded by the table format anyway)."""

    accel: jnp.ndarray  # (..., T)
    steer_vel: jnp.ndarray  # (..., T)
    active_onehot: jnp.ndarray  # (..., 86) bool
    feasible: jnp.ndarray  # (...,) bool

    @classmethod
    def from_solution(cls, sol, include_onehot: bool = True) -> "TableSolution":
        """``include_onehot=False`` drops the 86-wide activation pattern
        (the dominant per-row payload) for tables that only feed lookup
        planners — e.g. multi-mu bandit banks — where constraint clustering
        is never run; ``frenet_table`` then omits ``constraints``."""
        onehot = (sol.active_onehot.astype(jnp.bool_) if include_onehot
                  else sol.active_onehot[..., :0].astype(jnp.bool_))
        return cls(sol.accel, sol.steer_vel, onehot, sol.feasible)


def frenet_table(rows, solution, n_constraints: int = 86) -> Dict[str, np.ndarray]:
    """Assemble the reference's on-disk table dict from an NMPCSolution:
    ``inputs`` (N, 8), ``outputs`` (N, T, 2) [accel, steer-vel columns], and
    ``constraints`` (N, 86), with infeasible rows encoded as -999 sentinels
    (nmpc_data_generator_frenet.py:119-140 format)."""
    accel = np.asarray(solution.accel)
    sv = np.asarray(solution.steer_vel)
    feas = np.asarray(solution.feasible)
    onehot = np.asarray(solution.active_onehot)
    outputs = np.stack([accel, sv], axis=-1)
    outputs[~feas] = -999.0
    table = {"inputs": np.asarray(rows), "outputs": outputs, "valid": feas}
    if onehot.shape[-1]:
        constraints = onehot.astype(np.float64)
        constraints[~feas] = -999.0
        table["constraints"] = constraints
    return table


def save_table(path: str, table: Dict[str, np.ndarray]):
    np.savez(path, **table)


def controls_block(outputs: np.ndarray) -> np.ndarray:
    """Flatten a table's (N, T, 2) [accel, steer-vel] control sequences into
    the BLOCK layout ``[a_0..a_{T-1}, sv_0..sv_{T-1}]`` (N, 2T).

    This is the net-output/rollout-ABI layout: the reference trainer unpacks
    ``outputs[:, :, 0]`` / ``[:, :, 1]`` and concatenates the blocks
    (train_nmpc_frenet.py:66-67), and the dynamics adapters reshape controls
    column-major (dynamics.py:98). A plain ``reshape(N, -1)`` on the npz
    INTERLEAVES [a0, sv0, a1, sv1, ...] — consumed as block layout that
    reads sv_2 where sv_0 belongs (a 2-control-period steering delay in the
    planner). Already-flat (N, 2T) arrays pass through unchanged."""
    outputs = np.asarray(outputs)
    if outputs.ndim == 2:
        return outputs
    n, t, c = outputs.shape
    return outputs.transpose(0, 2, 1).reshape(n, c * t)
