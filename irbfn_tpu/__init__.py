"""irbfn_tpu — TPU-native interpolating-RBF-network motion-planning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability set of hzheng40/irbfn
(IROS-2023 "Differentiable Trajectory Generation for Car-like Robots by
Interpolating Radial Basis Function Networks" + the learned-NMPC extension):

- ``irbfn_tpu.dynamics``  — differentiable vehicle dynamics (single-track,
  kinematic, Frenet) and cubic-spiral path integration.
- ``irbfn_tpu.solvers``   — batched trajectory-optimization solvers (clothoid
  G1-Hermite BVP, Levenberg-Marquardt, NMPC SQP, box-ADMM QP) replacing
  IPOPT / CasADi / pyclothoids / OSQP with vmapped pure-JAX iteration.
- ``irbfn_tpu.models``    — region-partitioned RBF networks (WCRBFNet family)
  with an MXU-friendly matmul formulation, plus direct (Cholesky) fitting.
- ``irbfn_tpu.ops``       — Pallas TPU kernels and jnp geometry primitives.
- ``irbfn_tpu.parallel``  — mesh/sharding helpers and sharded lattice datagen
  (replaces joblib process fan-out with shard_map over the TPU mesh).
- ``irbfn_tpu.planning``  — online planners (network, explicit-LUT, adaptive).
- ``irbfn_tpu.sim``       — minimal closed-loop track simulator + Frenet frame.
- ``irbfn_tpu.train``     — training loops, losses, checkpointing, config I/O.
"""

__version__ = "0.1.0"

from irbfn_tpu import dynamics, models, ops, parallel, planning, sim, solvers, train, utils  # noqa: F401
