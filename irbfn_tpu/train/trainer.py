"""Training loops and losses for the WCRBF model family.

Reproduces the loss semantics of the reference trainers
(``scripts/train_nmpc_frenet.py:339-453``, ``scripts/train_nmpc.py:258-421``):

- ``pred`` loss: L1 between predicted and oracle control sequences;
- ``oneint`` loss: L1 between one-step-integrated states under predicted vs
  oracle controls, weighted x100 (train_nmpc_frenet.py:372);
- ``fullint`` loss: L1 between full 5-step rollouts (``:408-413``);
- ``cluster`` loss: softmax cross-entropy on the gate logits (``:432``);
- optax ``clip_by_global_norm`` + ``adam`` (``:312-314``);
- mirror augmentation of the Frenet table (``:89-101``).

TPU-first additions:

- a **sharded train step** over an explicit ``Mesh`` with data-parallel batch
  sharding and expert-parallel sharding of the region axis (the
  region-partitioned net is a hard-gated mixture-of-experts — SURVEY.md
  §2.7); gradients psum over the mesh automatically under jit;
- losses take the dynamics params as a pytree so mu/cs sweeps batch.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from irbfn_tpu.dynamics.frenet import frenet_onestep, integrate_frenet
from irbfn_tpu.dynamics.single_track import integrate_st
from irbfn_tpu.dynamics.spiral import integrate_endpoint_gl
from irbfn_tpu.solvers.clothoid import wrap_angle


class TrainState(train_state.TrainState):
    """TrainState carrying non-trainable variable collections (e.g. frozen
    centers) alongside params."""

    constants: Any = None


def create_train_state(model, rng, sample_input, lr: float = 1e-3,
                       max_grad_norm: float = 1.0,
                       decay_steps: Optional[int] = None) -> TrainState:
    """``decay_steps``: cosine-decay the lr to lr/10 over this many steps
    (fine-tune runs plateau at constant lr; reference trains constant-lr
    Adam for 10k epochs instead, train_nmpc_frenet.py:312)."""
    variables = model.init(rng, sample_input)
    constants = variables.get("constants", None)
    sched = (lr if decay_steps is None else
             optax.cosine_decay_schedule(lr, decay_steps, alpha=0.1))
    tx = optax.chain(optax.clip_by_global_norm(max_grad_norm),
                     optax.adam(sched))
    if constants is not None:
        def apply_fn(p, x):
            return model.apply({"params": p["params"], "constants": constants}, x)
    else:
        def apply_fn(p, x):
            return model.apply({"params": p["params"]}, x)
    return TrainState.create(
        apply_fn=apply_fn, params={"params": variables["params"]}, tx=tx,
        constants=constants)


def mirror_frenet_table(inputs: np.ndarray, outputs: np.ndarray,
                        exact: bool = True):
    """Mirror augmentation. inputs (N, 8), outputs (N, 2T).

    ``exact=True`` (default) applies the dynamics' true reflection symmetry:
    every lateral quantity flips — [ey, delta, vy, wz, epsi, curv] and the
    steer-vel outputs (validated to 1e-5 against the solver,
    tests/test_solvers.py::test_nmpc_full_mirror_symmetry). The reference
    flips only (ey, epsi, sv) (train_nmpc_frenet.py:89-101) — an
    approximation that injects wrong-problem rows whenever
    delta/vy/wz/curv are nonzero (severe at high curvature);
    ``exact=False`` reproduces it for strict reference parity."""
    T = outputs.shape[1] // 2
    flip = (np.array([-1, -1, 1, -1, 1, -1, -1, -1]) if exact
            else np.array([-1, 1, 1, 1, 1, 1, -1, 1]))
    in_m = inputs * flip
    out_m = np.concatenate([outputs[:, :T], -outputs[:, T:]], axis=1)
    return (np.concatenate([inputs, in_m], axis=0),
            np.concatenate([outputs, out_m], axis=0))


def region_spec_from_table(inputs: np.ndarray, splits, num_overlap: int = 1):
    """Region bounds from the unique grid values per dim, split into
    ``splits[d]`` contiguous segments (train_nmpc_frenet.py:114-199), with
    neighbouring segments overlapping by ``num_overlap`` grid values (the
    IROS pipeline's stride-tricks overlap, deprecated/train.py:76-113) —
    hard seams make independently-fitted region banks disagree across the
    boundary, which shows up as control oscillation exactly at the seam in
    closed loop.

    Also returns per-dim gate sharpness ``delta`` sized to the grid: the
    tanh transition width is ~half a grid step (4/step), so neighbouring
    regions blend over one cell instead of snapping."""
    import itertools

    from irbfn_tpu.models.wcrbf import overlapping_segments

    lower_bounds, upper_bounds, deltas = [], [], []
    for d, n_seg in enumerate(splits):
        vals = np.sort(np.unique(inputs[:, d]))
        lo, hi = overlapping_segments(vals, n_seg, num_overlap=num_overlap)
        lower_bounds.append(lo)
        upper_bounds.append(hi)
        step = (np.median(np.diff(vals)) if len(vals) > 1 else 1.0)
        deltas.append(float(np.clip(4.0 / max(step, 1e-9), 1.0, 100.0)))
    dimension_ranges = [list(t) for t in itertools.product(
        *[range(s) for s in splits])]
    return lower_bounds, upper_bounds, dimension_ranges, deltas


def mirror_cartesian_table(inputs: np.ndarray, outputs: np.ndarray):
    """Cartesian mirror augmentation (train_nmpc.py:61-82): reflect the
    goal/state across the car's x-axis. inputs (N, 7)
    [v, x_g, y_g, t_g, v_g, beta, angv]; outputs (N, 2T) control block.

    Unlike the frenet case there is no curvature subtlety — the reflection
    (y, theta, beta, angv, steer-vel flip) is the single-track dynamics'
    exact symmetry."""
    T = outputs.shape[1] // 2
    flip = np.array([1, 1, -1, -1, 1, -1, -1])
    in_m = inputs * flip
    out_m = np.concatenate([outputs[:, :T], -outputs[:, T:]], axis=1)
    return (np.concatenate([inputs, in_m], axis=0),
            np.concatenate([outputs, out_m], axis=0))


def _frenet_rollout_rows(x: jnp.ndarray, u_seq: jnp.ndarray, dyn_params):
    """Assemble reference-ABI rows and integrate: x is the 8-dim table input
    [ey, delta, vx, vy, vx_goal, wz, epsi, curv]; u_seq is (B, 2T)."""
    # initial frenet state [s=ey?...] — the reference builds
    # x[:, [0, 0, 1, 2, 3, 5, 6, 7]] (train_nmpc_frenet.py:398): the s slot
    # duplicates ey (s is unused by the low-speed model's outputs of
    # interest), kept for parity.
    init = x[:, [0, 0, 1, 2, 3, 5, 6, 7]]
    rows = jnp.concatenate([init, u_seq], axis=1)
    # eps_denom: early-epoch nets predict wild controls whose rollout can
    # cross the frenet singularity ey*curv -> 1 on wide-grid (curv 0.45)
    # tables — one singular row NaNs the loss and poisons Adam for good
    # (dynamics/frenet.py:_one_m_ke). Inactive on valid states.
    return integrate_frenet(rows, dyn_params, eps_denom=0.05)


def frenet_fullint_loss(apply_fn, params, x, y, dyn_params):
    """pred L1 + full-horizon integration L1 (train_nmpc_frenet.py:394-421)."""
    y_pred = apply_fn(params, x)
    pred_loss = jnp.abs(y_pred - y).mean()
    actual = _frenet_rollout_rows(x, y, dyn_params)
    pred = _frenet_rollout_rows(x, y_pred, dyn_params)
    int_loss = jnp.abs(pred - actual).mean()
    return pred_loss + int_loss, (pred_loss, int_loss)


def frenet_oneint_loss(apply_fn, params, x, y, dyn_params,
                       int_weight: float = 100.0):
    """pred L1 + x100 one-step integration L1 (train_nmpc_frenet.py:339-391).
    y here is the (B, 2) first-step control pair."""
    y_pred = apply_fn(params, x)
    pred_loss = jnp.abs(y_pred - y).mean()
    init = x[:, [0, 1, 2, 3, 5, 6, 7]]
    pad = jnp.zeros_like(x[:, :1])
    rows_true = jnp.concatenate([init, pad, y], axis=1)
    rows_pred = jnp.concatenate([init, pad, y_pred], axis=1)
    actual = frenet_onestep(rows_true, dyn_params)
    pred = frenet_onestep(rows_pred, dyn_params)
    int_loss = jnp.abs(pred - actual).mean()
    return pred_loss + int_weight * int_loss, (pred_loss, int_weight * int_loss)


def clothoid_endpoint_loss(apply_fn, params, x, y, dyn_params,
                           end_weight: float = 4.0):
    """pred L1 + endpoint (x, y, theta) L1 through differentiable composite
    Gauss-Legendre spiral quadrature (dynamics/spiral.py).

    The closed-form per-region fit minimizes UNIFORM param error, but
    d(endpoint)/d(curvature coef) grows ~ s^2/2, so long arcs (s up to
    ~38 m in the lattice the reference trains on, deprecated/train.py)
    need far tighter curvature fits than short ones.  Fine-tuning on the
    endpoint itself applies exactly that reweighting.  ``dyn_params`` is
    unused (signature parity with make_train_step)."""
    del dyn_params
    y_pred = apply_fn(params, x)
    pred_loss = jnp.abs(y_pred - y).mean()
    end = integrate_endpoint_gl(y_pred)
    end_loss = (jnp.abs(end[..., 0] - x[..., 0])
                + jnp.abs(end[..., 1] - x[..., 1])
                + jnp.abs(wrap_angle(end[..., 2] - x[..., 2]))).mean()
    return pred_loss + end_weight * end_loss, (pred_loss, end_loss)


def cluster_fullint_loss(apply_fn, params, x, y, cluster_ids, dyn_params):
    """fullint + softmax CE on gate logits (train_nmpc_frenet.py:424-453).

    ``cluster_ids`` are INTEGER labels ``(B,)``, not one-hots: the reference
    uploads a dense (B, 500) one-hot per step, which through the remote-TPU
    link is 40 MB/step at batch 20k — measured 1.2 s/step, 10x the compute.
    Integer labels are 80 KB and one-hot inside the loss is free."""
    y_pred, logits = apply_fn(params, x)
    pred_loss = jnp.abs(y_pred - y).mean()
    actual = _frenet_rollout_rows(x, y, dyn_params)
    pred = _frenet_rollout_rows(x, y_pred, dyn_params)
    int_loss = jnp.abs(pred - actual).mean()
    cl_loss = optax.softmax_cross_entropy_with_integer_labels(
        logits, cluster_ids).mean()
    return pred_loss + int_loss + cl_loss, (pred_loss, int_loss, cl_loss)


def cartesian_fullint_loss(apply_fn, params, x, y, dyn_params):
    """Cartesian-table analogue (train_nmpc.py:303-421): inputs are
    [v, x_g, y_g, t_g, v_g, beta, angv]; rollout starts from the origin at
    speed v and compares endpoint trajectories under pred vs oracle controls."""
    y_pred = apply_fn(params, x)
    pred_loss = jnp.abs(y_pred - y).mean()
    B = x.shape[0]
    zeros = jnp.zeros((B,), x.dtype)
    init = jnp.stack([zeros, zeros, zeros, x[:, 0], zeros, x[:, 6], x[:, 5]],
                     axis=-1)
    rows_true = jnp.concatenate([init, y], axis=1)
    rows_pred = jnp.concatenate([init, y_pred], axis=1)
    actual = integrate_st(rows_true, dyn_params)
    pred = integrate_st(rows_pred, dyn_params)
    int_loss = jnp.abs(pred - actual).mean()
    return pred_loss + int_loss, (pred_loss, int_loss)


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    pred_loss: jnp.ndarray
    int_loss: jnp.ndarray
    cluster_loss: Optional[jnp.ndarray] = None


def make_train_step(loss_fn: Callable, dyn_params, donate: bool = True):
    """Build a jitted train step ``(state, x, y, *extra) -> (state, metrics)``.

    Under a Mesh with sharded batch inputs, jit inserts the gradient psum
    across data shards automatically.
    """

    def step(state: TrainState, x, y, *extra):
        def lf(p):
            return loss_fn(state.apply_fn, p, x, y, *extra, dyn_params)

        (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        metrics = StepMetrics(loss, aux[0], aux[1],
                              aux[2] if len(aux) > 2 else None)
        return state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def train_epochs(state: TrainState, step_fn, inputs, outputs, batch_size: int,
                 epochs: int, rng, extra=None, log_fn=None,
                 checkpoint_fn=None, checkpoint_every: int = 100, mesh=None,
                 log_every: int = 25):
    """Permutation mini-batch epochs (train_nmpc_frenet.py:487-558).

    With ``mesh``, batches are placed with batch-axis sharding so the jitted
    step runs data-parallel (gradient psum inserted by XLA).

    Async-dispatch friendly: the permutation is drawn host-side (a device
    permutation would round-trip per batch) and ``log_fn`` fires every
    ``log_every`` steps — converting metrics to floats forces a device sync,
    which through a remote-TPU link costs more than the step itself.
    """
    device_gather = mesh is None
    if mesh is not None:
        from irbfn_tpu.parallel.mesh import data_sharding

        sharding = data_sharding(mesh)
        place = lambda a: jax.device_put(jnp.asarray(a), sharding)  # noqa: E731
    else:
        place = jnp.asarray
    n = inputs.shape[0]
    batch_size = min(batch_size, n)  # tables smaller than one batch
    steps = max(1, n // batch_size)
    np_rng = np.random.default_rng(
        np.asarray(jax.random.key_data(rng))[-1].item())
    if device_gather:
        # single-device path: the table lives in HBM ONCE and each batch is
        # a device-side gather driven by the uploaded permutation indices
        # (batch_size*4 bytes) — host-gathering rows and re-uploading them
        # every step was measured upload-bound through the remote-TPU link
        # (1.4 MB/step for x,y at batch 20k; worse with wide extras)
        inputs = jnp.asarray(inputs)
        outputs = jnp.asarray(outputs)
        extra = None if extra is None else jnp.asarray(extra)
    for e in range(epochs):
        perms = np_rng.permutation(n)[: steps * batch_size]
        perms = perms.reshape(steps, batch_size)
        losses = []
        for b, perm in enumerate(perms):
            if device_gather:
                idx = jnp.asarray(perm)
                bx = jnp.take(inputs, idx, axis=0)
                by = jnp.take(outputs, idx, axis=0)
                args = ((bx, by) if extra is None
                        else (bx, by, jnp.take(extra, idx, axis=0)))
            else:
                bx = place(inputs[perm])
                by = place(outputs[perm])
                args = ((bx, by) if extra is None
                        else (bx, by, place(extra[perm])))
            state, metrics = step_fn(state, *args)
            losses.append(metrics.loss)
            if log_fn is not None and (b % log_every == 0
                                       or b == steps - 1):
                log_fn(e * steps + b, metrics)
        if checkpoint_fn is not None and e % checkpoint_every == 0:
            checkpoint_fn(state, e)
    if checkpoint_fn is not None:
        checkpoint_fn(state, epochs - 1)
    return state, float(jnp.mean(jnp.stack(losses)))
