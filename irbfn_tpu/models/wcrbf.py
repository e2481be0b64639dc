"""Region-partitioned RBF networks (the WCRBFNet model family).

Same model semantics as reference ``src/irbfn_mpc/model.py`` (WCRBFNet,
DeeperWCRBFNet, MLP, ClusterWCRBFNet) and the flax_rbf ``RBFLayer``
(distance ``||x - c|| / exp(log_sig)``, trainable centers/log-widths), but
with an MXU-first computation:

- **distances as matmul**: ``||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2`` so the
  (batch, regions*kernels) distance matrix rides the systolic array as one
  ``dot_general`` instead of the reference's broadcast-subtract-reduce
  (flax_rbf.py:275-280), which is HBM-bandwidth-bound at (B, R, K, F);
- **regions as one tensor**: centers are a single (R, K, F) parameter and
  region mixing is an einsum against the smooth region indicator, replacing
  the reference's nested ``nn.vmap`` over regions (model.py:143-159);
- **vectorized region indicator**: per-region lower/upper bounds are gathered
  into (R, D) arrays at module-build time, so the indicator is one fused
  broadcast product over (B, R, D) — the reference builds it with Python
  loops over dims and regions (model.py:74-93).

Checkpoint/config ABI: constructor fields mirror the reference YAML configs
(in_features, out_features, num_kernels, basis_func, num_regions,
lower_bounds, upper_bounds, dimension_ranges, activation_idx, delta), so a
config written by the trainer round-trips through ``models.from_config``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from irbfn_tpu.models.kernels import get_basis


def build_region_bounds(lower_bounds, upper_bounds, dimension_ranges,
                        activation_idx):
    """Gather per-dimension segment bounds into dense (R, D) arrays.

    ``lower_bounds[d]``/``upper_bounds[d]`` list the segment edges of split
    dimension d; ``dimension_ranges[r][j]`` names the segment of region r in
    split dim j (reference model.py:88-93 semantics).
    """
    n_regions = len(dimension_ranges)
    n_dims = len(activation_idx)
    lb = np.zeros((n_regions, n_dims))
    ub = np.zeros((n_regions, n_dims))
    for r, seg in enumerate(dimension_ranges):
        for j in range(n_dims):
            lb[r, j] = lower_bounds[j][int(seg[j])]
            ub[r, j] = upper_bounds[j][int(seg[j])]
    return lb, ub


def overlapping_segments(values, n_segments: int, num_overlap: int = 1):
    """Per-dimension segment bounds where neighbouring segments overlap by
    ``num_overlap`` grid values (the reference builds these with numpy
    stride tricks, deprecated/train.py:76-113). Returns (lower, upper)
    lists of length n_segments."""
    values = np.sort(np.unique(np.asarray(values)))
    edges = np.linspace(0, len(values) - 1, n_segments + 1, dtype=int)
    lower, upper = [], []
    for s in range(n_segments):
        lo_i = max(0, edges[s] - (num_overlap if s > 0 else 0))
        hi_i = min(len(values) - 1,
                   edges[s + 1] + (num_overlap if s < n_segments - 1 else 0))
        lower.append(float(values[lo_i]))
        upper.append(float(values[hi_i]))
    return lower, upper


def region_activation(x, lb, ub, delta, activation_idx):
    """Smooth box indicator gamma, vectorized over (batch, regions).

    gamma[b, r] = prod_d sigma(delta_d (x_d - lb_rd)) sigma(delta_d (ub_rd - x_d))
    with sigma(t) = (tanh(t)+1)/2 — identical to reference model.py:83-91.

    Args:
        x: (B, F); lb/ub: (R, D); delta: (D,); activation_idx: (D,) indices
        into the feature axis.
    Returns:
        (B, R)
    """
    xs = x[:, jnp.asarray(activation_idx)]  # (B, D)
    lo = (jnp.tanh(delta * (xs[:, None, :] - lb)) + 1.0) * 0.5  # (B, R, D)
    hi = (jnp.tanh(delta * (ub - xs[:, None, :])) + 1.0) * 0.5
    return jnp.prod(lo * hi, axis=-1)


def rbf_distances(x, centers, log_sigs, input_scale=None):
    """Scaled distances ``||x - c_rk|| / exp(log_sig_rk)``, direct form.

    ``input_scale``: optional (F,) per-dimension metric weights — distances
    become ``||s * (x - c)||`` (anisotropic). Without it, raw-unit Euclidean
    distance lets the widest-ranged input dominate and dims with small
    numeric range (e.g. path curvature, +-0.45, vs velocity, 1-8) become
    invisible to isotropic kernels.

    d^2 is accumulated DIRECTLY as sum_f (x_f - c_f)^2, unrolled over the
    (small) feature axis — exact f32 on the VPU. The x^2 - 2xc + c^2 matmul
    trick is both numerically and physically wrong here: it cancels
    catastrophically when ||x - c|| << ||x|| (direct-fit weight banks are
    ill-conditioned with large cancelling coefficients that amplify d^2
    error ~1e4x — the TPU's default bf16 matmul passes produced garbage
    predictions at serve time, and even a 6-pass HIGHEST einsum leaves
    ~5e-6 relative error vs the direct form's 3e-7), and an F~8
    contraction is a degenerate MXU shape (measured 83 us HIGHEST-einsum
    vs 56 us direct for (1024, 16, 512, 8) — the "fast" matmul loses).

    Args:
        x: (B, F); centers: (R, K, F); log_sigs: (R, K)
    Returns:
        (B, R, K)
    """
    if input_scale is not None:
        s = jnp.asarray(input_scale, x.dtype)
        x = x * s
        centers = centers * s
    sq = jnp.zeros(x.shape[:1] + centers.shape[:2],
                   jnp.promote_types(x.dtype, jnp.float32))
    for f in range(x.shape[-1]):
        df = x[:, f][:, None, None] - centers[None, :, :, f]
        sq = sq + df * df
    d = jnp.sqrt(jnp.maximum(sq, 1e-30))
    return d / jnp.exp(log_sigs)[None]


class RegionRBFCore(nn.Module):
    """Shared core: (B, F) -> (B, K) region-blended RBF features.

    Parameterizes all regions' RBF banks as single dense tensors and blends
    them with externally supplied region weights.
    """

    in_features: int
    num_kernels: int
    num_regions: int
    basis_func: Callable
    centers_init: Optional[np.ndarray] = None  # (K, F) or (R, K, F)
    trainable_centers: bool = True
    trainable_widths: bool = True
    input_scale: Optional[Sequence[float]] = None  # (F,) metric weights
    head_mode: str = "shared"  # "shared" (B,K) | "per_region" (B, R*K+R)

    def _center_initializer(self):
        if self.centers_init is None:
            return nn.initializers.normal(1.0)
        vals = np.asarray(self.centers_init)
        if vals.ndim == 2:  # shared warm-start centers, as the reference's
            vals = np.broadcast_to(vals, (self.num_regions,) + vals.shape)

        def init(key, shape, dtype=jnp.float32):
            del key
            return jnp.asarray(np.broadcast_to(vals, shape), dtype)

        return init

    @nn.compact
    def __call__(self, x, region_weights):
        shape_c = (self.num_regions, self.num_kernels, self.in_features)
        shape_s = (self.num_regions, self.num_kernels)
        if self.trainable_centers:
            centers = self.param("centers", self._center_initializer(), shape_c)
        else:
            centers = self.variable(
                "constants", "centers",
                lambda: jnp.asarray(self._center_initializer()(
                    jax.random.PRNGKey(0), shape_c))).value
        if self.trainable_widths:
            log_sigs = self.param("log_sigs", nn.initializers.zeros, shape_s)
        else:
            log_sigs = self.variable(
                "constants", "log_sigs", lambda: jnp.zeros(shape_s)).value

        d = rbf_distances(x, centers, log_sigs,
                          input_scale=self.input_scale)  # (B, R, K)
        phi = self.basis_func(d)
        if self.head_mode == "per_region":
            # block features [w_r * phi_rk ; w_r]: a Dense head over them is
            # a PER-REGION linear model (weights + bias) blended by the
            # region weights — strictly more expressive than the shared head
            # and exactly the fit_per_region parameterization (models/fit.py)
            weighted = region_weights[:, :, None] * phi  # (B, R, K)
            return jnp.concatenate(
                [weighted.reshape(x.shape[0], -1), region_weights], axis=-1)
        return jnp.einsum("br,brk->bk", region_weights, phi)


class WCRBFNet(nn.Module):
    """Piecewise (region-partitioned) RBF network with linear head.

    Equivalent to reference ``WCRBFNet`` (model.py:98-198) including the
    center variants selected there via layer classes (model.py:131-140):
    ``centers=None`` -> free centers; ``centers`` given -> warm-start;
    ``fixed_centers`` freezes them; ``fixed_width`` additionally freezes
    the log-widths.
    """

    in_features: int
    out_features: int
    num_kernels: int
    basis_func: Callable
    num_regions: int
    lower_bounds: Sequence[Sequence[float]]
    upper_bounds: Sequence[Sequence[float]]
    dimension_ranges: Sequence[Sequence[int]]
    activation_idx: Sequence[int]
    delta: Sequence[float]
    centers: Optional[np.ndarray] = None
    fixed_centers: bool = False
    fixed_width: bool = False
    input_scale: Optional[Sequence[float]] = None  # (F,) metric weights
    # (tuple; see rbf_distances — centers stay in raw input units)
    # "per_region": per-region output heads over NORMALIZED region weights
    # (gamma / sum gamma, an exact partition of unity) — the net becomes a
    # convex blend of R independent local RBF models. Fixes two shared-head
    # failure modes observed closed-loop: edge attenuation (raw gamma is 0.5
    # at the outermost bounds, halving the output there) and seam
    # disagreement (overlap zones sum gamma ~ 2)
    head_mode: str = "shared"

    def setup(self):
        lb, ub = build_region_bounds(self.lower_bounds, self.upper_bounds,
                                     self.dimension_ranges, self.activation_idx)
        self._lb = jnp.asarray(lb)
        self._ub = jnp.asarray(ub)
        self._delta = jnp.asarray(np.asarray(self.delta, dtype=np.float64))
        self.core = RegionRBFCore(
            in_features=self.in_features,
            num_kernels=self.num_kernels,
            num_regions=self.num_regions,
            basis_func=self.basis_func,
            centers_init=self.centers,
            trainable_centers=not self.fixed_centers,
            trainable_widths=not self.fixed_width,
            input_scale=self.input_scale,
            head_mode=self.head_mode,
        )
        # HIGHEST precision on the head is load-bearing for direct fits:
        # the (B, R*K+R) @ (R*K+R, O) contraction carries large CANCELLING
        # closed-form coefficients, and the TPU's default bf16 multiply
        # passes perturb the blended output by ~0.1 mean (measured vs f64
        # on the flagship 16x512 fit)
        self.head = nn.Dense(self.out_features,
                             precision=jax.lax.Precision.HIGHEST)

    def __call__(self, x):
        gamma = region_activation(x, self._lb, self._ub,
                                  self._delta.astype(x.dtype),
                                  tuple(self.activation_idx))
        if self.head_mode == "per_region":
            gamma = gamma / (jnp.sum(gamma, axis=-1, keepdims=True) + 1e-9)
        feats = self.core(x, gamma)
        return self.head(feats)


class DeeperWCRBFNet(nn.Module):
    """WCRBFNet with a 2x Dense(64)+relu MLP head (model.py:201-289)."""

    in_features: int
    out_features: int
    num_kernels: int
    basis_func: Callable
    num_regions: int
    lower_bounds: Sequence[Sequence[float]]
    upper_bounds: Sequence[Sequence[float]]
    dimension_ranges: Sequence[Sequence[int]]
    activation_idx: Sequence[int]
    delta: Sequence[float]
    hidden: int = 64
    input_scale: Optional[Sequence[float]] = None

    def setup(self):
        lb, ub = build_region_bounds(self.lower_bounds, self.upper_bounds,
                                     self.dimension_ranges, self.activation_idx)
        self._lb = jnp.asarray(lb)
        self._ub = jnp.asarray(ub)
        self._delta = jnp.asarray(np.asarray(self.delta, dtype=np.float64))
        self.core = RegionRBFCore(
            in_features=self.in_features, num_kernels=self.num_kernels,
            num_regions=self.num_regions, basis_func=self.basis_func,
            input_scale=self.input_scale)
        self.pre1 = nn.Dense(self.hidden)
        self.pre2 = nn.Dense(self.hidden)
        self.head = nn.Dense(self.out_features)

    def __call__(self, x):
        gamma = region_activation(x, self._lb, self._ub,
                                  self._delta.astype(x.dtype),
                                  tuple(self.activation_idx))
        feats = self.core(x, gamma)
        h = nn.relu(self.pre1(feats))
        h = nn.relu(self.pre2(h))
        return self.head(h)


class MLP(nn.Module):
    """Plain MLP baseline with the WCRBF constructor signature
    (model.py:292-338): widths K/2 -> K -> K/2 -> out."""

    in_features: int
    out_features: int
    num_kernels: int
    basis_func: Callable = None
    num_regions: int = 1
    lower_bounds: Sequence = ()
    upper_bounds: Sequence = ()
    dimension_ranges: Sequence = ()
    activation_idx: Sequence = ()
    delta: Sequence = ()
    input_scale: Optional[Sequence[float]] = None  # unused (sig compat)

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.num_kernels // 2)(x))
        h = nn.relu(nn.Dense(self.num_kernels)(h))
        h = nn.relu(nn.Dense(self.num_kernels // 2)(h))
        return nn.Dense(self.out_features)(h)


class ClusterWCRBFNet(nn.Module):
    """Learned-gate variant: a Dense+softmax gate replaces the geometric
    region indicator and the logits are returned for the auxiliary
    cluster-classification loss (model.py:341-414).

    ``input_scale`` is an anisotropic-metric extension over the reference
    (which uses the raw isotropic distance): without it vx (range ~7)
    drowns curv (range ~0.9) in the kernel distances — the measured
    lesson from every other variant in this repo. None = reference parity.
    """

    in_features: int
    out_features: int
    num_kernels: int
    basis_func: Callable
    num_regions: int
    input_scale: Optional[Sequence[float]] = None

    def setup(self):
        self.core = RegionRBFCore(
            in_features=self.in_features, num_kernels=self.num_kernels,
            num_regions=self.num_regions, basis_func=self.basis_func,
            input_scale=self.input_scale)
        self.gate = nn.Dense(self.num_regions)
        self.head = nn.Dense(self.out_features)

    def __call__(self, x):
        logits = self.gate(x)
        weights = nn.softmax(logits)
        feats = self.core(x, weights)
        return self.head(feats), logits
