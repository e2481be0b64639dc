"""Direct (closed-form) RBF fitting: kernel matrix + regularized Cholesky.

The reference fits every RBF network with thousands of Adam epochs
(scripts/train_nmpc_frenet.py:543-558).  Because the WCRBF output is *linear*
in the head weights once centers/widths/region-indicator are fixed, the
weights also solve in closed form — the classical RBF-interpolation normal
equations.  This is the BASELINE.json-requested capability ("kernel-matrix
build + blocked regularized-Cholesky weight solve per interpolation region")
and is orders of magnitude faster than SGD for table fitting.

Feature modes:

- ``shared``:     features g(x) = sum_r gamma_r(x) phi_r(x)  (K,)   — exactly
  the WCRBFNet head parameterization (model.py:193-196), so the solved
  weights load into a WCRBFNet head.
- ``per_region``: features G(x) = [gamma_r(x) phi_rk(x)]     (R*K,) — block
  design matrix, strictly more expressive (per-region output heads).

All matmuls are (N, K)x(K, K) MXU work; the normal equations are accumulated
in chunks so arbitrarily large tables stream through HBM.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from irbfn_tpu.models.wcrbf import rbf_distances, region_activation


class DirectFit(NamedTuple):
    weights: jnp.ndarray  # (Kf, O)
    bias: jnp.ndarray  # (O,)
    centers: jnp.ndarray  # (R, K, F)
    log_sigs: jnp.ndarray  # (R, K)
    mode: str
    input_scale: Optional[tuple] = None  # (F,) metric weights

    def predict(self, x, lb, ub, delta, activation_idx, basis_func):
        feats = rbf_features(x, self.centers, self.log_sigs, lb, ub, delta,
                             activation_idx, basis_func, mode=self.mode,
                             input_scale=self.input_scale)
        return feats @ self.weights + self.bias


def rbf_features(x, centers, log_sigs, lb, ub, delta, activation_idx,
                 basis_func, mode: str = "shared", input_scale=None):
    """Region-blended RBF feature map. x (B,F) -> (B, K) or (B, R*K).

    The region indicator gates on RAW inputs (bounds are in raw units);
    ``input_scale`` only reshapes the RBF distance metric (see
    wcrbf.rbf_distances)."""
    gamma = region_activation(x, lb, ub, delta, activation_idx)  # (B, R)
    d = rbf_distances(x, centers, log_sigs, input_scale=input_scale)
    phi = basis_func(d)
    if mode == "shared":
        return jnp.einsum("br,brk->bk", gamma, phi)
    weighted = gamma[:, :, None] * phi  # (B, R, K)
    return weighted.reshape(x.shape[0], -1)


def fit_direct(x, y, centers, log_sigs, lb, ub, delta, activation_idx,
               basis_func, reg: float = 1e-5, mode: str = "shared",
               chunk: int = 65536, input_scale=None) -> DirectFit:
    """Solve min_W ||G(x) W + b - y||^2 + reg ||W||^2 in closed form.

    Normal equations are accumulated over ``chunk``-row blocks with a
    ``lax.scan`` (streaming: the (N, Kf) design matrix never materializes),
    then solved with one Cholesky of the (Kf+1, Kf+1) system (bias folded in
    as a constant feature).

    ``reg`` is RELATIVE to the mean diagonal of G^T G (gaussian gram
    matrices are catastrophically ill-conditioned; in f32 the Cholesky needs
    reg >= ~1e-5 relative — below that it returns NaN weights).
    """
    with jax.default_matmul_precision("highest"):
        return _fit_direct_impl(x, y, centers, log_sigs, lb, ub, delta,
                                activation_idx, basis_func, reg, mode, chunk,
                                input_scale)


def _fit_direct_impl(x, y, centers, log_sigs, lb, ub, delta, activation_idx,
                     basis_func, reg, mode, chunk, input_scale=None):
    # NOTE: runs under default_matmul_precision("highest") — TPU f32 matmuls
    # otherwise go through the bf16 MXU pass, which destroys the gram
    # matrix's conditioning and NaNs the Cholesky.
    n = x.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    pad = n_pad - n
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    yp = jnp.pad(y, ((0, pad), (0, 0)))
    mask = jnp.pad(jnp.ones((n,), x.dtype), (0, pad))

    feats_fn = partial(rbf_features, centers=centers, log_sigs=log_sigs,
                       lb=lb, ub=ub, delta=delta,
                       activation_idx=activation_idx, basis_func=basis_func,
                       mode=mode, input_scale=input_scale)
    kf = (centers.shape[1] if mode == "shared"
          else centers.shape[0] * centers.shape[1])

    def body(carry, blk):
        gtg, gty = carry
        xb, yb, mb = blk
        g = feats_fn(xb) * mb[:, None]
        g1 = jnp.concatenate([g, mb[:, None]], axis=1)  # bias feature
        gtg = gtg + g1.T @ g1
        gty = gty + g1.T @ (yb * mb[:, None])
        return (gtg, gty), None

    blocks = (xp.reshape(-1, chunk, x.shape[1]),
              yp.reshape(-1, chunk, y.shape[1]),
              mask.reshape(-1, chunk))
    init = (jnp.zeros((kf + 1, kf + 1), x.dtype),
            jnp.zeros((kf + 1, y.shape[1]), x.dtype))
    (gtg, gty), _ = jax.lax.scan(body, init, blocks)

    # Solve the small (Kf+1)^2 normal-equations system on the HOST in f64:
    # gaussian gram matrices are catastrophically ill-conditioned, and the
    # TPU's f32 Cholesky lowering (bf16 matmul passes inside XLA's blocked
    # algorithm) NaNs where CPU f64 sails through. The device does the O(N)
    # accumulation; the host does the O(K^3) solve.
    gtg_h = np.asarray(gtg, dtype=np.float64)
    gty_h = np.asarray(gty, dtype=np.float64)
    # trace-relative ridge: G^T G scales with the row count, so an absolute
    # regularizer vanishes on large tables and the solve goes singular
    reg_eff = reg * np.trace(gtg_h) / (kf + 1)
    A = gtg_h + reg_eff * np.eye(kf + 1)
    wb = jnp.asarray(np.linalg.solve(A, gty_h), dtype=x.dtype)
    scale_t = (None if input_scale is None
               else tuple(float(v) for v in np.asarray(input_scale)))
    return DirectFit(wb[:-1], wb[-1], centers, log_sigs, mode, scale_t)


def data_scale(x, activation_idx=()) -> np.ndarray:
    """Per-dim metric weights 1/std from the data (constant dims -> 1).
    The standard anisotropic-RBF normalization: all input dims contribute
    comparably to kernel distances regardless of their physical units."""
    std = np.asarray(x).std(axis=0)
    return np.where(std > 1e-9, 1.0 / np.maximum(std, 1e-9), 1.0)


def choose_centers(x, num_kernels: int, num_regions: int, seed: int = 0,
                   jitter: float = 1e-3, input_scale=None, lb=None, ub=None,
                   activation_idx=None, width_neighbors: int = 4,
                   width_factor: float = 2.0):
    """Pick per-region centers as a random subset of the rows BELONGING to
    that region (hard box test on the activation dims; global sampling when
    no bounds are given — a region's kernels are wasted if its centers land
    where its indicator is ~0), with per-kernel widths from the distance to
    the ``width_neighbors``-th nearest center of the same region, measured
    in the ``input_scale`` metric (the classical nearest-neighbor width
    recipe; a single region-wide median-pairwise width over-smooths)."""
    rng = np.random.default_rng(seed)
    x_np = np.asarray(x)
    F = x_np.shape[1]
    s = np.ones(F) if input_scale is None else np.asarray(input_scale)
    centers = np.empty((num_regions, num_kernels, F), x_np.dtype)
    for r in range(num_regions):
        pool = x_np
        if lb is not None:
            xa = x_np[:, list(activation_idx)]
            m = np.all((xa >= np.asarray(lb)[r] - 1e-9)
                       & (xa <= np.asarray(ub)[r] + 1e-9), axis=1)
            if m.any():
                pool = x_np[m]
        idx = rng.choice(pool.shape[0], size=num_kernels,
                         replace=pool.shape[0] < num_kernels)
        centers[r] = (pool[idx]
                      + jitter * rng.standard_normal((num_kernels, F)))
    log_sigs = np.zeros((num_regions, num_kernels))
    for r in range(num_regions):
        cs = centers[r] * s
        d = np.linalg.norm(cs[:, None] - cs[None], axis=-1)
        d.sort(axis=1)
        k = min(width_neighbors, d.shape[1] - 1)
        log_sigs[r] = np.log(np.maximum(width_factor * d[:, k], 1e-6))
    return jnp.asarray(centers, x.dtype), jnp.asarray(log_sigs, x.dtype)
