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
from typing import NamedTuple

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

    def predict(self, x, lb, ub, delta, activation_idx, basis_func):
        feats = rbf_features(x, self.centers, self.log_sigs, lb, ub, delta,
                             activation_idx, basis_func, mode=self.mode)
        return feats @ self.weights + self.bias


def rbf_features(x, centers, log_sigs, lb, ub, delta, activation_idx,
                 basis_func, mode: str = "shared"):
    """Region-blended RBF feature map. x (B,F) -> (B, K) or (B, R*K)."""
    gamma = region_activation(x, lb, ub, delta, activation_idx)  # (B, R)
    d = rbf_distances(x, centers, log_sigs)  # (B, R, K)
    phi = basis_func(d)
    if mode == "shared":
        return jnp.einsum("br,brk->bk", gamma, phi)
    weighted = gamma[:, :, None] * phi  # (B, R, K)
    return weighted.reshape(x.shape[0], -1)


def fit_direct(x, y, centers, log_sigs, lb, ub, delta, activation_idx,
               basis_func, reg: float = 1e-5, mode: str = "shared",
               chunk: int = 65536) -> DirectFit:
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
                                activation_idx, basis_func, reg, mode, chunk)


def _fit_direct_impl(x, y, centers, log_sigs, lb, ub, delta, activation_idx,
                     basis_func, reg, mode, chunk):
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
                       mode=mode)
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
    return DirectFit(wb[:-1], wb[-1], centers, log_sigs, mode)


def choose_centers(x, num_kernels: int, num_regions: int, seed: int = 0,
                   jitter: float = 1e-3):
    """Pick per-region centers as a random subset of the data (the classical
    RBF recipe) with widths from the mean nearest-center spacing."""
    rng = np.random.default_rng(seed)
    x_np = np.asarray(x)
    idx = rng.choice(x_np.shape[0], size=(num_regions, num_kernels),
                     replace=x_np.shape[0] < num_regions * num_kernels)
    centers = x_np[idx] + jitter * rng.standard_normal(
        (num_regions, num_kernels, x_np.shape[1]))
    # width: median pairwise center distance per region
    log_sigs = np.zeros((num_regions, num_kernels))
    for r in range(num_regions):
        d = np.linalg.norm(centers[r][:, None] - centers[r][None], axis=-1)
        med = np.median(d[d > 0]) if (d > 0).any() else 1.0
        log_sigs[r] = np.log(max(med, 1e-6))
    return jnp.asarray(centers, x.dtype), jnp.asarray(log_sigs, x.dtype)
