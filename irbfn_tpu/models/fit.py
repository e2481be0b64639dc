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
    """Region-blended RBF feature map. x (B,F) -> (B, K) for ``shared`` or
    (B, R*K + R) for ``per_region`` — matching WCRBFNet's head_mode feature
    layouts exactly (wcrbf.RegionRBFCore), so solved weights load into the
    net's Dense head.

    ``per_region`` uses NORMALIZED region weights (partition of unity) and
    appends the gamma columns themselves (the per-region bias features).

    The region indicator gates on RAW inputs (bounds are in raw units);
    ``input_scale`` only reshapes the RBF distance metric (see
    wcrbf.rbf_distances)."""
    gamma = region_activation(x, lb, ub, delta, activation_idx)  # (B, R)
    if mode == "per_region":
        gamma = gamma / (jnp.sum(gamma, axis=-1, keepdims=True) + 1e-9)
    d = rbf_distances(x, centers, log_sigs, input_scale=input_scale)
    phi = basis_func(d)
    if mode == "shared":
        return jnp.einsum("br,brk->bk", gamma, phi)
    weighted = gamma[:, :, None] * phi  # (B, R, K)
    return jnp.concatenate([weighted.reshape(x.shape[0], -1), gamma], axis=-1)


def fit_direct(x, y, centers, log_sigs, lb, ub, delta, activation_idx,
               basis_func, reg: float = 1e-5, mode: str = "shared",
               chunk: int = 65536, input_scale=None,
               sample_weight=None) -> DirectFit:
    """Solve min_W sum_i w_i ||G(x_i) W + b - y_i||^2 + reg ||W||^2 in
    closed form.

    Normal equations are accumulated over ``chunk``-row blocks with a
    ``lax.scan`` (streaming: the (N, Kf) design matrix never materializes),
    then solved with one Cholesky of the (Kf+1, Kf+1) system (bias folded in
    as a constant feature). ``sample_weight`` (N,) optionally weights rows
    (e.g. tube_weights — fit accuracy concentrated where closed-loop
    operation actually visits).

    ``reg`` is RELATIVE to the mean diagonal of G^T G (gaussian gram
    matrices are catastrophically ill-conditioned; in f32 the Cholesky needs
    reg >= ~1e-5 relative — below that it returns NaN weights).

    NOTE ``mode="per_region"`` here builds the FULL (R*K+R)^2 gram — only
    affordable for small R*K; for real tables use ``fit_per_region``, which
    exploits the block structure at the same cost as a shared fit.
    """
    with jax.default_matmul_precision("highest"):
        return _fit_direct_impl(x, y, centers, log_sigs, lb, ub, delta,
                                activation_idx, basis_func, reg, mode, chunk,
                                input_scale, sample_weight)


def _fit_direct_impl(x, y, centers, log_sigs, lb, ub, delta, activation_idx,
                     basis_func, reg, mode, chunk, input_scale=None,
                     sample_weight=None):
    # NOTE: runs under default_matmul_precision("highest") — TPU f32 matmuls
    # otherwise go through the bf16 MXU pass, which destroys the gram
    # matrix's conditioning and NaNs the Cholesky.
    n = x.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    pad = n_pad - n
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    yp = jnp.pad(y, ((0, pad), (0, 0)))
    w = (jnp.ones((n,), x.dtype) if sample_weight is None
         else jnp.asarray(sample_weight, x.dtype))
    wp = jnp.pad(w, (0, pad))  # padded rows: weight 0

    feats_fn = partial(rbf_features, centers=centers, log_sigs=log_sigs,
                       lb=lb, ub=ub, delta=delta,
                       activation_idx=activation_idx, basis_func=basis_func,
                       mode=mode, input_scale=input_scale)
    kf = (centers.shape[1] if mode == "shared"
          else centers.shape[0] * (centers.shape[1] + 1))

    def body(carry, blk):
        gtg, gty = carry
        xb, yb, wb = blk
        # cast: f64 bounds/delta (x64 test mode) promote the features above
        # the carry dtype, which scan rejects
        g1 = jnp.concatenate(
            [feats_fn(xb), jnp.ones((xb.shape[0], 1), xb.dtype)],
            axis=1).astype(xb.dtype)
        gw = g1 * wb[:, None]
        gtg = gtg + gw.T @ g1
        gty = gty + gw.T @ yb
        return (gtg, gty), None

    blocks = (xp.reshape(-1, chunk, x.shape[1]),
              yp.reshape(-1, chunk, y.shape[1]),
              wp.reshape(-1, chunk))
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


def device_table(x, y=None, chunk: int = 262144):
    """Upload a (large) table to the device ONCE, zero-padded to a multiple
    of ``chunk`` rows. Returns (x_dev, y_dev, n_rows).

    Through a remote-TPU tunnel the host link is the scarce resource: the
    streaming fitters below accept these resident arrays and move only
    int32 row indices per chunk (~1 MB) instead of re-uploading rows
    (~10 MB/chunk, and the per-region fit visits rows ~1.3x)."""
    n = x.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    x_dev = jnp.asarray(np.pad(np.asarray(x, np.float32),
                               ((0, n_pad - n), (0, 0))))
    y_dev = (None if y is None else
             jnp.asarray(np.pad(np.asarray(y, np.float32),
                                ((0, n_pad - n), (0, 0)))))
    return x_dev, y_dev, n


def fit_per_region(x, y, centers, log_sigs, lb, ub, delta, activation_idx,
                   basis_func, reg: float = 1e-5, chunk: int = 65536,
                   input_scale=None, sample_weight=None,
                   margin_steps: float = 2.0, grid_steps=None,
                   x_dev=None, y_dev=None) -> DirectFit:
    """Per-region output heads at shared-fit cost.

    The full ``mode="per_region"`` normal equations are (R*K+R)^2 — R^2 x
    the shared fit's FLOPs, intractable for real tables (R=16, K=512 ->
    8e17 flops). But the block structure makes them unnecessary: region r's
    normalized weight is ~0 outside its (overlapped) box, so the gram's
    cross-region blocks vanish and the problem decouples into R independent
    weighted least squares, each over only the rows NEAR region r:

        min_{W_r,b_r} sum_i w_i gamma_n_ri || phi_r(x_i) W_r + b_r - y_i ||^2

    (the standard local-model / Takagi-Sugeno fit). The blended prediction
    sum_r gamma_n_r (phi_r W_r + b_r) is exactly ``rbf_features
    (mode="per_region") @ W``, so the result loads into a
    ``WCRBFNet(head_mode="per_region")`` Dense head.

    Row selection per region is a HOST-side box test (lattice inputs, no
    device fetch): rows within ``margin_steps`` grid steps of the region box
    (the tanh gate's tail width; ``grid_steps`` (D,) defaults to
    4/delta ~ one grid step). Total work ~= overlap_factor * N * K^2 — the
    same order as one shared fit.

    Pass ``x_dev``/``y_dev`` from ``device_table`` for large tables behind
    a slow host link: only int32 index chunks cross the link (rows are
    gathered device-side); otherwise rows upload per chunk.
    """
    x_np = np.asarray(x)
    y_np = np.asarray(y)
    lb_np, ub_np = np.asarray(lb), np.asarray(ub)
    R, K, F = centers.shape
    O = y_np.shape[1]
    act = list(activation_idx)
    if grid_steps is None:
        grid_steps = 4.0 / np.asarray(delta, np.float64)
    margin = margin_steps * np.asarray(grid_steps)
    sw_np = (None if sample_weight is None
             else np.asarray(sample_weight, np.float32))
    resident = x_dev is not None
    w_dev = None
    if resident:
        assert y_dev is not None
        if sw_np is not None:
            w_dev = jnp.asarray(np.pad(sw_np, (0, x_dev.shape[0] - len(sw_np))))

    lb_d, ub_d = jnp.asarray(lb_np), jnp.asarray(ub_np)
    delta_d = jnp.asarray(delta)
    act_t = tuple(act)

    centers_d, log_sigs_d = jnp.asarray(centers), jnp.asarray(log_sigs)

    def gram(xs, ys, ws, r):
        # weighted gram for one region: A = P^T diag(w) P with
        # P = [phi_r, 1]; w = gamma_n_r * sample_weight. ``r`` is a TRACED
        # index (dynamic gather of the region's center bank) so ONE compile
        # covers all R regions — a static r embeds region-sliced constants
        # and recompiles per region (~minutes each through a remote tunnel).
        with jax.default_matmul_precision("highest"):
            gamma = region_activation(xs, lb_d, ub_d, delta_d, act_t)
            gamma = gamma / (jnp.sum(gamma, axis=-1, keepdims=True) + 1e-9)
            c_r = jax.lax.dynamic_index_in_dim(centers_d, r, keepdims=True)
            ls_r = jax.lax.dynamic_index_in_dim(log_sigs_d, r, keepdims=True)
            d = rbf_distances(xs, c_r, ls_r,
                              input_scale=input_scale)  # (B, 1, K)
            p1 = jnp.concatenate(
                [basis_func(d[:, 0, :]),
                 jnp.ones((xs.shape[0], 1), xs.dtype)], axis=1)
            w = (jnp.take(gamma, r, axis=1) * ws).astype(xs.dtype)
            pw = p1 * w[:, None]
            return (pw.T @ p1).astype(jnp.float32), (pw.T @ ys).astype(jnp.float32)

    @jax.jit
    def accumulate(xs, ys, ws, r):
        return gram(xs, ys, ws, r)

    # big arrays as explicit jit args, not closure constants (see
    # tube_weights note)
    @partial(jax.jit, static_argnames=("has_w",))
    def accumulate_gathered(xd, yd, wd, idx, r, has_w):
        # device-side row gather: idx (chunk,) int32, -1 = padding.
        # Returns the CHUNK's gram (fetched and accumulated in f64 on the
        # host, matching the non-resident path — cross-chunk f32
        # accumulation on device loses the gram's small eigenvalues).
        safe = jnp.maximum(idx, 0)
        xs = xd[safe]
        ys = yd[safe]
        ws = wd[safe] if has_w else jnp.ones((idx.shape[0],), xs.dtype)
        ws = jnp.where(idx >= 0, ws, 0.0)
        return gram(xs, ys, ws, r)

    weights = np.zeros((R * K + R, O), np.float32)
    xa = x_np[:, act]
    if resident and w_dev is None:
        w_dev_or_dummy = jnp.ones((x_dev.shape[0],), jnp.float32)
    else:
        w_dev_or_dummy = w_dev
    for r in range(R):
        m = np.all((xa >= lb_np[r] - margin) & (xa <= ub_np[r] + margin),
                   axis=1)
        A = np.zeros((K + 1, K + 1), np.float64)
        b = np.zeros((K + 1, O), np.float64)
        r_d = jnp.asarray(r, jnp.int32)
        if resident:
            idx_all = np.nonzero(m)[0].astype(np.int32)
            n_pad = ((len(idx_all) + chunk - 1) // chunk) * chunk
            idx_all = np.pad(idx_all, (0, n_pad - len(idx_all)),
                             constant_values=-1)
            for i0 in range(0, len(idx_all), chunk):
                Ab, bb = accumulate_gathered(
                    x_dev, y_dev, w_dev_or_dummy,
                    jnp.asarray(idx_all[i0:i0 + chunk]), r_d,
                    w_dev is not None)
                A += np.asarray(Ab, np.float64)
                b += np.asarray(bb, np.float64)
        else:
            xs_r, ys_r = x_np[m], y_np[m]
            ws_r = (np.ones(xs_r.shape[0], np.float32) if sw_np is None
                    else sw_np[m])
            # pad the tail chunk so every dispatch shares one compiled shape
            n_r = xs_r.shape[0]
            n_pad_r = ((n_r + chunk - 1) // chunk) * chunk
            xs_r = np.pad(xs_r, ((0, n_pad_r - n_r), (0, 0)))
            ys_r = np.pad(ys_r, ((0, n_pad_r - n_r), (0, 0)))
            ws_r = np.pad(ws_r, (0, n_pad_r - n_r))  # pad rows: weight 0
            for i0 in range(0, n_pad_r, chunk):
                Ab, bb = accumulate(jnp.asarray(xs_r[i0:i0 + chunk]),
                                    jnp.asarray(ys_r[i0:i0 + chunk]),
                                    jnp.asarray(ws_r[i0:i0 + chunk]), r_d)
                A += np.asarray(Ab, np.float64)
                b += np.asarray(bb, np.float64)
        # host f64 solve with trace-relative ridge (see _fit_direct_impl)
        reg_eff = reg * np.trace(A) / (K + 1)
        sol = np.linalg.solve(A + reg_eff * np.eye(K + 1), b)
        weights[r * K:(r + 1) * K] = sol[:-1]
        weights[R * K + r] = sol[-1]
        if resident:
            print(f"fit_per_region: region {r + 1}/{R} "
                  f"({int(m.sum()):,} rows)", flush=True)

    scale_t = (None if input_scale is None
               else tuple(float(v) for v in np.asarray(input_scale)))
    return DirectFit(jnp.asarray(weights), jnp.zeros((O,), jnp.float32),
                     centers, log_sigs, "per_region", scale_t)


def tube_weights(x, tube, input_scale=None, bandwidth: float = 1.0,
                 floor: float = 0.05, chunk: int = 262144,
                 max_tube: int = 2048, seed: int = 0,
                 x_dev=None) -> np.ndarray:
    """Row weights from proximity to the closed-loop operating tube.

    ``tube`` (M, F) are net-input states visited by a planner that already
    laps (e.g. NMPC closed loop on the target track). Each table row gets

        w_i = floor + (1 - floor) * exp(-0.5 * d_i^2 / bandwidth^2)

    with d_i the distance from row i to the NEAREST tube state in the
    ``input_scale`` metric (proximity to the tube manifold — deliberately
    not a density: how often the tube visits a neighborhood shouldn't down-
    weight rarely-visited but critical states like the braking wall entry).
    ``floor`` keeps off-tube rows in the fit so the model still degrades
    gracefully off-raceline. Distances ride the MXU ((chunk, M) matmul);
    weights return as host numpy for center sampling / row gathers.
    Pass ``x_dev`` (device_table) to keep the table device-resident —
    only the (chunk,) result crosses the host link per chunk."""
    tube = np.asarray(tube, np.float32)
    if tube.shape[0] > max_tube:
        rng = np.random.default_rng(seed)
        tube = tube[rng.choice(tube.shape[0], max_tube, replace=False)]
    s = (np.ones(tube.shape[1], np.float32) if input_scale is None
         else np.asarray(input_scale, np.float32))
    t_d = jnp.asarray(tube * s)

    s_d = jnp.asarray(s)

    # NOTE: the big arrays are explicit jit ARGUMENTS, never closure
    # captures — a closed-over concrete array becomes a jaxpr constant,
    # which for a GB-scale table is pathological (embedded in the program
    # instead of referenced as a device buffer).
    def min_d2(xc, t, sc):
        xs = xc * sc
        d2 = (jnp.sum(xs * xs, -1, keepdims=True)
              - 2.0 * xs @ t.T + jnp.sum(t * t, -1))
        return jnp.min(d2, axis=-1)

    n = np.asarray(x).shape[0]
    out = np.empty(n, np.float32)
    if x_dev is not None:
        @partial(jax.jit, static_argnames=("c",))
        def sliced(xd, t, sc, i0, c):
            return min_d2(jax.lax.dynamic_slice_in_dim(xd, i0, c), t, sc)

        import time

        t0 = time.time()
        nd = x_dev.shape[0]
        n_chunks = -(-nd // chunk)
        for ci, i0 in enumerate(range(0, nd, chunk)):
            # dynamic_slice clamps the start index, so the tail window is
            # [nd - chunk, nd): index the wanted rows at their offset
            # within the clamped window instead of assuming offset 0
            start = min(i0, max(nd - chunk, 0))
            res = np.asarray(sliced(x_dev, t_d, s_d,
                                    jnp.asarray(start, jnp.int32), chunk))
            stop = min(i0 + chunk, n)
            out[i0:stop] = res[i0 - start:i0 - start + (stop - i0)]
            if ci == 0:
                print(f"tube_weights: {n_chunks} chunks, first in "
                      f"{time.time() - t0:.1f}s (incl. compile)", flush=True)
    else:
        x_np = np.asarray(x, np.float32)
        jit_min_d2 = jax.jit(min_d2)
        for i0 in range(0, n, chunk):
            out[i0:i0 + chunk] = np.asarray(
                jit_min_d2(jnp.asarray(x_np[i0:i0 + chunk]), t_d, s_d))
    return (floor + (1.0 - floor)
            * np.exp(-0.5 * np.maximum(out, 0.0) / bandwidth**2))


def data_scale(x, activation_idx=()) -> np.ndarray:
    """Per-dim metric weights 1/std from the data (constant dims -> 1).
    The standard anisotropic-RBF normalization: all input dims contribute
    comparably to kernel distances regardless of their physical units."""
    std = np.asarray(x).std(axis=0)
    return np.where(std > 1e-9, 1.0 / np.maximum(std, 1e-9), 1.0)


def choose_centers(x, num_kernels: int, num_regions: int, seed: int = 0,
                   jitter: float = 1e-3, input_scale=None, lb=None, ub=None,
                   activation_idx=None, width_neighbors: int = 4,
                   width_factor: float = 2.0, probs=None):
    """Pick per-region centers as a random subset of the rows BELONGING to
    that region (hard box test on the activation dims; global sampling when
    no bounds are given — a region's kernels are wasted if its centers land
    where its indicator is ~0), with per-kernel widths from the distance to
    the ``width_neighbors``-th nearest center of the same region, measured
    in the ``input_scale`` metric (the classical nearest-neighbor width
    recipe; a single region-wide median-pairwise width over-smooths).

    ``probs`` (N,) optionally biases the sampling (importance sampling,
    e.g. tube_weights): regions spend their kernel budget where the fit is
    weighted — on a lattice table, uniform sampling puts only ~2 kernels
    near any given operating neighborhood."""
    rng = np.random.default_rng(seed)
    x_np = np.asarray(x)
    F = x_np.shape[1]
    s = np.ones(F) if input_scale is None else np.asarray(input_scale)
    p_all = None if probs is None else np.asarray(probs, np.float64)
    centers = np.empty((num_regions, num_kernels, F), x_np.dtype)
    for r in range(num_regions):
        pool, p_pool = x_np, p_all
        if lb is not None:
            xa = x_np[:, list(activation_idx)]
            m = np.all((xa >= np.asarray(lb)[r] - 1e-9)
                       & (xa <= np.asarray(ub)[r] + 1e-9), axis=1)
            if m.any():
                pool = x_np[m]
                p_pool = None if p_all is None else p_all[m]
        n_pool = pool.shape[0]
        if n_pool < num_kernels:
            idx = rng.choice(n_pool, size=num_kernels, replace=True,
                             p=None if p_pool is None
                             else p_pool / p_pool.sum())
        elif p_pool is None:
            idx = rng.choice(n_pool, size=num_kernels, replace=False)
        else:
            # Gumbel-top-k = weighted sampling WITHOUT replacement in O(N).
            # numpy's choice(replace=False, p=...) is O(size*N) iterative
            # renormalization — ~minutes/region on a 20M-row table.
            g = np.log(np.maximum(p_pool, 1e-300)) + rng.gumbel(size=n_pool)
            idx = np.argpartition(g, n_pool - num_kernels)[-num_kernels:]
        centers[r] = (pool[idx]
                      + jitter * rng.standard_normal((num_kernels, F)))
    log_sigs = widths_from_centers(centers, input_scale=input_scale,
                                   width_neighbors=width_neighbors,
                                   width_factor=width_factor)
    return jnp.asarray(centers, x.dtype), jnp.asarray(log_sigs, x.dtype)


def widths_from_centers(centers, input_scale=None, width_neighbors: int = 4,
                        width_factor: float = 2.0) -> np.ndarray:
    """Nearest-neighbor RBF widths for GIVEN (R, K, F) centers — the same
    recipe ``choose_centers`` applies to sampled ones. Used for externally
    supplied center banks (e.g. constraint-cluster warm starts,
    nmpc_constraint_regions.ipynb -> irbfn_planner.py:258-261)."""
    centers = np.asarray(centers)
    R, K, F = centers.shape
    s = np.ones(F) if input_scale is None else np.asarray(input_scale)
    log_sigs = np.zeros((R, K))
    for r in range(R):
        cs = centers[r] * s
        d = np.linalg.norm(cs[:, None] - cs[None], axis=-1)
        d.sort(axis=1)
        k = min(width_neighbors, d.shape[1] - 1)
        log_sigs[r] = np.log(np.maximum(width_factor * d[:, k], 1e-6))
    return log_sigs
