"""Pallas TPU kernel: fused region-blended RBF forward pass.

The WCRBF forward pass (reference model.py:169-198 semantics) is, per batch
row: region indicator -> per-region RBF features -> gamma-weighted region sum
-> linear head.  XLA's fusion already does well here; this kernel goes
further by keeping the entire (TILE_B, R, K) intermediate in VMEM — the
(B, R, K) basis tensor never exists in HBM:

  wrapper (plain XLA): gamma = prod_d box indicators   (B, R)
  for each batch tile (grid dim 0):
      load x tile (TILE_B, F), gamma tile (TILE_B, R)  [VMEM]
      for r in regions:                 (statically unrolled)
          # x, C pre-shifted by the global center mean (wrapper)
          d2   = ||x||^2 - 2 x C_r^T + ||C_r||^2     <- MXU matmul
          feat += gamma[:, r] * basis(sqrt(d2)/sig_r)
      out = feat @ W + b                               <- MXU matmul

Layout notes: K and O are padded to lane width (128) by the caller wrapper;
TILE_B is a multiple of 8 (f32 sublane).  The basis function is traced into
the kernel body (elementwise, VPU).

Hardware-validated on TPU v5e (max err 1e-10 vs the flax path). Three
compiled-mode constraints interpret mode does NOT catch, baked into the
structure above: Mosaic has no reduce_prod lowering (indicator product moved
to the wrapper), no dynamic_slice for traced ref indices (region loop is
statically unrolled), and rank-3 broadcast intermediates inside the kernel
blow the 16MB scoped-VMEM stack (another reason gamma lives outside).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _rbf_kernel(x_ref, gamma_ref, centers_ref, csq_ref,
                inv_sigs_ref, w_ref, b_ref,
                out_ref, *, basis_fn, num_regions, per_region):
    """Kernel body: per-region RBF features, gamma-blended, linear head(s).

    The smooth region indicator gamma arrives precomputed (cheap elementwise
    work the surrounding XLA fuses anyway; NORMALIZED by the wrapper for
    per-region heads); keeping its rank-3 gate tensors out of the kernel
    keeps the Mosaic scoped-VMEM stack small. What stays in VMEM is the
    expensive part: the (TB, R, K) basis intermediate.

    ``per_region``: w_ref is (R, Kp, Op) / b_ref (Rp, Op) and the head
    matmul moves inside the region loop — out = sum_r gamma_r (phi_r W_r +
    b_r), the WCRBFNet(head_mode="per_region") forward.
    """
    x = x_ref[:]  # (TB, F), pre-shifted by the global center mean
    gamma = gamma_ref[:]  # (TB, R)
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)  # (TB, 1)

    # statically unrolled region loop: Mosaic has no dynamic_slice lowering
    # for ref indexing by a traced fori index, and num_regions is a static
    # kernel parameter anyway
    acc = jnp.zeros((x.shape[0], out_ref.shape[1]), jnp.float32)
    feat = jnp.zeros((x.shape[0], w_ref.shape[-2]), jnp.float32)
    for r in range(num_regions):
        c = centers_ref[r]  # (K, F), pre-shifted by the global center mean
        inv_sig = inv_sigs_ref[r]  # (K,)
        # MEAN-SHIFTED matmul form: both x and c arrive shifted by the
        # GLOBAL center mean (wrapper), so d^2 = ||x||^2 - 2 x c^T + ||c||^2
        # has every term O(data spread^2), not O(raw magnitude^2). The
        # unshifted form cancels catastrophically when ||x - c|| << ||x||
        # (direct-fit weight banks amplify d^2 error ~1e4x into the outputs,
        # see models/wcrbf.py:rbf_distances); the shifted HIGHEST MXU matmul
        # is near-exact and ~2x faster than the exact VPU direct form
        # (feature-unrolled broadcast subtract starves the VPU at K=512).
        # (HIGHEST is the only elevated dot precision Mosaic lowers —
        # Precision.HIGH raises NotImplementedError in the TPU backend)
        cross = jnp.dot(x, c.T, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        d2 = x_sq - 2.0 * cross + csq_ref[r][None, :]
        d = jnp.sqrt(jnp.maximum(d2, 1e-30))
        phi = basis_fn(d * inv_sig[None, :])  # (TB, K)
        gphi = gamma[:, r][:, None] * phi
        if per_region:
            acc = acc + jnp.dot(gphi, w_ref[r],
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
            acc = acc + gamma[:, r][:, None] * b_ref[r][None, :]
        else:
            feat = feat + gphi

    if per_region:
        out_ref[:] = acc
    else:
        out_ref[:] = jnp.dot(feat, w_ref[:],
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32) + b_ref[:]


@functools.partial(jax.jit, static_argnames=("basis_fn", "tile_b", "interpret"))
def wcrbf_forward_pallas(x, centers, log_sigs, lb, ub, delta, w, b,
                         basis_fn, tile_b: int = 128,
                         interpret: bool = False):
    """Fused WCRBF forward pass.

    Args:
        x: (B, F) inputs
        centers: (R, K, F); log_sigs: (R, K)
        lb/ub: (R, D) region bounds over the activation dims; delta: (D,)
        w: (K, O) shared head weights, or (R, K, O) per-region heads
        b: (O,) shared bias, or (R, O) per-region biases
    Returns:
        (B, O) outputs (f32)

    The wrapper pads B to tile_b, K/O to 128 lanes, and embeds the activation
    dims into full feature width with +-inf bounds on non-split dims so the
    kernel's indicator product is exact. A rank-3 ``w`` selects the
    per-region-head forward (WCRBFNet head_mode="per_region"): gamma is
    normalized to a partition of unity and each region applies its own
    (K, O) head + (O,) bias inside the fused loop.
    """
    B, F = x.shape
    R, K, _ = centers.shape
    per_region = w.ndim == 3
    O = w.shape[-1]
    Kp = _round_up(K, 128)
    Op = _round_up(O, 128)
    Fp = _round_up(F, 128)
    Bp = _round_up(B, tile_b)

    Rp = _round_up(R, 8)  # sublane padding for the (TB, R) gamma block

    f32 = jnp.float32
    # global center-mean shift (see _rbf_kernel): x and centers both arrive
    # shifted, so the kernel's matmul-form d^2 never cancels on the data's
    # offset means. One subtraction each, done here where XLA fuses it.
    mean = jnp.mean(centers.astype(f32), axis=(0, 1))  # (F,)
    c_sh = centers.astype(f32) - mean[None, None, :]
    xp = jnp.zeros((Bp, Fp), f32).at[:B, :F].set(x.astype(f32) - mean[None, :])
    cp = jnp.zeros((R, Kp, Fp), f32).at[:, :K, :F].set(c_sh)
    csq = jnp.zeros((R, Kp), f32).at[:, :K].set(jnp.sum(c_sh * c_sh, axis=-1))
    # padded kernels: keep centers 0 but give them huge distance via sig so
    # phi(pad) contributes ~0 for decaying bases; safer: zero head weights
    inv_s = jnp.zeros((R, Kp), f32).at[:, :K].set(
        jnp.exp(-log_sigs).astype(f32))
    if per_region:
        wp = jnp.zeros((R, Kp, Op), f32).at[:, :K, :O].set(w.astype(f32))
        bp = jnp.zeros((Rp, Op), f32).at[:R, :O].set(b.astype(f32))
        w_spec = pl.BlockSpec((R, Kp, Op), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec((Rp, Op), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    else:
        wp = jnp.zeros((Kp, Op), f32).at[:K, :O].set(w.astype(f32))
        bp = jnp.zeros((1, Op), f32).at[0, :O].set(b.astype(f32))
        w_spec = pl.BlockSpec((Kp, Op), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec((1, Op), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)

    # region indicator in plain XLA (cheap elementwise; fuses with the pad)
    lo = 0.5 * (jnp.tanh(delta[None, None] * (x[:, None, :lb.shape[1]]
                                              - lb[None])) + 1.0)
    hi = 0.5 * (jnp.tanh(delta[None, None] * (ub[None]
                                              - x[:, None, :ub.shape[1]])) + 1.0)
    gamma = jnp.prod(lo * hi, axis=-1)  # (B, R)
    if per_region:
        gamma = gamma / (jnp.sum(gamma, axis=-1, keepdims=True) + 1e-9)
    gp = jnp.zeros((Bp, Rp), f32).at[:B, :R].set(gamma.astype(f32))

    kernel = functools.partial(_rbf_kernel, basis_fn=basis_fn, num_regions=R,
                               per_region=per_region)
    grid = (Bp // tile_b,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, Fp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # x tile
            pl.BlockSpec((tile_b, Rp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # gamma tile
            pl.BlockSpec((R, Kp, Fp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # shifted centers
            pl.BlockSpec((R, Kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # ||c - mean||^2
            pl.BlockSpec((R, Kp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            w_spec,
            b_spec,
        ],
        out_specs=pl.BlockSpec((tile_b, Op), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Op), f32),
        interpret=interpret,
    )(xp, gp, cp, csq, inv_s, wp, bp)
    return out[:B, :O]


def wcrbf_params_to_pallas(variables, model):
    """Extract the pallas-kernel operand set from a WCRBFNet variables tree."""
    from irbfn_tpu.models.wcrbf import build_region_bounds

    col = variables.get("params", variables)
    core = col["core"] if "core" in col else variables["constants"]["core"]
    centers = core.get("centers",
                       variables.get("constants", {}).get("core", {}).get("centers"))
    log_sigs = core.get("log_sigs",
                        variables.get("constants", {}).get("core", {}).get("log_sigs"))
    head = col["head"]
    lb, ub = build_region_bounds(model.lower_bounds, model.upper_bounds,
                                 model.dimension_ranges, model.activation_idx)
    # embed activation-dim bounds into full feature width
    F = model.in_features
    lb_full = np.full((model.num_regions, F), -1e30)
    ub_full = np.full((model.num_regions, F), 1e30)
    delta_full = np.ones((F,))  # non-split dims: gate==1 via +-inf bounds
    for j, d in enumerate(model.activation_idx):
        lb_full[:, d] = lb[:, j]
        ub_full[:, d] = ub[:, j]
        delta_full[d] = np.asarray(model.delta)[j]
    centers = np.asarray(centers)
    if getattr(model, "input_scale", None) is not None:
        # anisotropic metric folded into the operands: the kernel runs on
        # s*x with s*centers / s*bounds / delta/s — identical function to
        # the flax path's rbf_distances(input_scale=...) (callers must feed
        # pre-scaled x; _make_apply does)
        s = np.asarray(model.input_scale, np.float64)
        centers = centers * s
        lb_full = lb_full * s
        ub_full = ub_full * s
        delta_full = delta_full / s
    w = np.asarray(head["kernel"])
    b = np.asarray(head["bias"])
    if getattr(model, "head_mode", "shared") == "per_region":
        # (R*K + R, O) Dense kernel -> per-region (R, K, O) heads + (R, O)
        # biases; the global Dense bias folds into every region's bias
        # because the normalized gammas sum to 1
        R, K = model.num_regions, model.num_kernels
        w, b = w[:R * K].reshape(R, K, -1), w[R * K:] + b[None]
    return (jnp.asarray(centers), jnp.asarray(log_sigs),
            jnp.asarray(lb_full), jnp.asarray(ub_full),
            jnp.asarray(delta_full), jnp.asarray(w), jnp.asarray(b))
