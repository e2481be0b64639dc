"""Pallas fused RBF kernel vs the flax reference implementation.

Runs in interpreter mode on CPU (compiled mode exercises the same code path
on TPU; the driver's bench runs it compiled).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irbfn_tpu.models import WCRBFNet, get_basis
from irbfn_tpu.ops.pallas_rbf import wcrbf_forward_pallas, wcrbf_params_to_pallas


@pytest.fixture(scope="module")
def net_and_params():
    model = WCRBFNet(
        in_features=8, out_features=10, num_kernels=32,
        basis_func=get_basis("gaussian"), num_regions=4,
        lower_bounds=[[-2.0, 0.0], [1.0, 4.0]],
        upper_bounds=[[0.0, 2.0], [4.0, 7.0]],
        dimension_ranges=[[0, 0], [0, 1], [1, 0], [1, 1]],
        activation_idx=[0, 2], delta=[15.0, 100.0])
    params = model.init(jax.random.PRNGKey(3), jnp.ones((1, 8)))
    return model, params


def test_pallas_matches_flax(net_and_params):
    model, params = net_and_params
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(100, 8)), jnp.float32)
    ref = model.apply(params, x)
    ops = wcrbf_params_to_pallas(params, model)
    out = wcrbf_forward_pallas(x, *ops, basis_fn=get_basis("gaussian"),
                               tile_b=64, interpret=True)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_pallas_batch_padding(net_and_params):
    """Non-multiple-of-tile batch sizes pad and unpad correctly."""
    model, params = net_and_params
    rng = np.random.default_rng(1)
    ops = wcrbf_params_to_pallas(params, model)
    for B in (1, 7, 65):
        x = jnp.asarray(rng.normal(size=(B, 8)), jnp.float32)
        ref = model.apply(params, x)
        out = wcrbf_forward_pallas(x, *ops, basis_fn=get_basis("gaussian"),
                                   tile_b=64, interpret=True)
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_pallas_matches_flax_per_region_head():
    """Per-region heads (head_mode='per_region'): the fused kernel's
    in-loop per-region matmuls + normalized gamma match the flax path."""
    model = WCRBFNet(
        in_features=8, out_features=10, num_kernels=32,
        basis_func=get_basis("gaussian"), num_regions=4,
        lower_bounds=[[-2.0, 0.0], [1.0, 4.0]],
        upper_bounds=[[0.0, 2.0], [4.0, 7.0]],
        dimension_ranges=[[0, 0], [0, 1], [1, 0], [1, 1]],
        activation_idx=[0, 2], delta=[15.0, 100.0],
        input_scale=(1.0, 0.5, 1.0, 2.0, 1.0, 1.0, 1.0, 1.0),
        head_mode="per_region")
    params = model.init(jax.random.PRNGKey(5), jnp.ones((1, 8)))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(100, 8)), jnp.float32)
    ref = model.apply(params, x)
    ops = wcrbf_params_to_pallas(params, model)
    scale = jnp.asarray(model.input_scale, jnp.float32)
    out = wcrbf_forward_pallas(x * scale, *ops,
                               basis_fn=get_basis("gaussian"),
                               tile_b=64, interpret=True)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_distance_cancellation_regime():
    """Distances on data with a LARGE offset mean (||x|| >> ||x - c||): the
    regime where the naive x^2 - 2xc + c^2 matmul form cancels
    catastrophically in f32. Both serving paths — flax ``rbf_distances``
    (direct form) and the Pallas kernel (mean-shifted matmul) — must stay
    within ~1e-5 relative of an f64 reference here; the unshifted matmul
    form errs ~1e-2 and silently corrupts direct-fit nets at serve time."""
    rng = np.random.default_rng(7)
    R, K, F, B = 2, 16, 8, 64
    mean = 100.0 * rng.normal(size=(F,))
    c = (mean[None, None] + 0.1 * rng.normal(size=(R, K, F))).astype(np.float32)
    x = (mean[None] + 0.1 * rng.normal(size=(B, F))).astype(np.float32)
    log_sigs = np.zeros((R, K), np.float32)

    d_ref = np.sqrt(((x.astype(np.float64)[:, None, None]
                      - c.astype(np.float64)[None]) ** 2).sum(-1))

    from irbfn_tpu.models.wcrbf import rbf_distances
    d_xla = np.asarray(rbf_distances(jnp.asarray(x), jnp.asarray(c),
                                     jnp.asarray(log_sigs)))
    np.testing.assert_allclose(d_xla, d_ref, rtol=2e-5)

    # pallas path: gaussian phi = exp(-d^2) with unit sigs; single region
    # gate covering everything isolates the distance computation
    model = WCRBFNet(
        in_features=F, out_features=K, num_kernels=K,
        basis_func=get_basis("gaussian"), num_regions=R,
        lower_bounds=[[-1e30]], upper_bounds=[[1e30]],
        dimension_ranges=[[0, 0], [0, 0]],
        activation_idx=[0], delta=[1.0])
    params = {"params": {
        "core": {"centers": jnp.asarray(c), "log_sigs": jnp.asarray(log_sigs)},
        "head": {"kernel": jnp.eye(K, dtype=jnp.float32),
                 "bias": jnp.zeros((K,), jnp.float32)}}}
    ops = wcrbf_params_to_pallas(params, model)
    out = wcrbf_forward_pallas(jnp.asarray(x), *ops,
                               basis_fn=get_basis("gaussian"),
                               tile_b=64, interpret=True)
    # out = sum_r gamma_r exp(-d_r^2) @ I = 2 * exp(-d^2) summed over the two
    # identical-gate regions' phis -> compare against the f64 blend
    gref = np.exp(-d_ref ** 2).sum(1)
    np.testing.assert_allclose(np.asarray(out), gref, rtol=2e-4, atol=1e-6)
