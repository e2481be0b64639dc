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
