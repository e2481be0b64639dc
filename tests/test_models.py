"""Model-layer tests: kernels, region activation, WCRBF family.

Includes a cross-check of the MXU matmul distance formulation against the
naive broadcast form (the reference flax_rbf computation), and golden
behavioral checks of the region indicator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from irbfn_tpu.models import (
    BASIS_FUNCTIONS,
    ClusterWCRBFNet,
    DeeperWCRBFNet,
    MLP,
    WCRBFNet,
    from_config,
    get_basis,
    rbf_distances,
    region_activation,
    build_region_bounds,
)


def test_kernel_registry_roundtrip():
    assert len(BASIS_FUNCTIONS) == 15
    for name, fn in BASIS_FUNCTIONS.items():
        assert get_basis(name) is fn
    assert get_basis(BASIS_FUNCTIONS["gaussian"]) is BASIS_FUNCTIONS["gaussian"]
    with pytest.raises(KeyError):
        get_basis("not_a_kernel")


def test_kernel_values():
    a = jnp.asarray(2.0)
    np.testing.assert_allclose(BASIS_FUNCTIONS["gaussian"](a), np.exp(-4.0))
    np.testing.assert_allclose(BASIS_FUNCTIONS["gaussian_wide"](a), np.exp(-0.4))
    np.testing.assert_allclose(BASIS_FUNCTIONS["inverse_quadratic"](a), 0.2)
    np.testing.assert_allclose(BASIS_FUNCTIONS["multiquadric"](a), np.sqrt(5.0))
    np.testing.assert_allclose(BASIS_FUNCTIONS["linear"](a), 2.0)


def test_rbf_distances_matches_naive():
    """Matmul form == broadcast form (reference flax_rbf.py:275-280)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 8)))
    centers = jnp.asarray(rng.normal(size=(4, 16, 8)))
    log_sigs = jnp.asarray(rng.normal(size=(4, 16)) * 0.3)
    d = rbf_distances(x, centers, log_sigs)
    naive = (np.linalg.norm(
        np.asarray(x)[:, None, None, :] - np.asarray(centers)[None], axis=-1)
        / np.exp(np.asarray(log_sigs))[None])
    np.testing.assert_allclose(d, naive, rtol=1e-8, atol=1e-10)


def _two_region_spec():
    """1 split dim with 2 segments: x0 in [-1,0] | [0,1]."""
    lower_bounds = [[-1.0, 0.0]]
    upper_bounds = [[0.0, 1.0]]
    dimension_ranges = [[0], [1]]
    activation_idx = [0]
    delta = [25.0]
    return lower_bounds, upper_bounds, dimension_ranges, activation_idx, delta


def test_region_activation_partition():
    lb_l, ub_l, dr, ai, delta = _two_region_spec()
    lb, ub = build_region_bounds(lb_l, ub_l, dr, ai)
    x = jnp.asarray([[-0.5, 9.9], [0.5, -3.0]])
    gamma = region_activation(x, jnp.asarray(lb), jnp.asarray(ub),
                              jnp.asarray(delta), tuple(ai))
    assert gamma.shape == (2, 2)
    # deep inside region 0 / region 1 respectively
    assert float(gamma[0, 0]) > 0.99 and float(gamma[0, 1]) < 0.01
    assert float(gamma[1, 1]) > 0.99 and float(gamma[1, 0]) < 0.01
    # at the shared boundary both indicators are ~0.5 -> smooth interpolation
    g_mid = region_activation(jnp.asarray([[0.0, 0.0]]), jnp.asarray(lb),
                              jnp.asarray(ub), jnp.asarray(delta), tuple(ai))
    np.testing.assert_allclose(g_mid[0], [0.5, 0.5], atol=0.01)


@pytest.fixture
def small_net():
    lb, ub, dr, ai, delta = _two_region_spec()
    return WCRBFNet(
        in_features=2, out_features=3, num_kernels=8,
        basis_func=get_basis("gaussian"), num_regions=2,
        lower_bounds=lb, upper_bounds=ub, dimension_ranges=dr,
        activation_idx=ai, delta=delta)


def test_wcrbf_forward_shapes(small_net):
    params = small_net.init(jax.random.PRNGKey(0), jnp.ones((4, 2)))
    y = small_net.apply(params, jnp.zeros((4, 2)))
    assert y.shape == (4, 3)
    # parameter shapes: one dense tensor across regions
    core = params["params"]["core"]
    assert core["centers"].shape == (2, 8, 2)
    assert core["log_sigs"].shape == (2, 8)


def test_wcrbf_region_locality(small_net):
    """Perturbing region-1 centers must not change outputs deep in region 0."""
    params = small_net.init(jax.random.PRNGKey(0), jnp.ones((1, 2)))
    x0 = jnp.asarray([[-0.7, 0.3]])  # deep in region 0
    y0 = small_net.apply(params, x0)
    p2 = jax.tree.map(lambda a: a, params)
    centers = p2["params"]["core"]["centers"]
    p2["params"]["core"]["centers"] = centers.at[1].add(5.0)
    y1 = small_net.apply(p2, x0)
    np.testing.assert_allclose(y0, y1, atol=1e-6)


def test_wcrbf_fixed_centers_not_trained():
    lb, ub, dr, ai, delta = _two_region_spec()
    centers0 = np.random.default_rng(3).normal(size=(8, 2))
    net = WCRBFNet(
        in_features=2, out_features=1, num_kernels=8,
        basis_func=get_basis("gaussian"), num_regions=2,
        lower_bounds=lb, upper_bounds=ub, dimension_ranges=dr,
        activation_idx=ai, delta=delta, centers=centers0, fixed_centers=True)
    variables = net.init(jax.random.PRNGKey(0), jnp.ones((1, 2)))
    assert "centers" not in variables["params"].get("core", {})
    assert "centers" in variables["constants"]["core"]
    np.testing.assert_allclose(variables["constants"]["core"]["centers"][0],
                               centers0, rtol=1e-6)
    y = net.apply(variables, jnp.zeros((5, 2)))
    assert y.shape == (5, 1)


def test_warmstart_centers_trainable():
    lb, ub, dr, ai, delta = _two_region_spec()
    centers0 = np.random.default_rng(4).normal(size=(8, 2))
    net = WCRBFNet(
        in_features=2, out_features=1, num_kernels=8,
        basis_func=get_basis("gaussian"), num_regions=2,
        lower_bounds=lb, upper_bounds=ub, dimension_ranges=dr,
        activation_idx=ai, delta=delta, centers=centers0)
    variables = net.init(jax.random.PRNGKey(0), jnp.ones((1, 2)))
    got = variables["params"]["core"]["centers"]
    np.testing.assert_allclose(got[0], centers0, rtol=1e-6)
    np.testing.assert_allclose(got[1], centers0, rtol=1e-6)


def test_deeper_and_mlp_and_cluster_forward():
    lb, ub, dr, ai, delta = _two_region_spec()
    x = jnp.zeros((4, 2))
    deeper = DeeperWCRBFNet(
        in_features=2, out_features=3, num_kernels=8,
        basis_func=get_basis("gaussian"), num_regions=2,
        lower_bounds=lb, upper_bounds=ub, dimension_ranges=dr,
        activation_idx=ai, delta=delta)
    v = deeper.init(jax.random.PRNGKey(0), x)
    assert deeper.apply(v, x).shape == (4, 3)

    mlp = MLP(in_features=2, out_features=3, num_kernels=8)
    v = mlp.init(jax.random.PRNGKey(0), x)
    assert mlp.apply(v, x).shape == (4, 3)

    cl = ClusterWCRBFNet(in_features=2, out_features=3, num_kernels=8,
                         basis_func=get_basis("gaussian"), num_regions=5)
    v = cl.init(jax.random.PRNGKey(0), x)
    y, logits = cl.apply(v, x)
    assert y.shape == (4, 3) and logits.shape == (4, 5)


def test_from_config_roundtrip(small_net):
    lb, ub, dr, ai, delta = _two_region_spec()
    config = {
        "in_features": 2, "out_features": 3, "num_kernels": 8,
        "basis_func": "gaussian", "num_regions": 2,
        "lower_bounds": lb, "upper_bounds": ub, "dimension_ranges": dr,
        "activation_idx": ai, "delta": delta,
    }
    rebuilt = from_config(config)
    p = small_net.init(jax.random.PRNGKey(0), jnp.ones((2, 2)))
    x = jnp.asarray([[0.3, -0.2], [-0.8, 0.5]])
    np.testing.assert_allclose(rebuilt.apply(p, x), small_net.apply(p, x))
