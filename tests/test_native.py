"""Native C++ component tests: clothoid oracle vs JAX solver, table store."""

import numpy as np
import pytest

from irbfn_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_oracle_agrees_with_jax_solver():
    """The C++ oracle and the JAX solver share no code; agreement to 1e-9
    is strong evidence both solve the G1 BVP correctly."""
    import jax.numpy as jnp

    from irbfn_tpu.solvers.clothoid import solve_g1_lattice

    rng = np.random.default_rng(0)
    goals = np.column_stack([
        rng.uniform(5, 30, 200), rng.uniform(-8, 8, 200),
        rng.uniform(-1.5, 1.5, 200)])
    oracle, status = native.clothoid_oracle(goals)
    jax_params = np.asarray(solve_g1_lattice(jnp.asarray(goals)))
    ok = status == 0
    assert ok.mean() > 0.99
    np.testing.assert_allclose(jax_params[ok], oracle[ok], rtol=1e-8,
                               atol=1e-9)


def test_oracle_straight_line():
    out, status = native.clothoid_oracle(np.array([[10.0, 0.0, 0.0]]))
    assert status[0] == 0
    np.testing.assert_allclose(out[0], [0, 0, 0, 0, 10.0], atol=1e-12)


def test_table_store_roundtrip(tmp_path):
    path = str(tmp_path / "t.tbl")
    store = native.TableStore.create(path, in_dim=3, out_dim=5)
    rng = np.random.default_rng(1)
    xs = rng.normal(size=(100, 3)).astype(np.float32)
    ys = rng.normal(size=(100, 5)).astype(np.float32)
    valid = (rng.uniform(size=100) > 0.2).astype(np.float32)
    store.append(xs[:60], ys[:60], valid[:60])
    store.append(xs[60:], ys[60:], valid[60:])

    with store as t:
        assert t.n_rows == 100 and t.in_dim == 3 and t.out_dim == 5
        xi, yi, vi = t.read_range(0, 100)
        np.testing.assert_array_equal(xi, xs)
        np.testing.assert_array_equal(yi, ys)
        np.testing.assert_array_equal(vi, valid > 0.5)
        # random gather (permutation batching)
        idx = rng.permutation(100)[:32]
        xg, yg, vg = t.gather(idx)
        np.testing.assert_array_equal(xg, xs[idx])
        np.testing.assert_array_equal(yg, ys[idx])


def test_table_store_out_of_range_gather(tmp_path):
    path = str(tmp_path / "t2.tbl")
    store = native.TableStore.create(path, in_dim=2, out_dim=1)
    store.append(np.ones((5, 2), np.float32), np.ones((5, 1), np.float32),
                 np.ones(5, np.float32))
    with store as t:
        xi, yi, vi = t.gather(np.array([0, 99, 3]))
        assert xi.shape[0] == 2  # invalid index skipped


def test_edt_matches_scipy_oracle():
    """Native Felzenszwalb EDT == scipy exact EDT on random + structured
    bitmaps (both algorithms are exact; equality up to f32 rounding)."""
    pytest.importorskip("scipy")
    from scipy.ndimage import distance_transform_edt

    from irbfn_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    cases = [
        rng.random((64, 96)) > 0.3,          # speckle
        np.zeros((8, 8), bool),              # all obstacle
        rng.random((255, 129)) > 0.02,       # sparse obstacles, odd shape
    ]
    ring = np.zeros((128, 128), bool)
    ring[8:-8, 8:-8] = True
    ring[40:-40, 40:-40] = False             # square annulus corridor
    cases.append(ring)
    # large map: q*q reaches ~1e7 where f32 ulp ~ 1 — exercises the f64
    # parabola-intersection arithmetic in dt1d (real track bitmaps are a few
    # thousand cells per side)
    big = np.ones((2048, 3000), bool)
    big[0, 0] = big[-1, -1] = big[1024, 1500] = False
    cases.append(big)
    for free in cases:
        got = native.edt(free, resolution=0.25)
        want = 0.25 * distance_transform_edt(free)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
