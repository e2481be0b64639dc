"""Constraint-clustering, datagen table format, and utils tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from irbfn_tpu.train.clustering import (
    cluster_centers,
    cluster_ids,
    save_cluster_artifacts,
    unique_activation_patterns,
)
from irbfn_tpu.utils.profiling import MetricLogger, throughput


def _fake_constraints(n=200, seed=0):
    rng = np.random.default_rng(seed)
    # three dominant patterns + noise rows + some -999 failures
    base = np.zeros((3, 10))
    base[0, :2] = 1
    base[1, 4:6] = 1
    base[2, 7:] = 1
    ids = rng.choice(3, size=n, p=[0.5, 0.3, 0.2])
    cons = base[ids].copy()
    cons[:5] = -999.0
    inputs = rng.normal(size=(n, 4)) + ids[:, None]
    return inputs, cons, ids


def test_unique_patterns_ranked():
    inputs, cons, true_ids = _fake_constraints()
    pats, counts, inverse = unique_activation_patterns(cons)
    assert pats.shape[0] == 3
    assert (np.diff(counts) <= 0).all()  # sorted desc
    assert (inverse[:5] == -1).all()  # -999 rows invalid
    # most frequent pattern is the p=0.5 one
    np.testing.assert_array_equal(pats[0][:2], [1, 1])


def test_cluster_ids_overflow():
    _, cons, _ = _fake_constraints()
    ids = cluster_ids(cons, top_k=2)
    assert ids.max() == 2  # overflow bucket
    assert (ids[:5] == 2).all()  # invalid rows -> overflow


def test_cluster_centers_track_clusters():
    inputs, cons, true_ids = _fake_constraints(n=500)
    centers = cluster_centers(inputs, cons, top_k=3, mode="mean")
    # cluster k's center should sit near offset of the matching true id
    # (identify by nearest integer offset)
    offs = np.round(centers.mean(axis=1))
    assert set(offs.astype(int)) == {0, 1, 2}


def test_save_cluster_artifacts(tmp_path):
    inputs, cons, _ = _fake_constraints()
    npz = str(tmp_path / "table.npz")
    np.savez(npz, inputs=inputs, constraints=cons)
    cpath, ipath = save_cluster_artifacts(npz, inputs, cons, top_k=2)
    assert np.load(cpath)["centers"].shape == (2, 4)
    assert np.load(ipath)["cluster_int_ids"].shape == (inputs.shape[0],)


def test_frenet_table_sentinels():
    from irbfn_tpu.parallel.datagen import frenet_table
    from irbfn_tpu.solvers.nmpc import NMPCSolution

    n, T = 6, 5
    sol = NMPCSolution(
        accel=jnp.ones((n, T)), steer_vel=jnp.zeros((n, T)),
        states=jnp.zeros((n, T + 1, 7)),
        active_onehot=jnp.ones((n, 86)),
        feasible=jnp.asarray([True, False, True, True, False, True]),
        kkt_residual=jnp.zeros((n,)))
    rows = np.zeros((n, 8), np.float32)
    table = frenet_table(rows, sol)
    assert table["outputs"].shape == (n, T, 2)
    assert (table["outputs"][1] == -999.0).all()
    assert (table["constraints"][4] == -999.0).all()
    assert (table["outputs"][0] != -999.0).all()
    assert table["valid"].sum() == 4


def test_metric_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    logger = MetricLogger(path=path)
    logger.log({"loss": jnp.asarray(1.5), "skip": None}, step=3)
    logger.log({"loss": 0.7}, step=4)
    logger.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0] == {"loss": 1.5, "step": 3}
    assert lines[1]["loss"] == 0.7


def test_throughput_helper():
    f = jax.jit(lambda x: jnp.sum(x * 2))
    x = jnp.ones((1000,))
    stats = throughput(f, x, items=1000, iters=3, sync="fetch")
    assert stats["items_per_s"] > 0
    assert stats["median_s"] > 0


def test_controls_block_layout():
    """(N, T, 2) table outputs flatten to BLOCK layout [a0..aT, sv0..svT] —
    the net-output/rollout ABI (reference train_nmpc_frenet.py:66-67) — not
    the interleaved order a plain reshape produces."""
    import numpy as np

    from irbfn_tpu.parallel.datagen import controls_block

    T = 5
    accel = np.arange(10, 10 + T, dtype=np.float32)
    sv = np.arange(20, 20 + T, dtype=np.float32)
    out3 = np.stack([accel, sv], axis=-1)[None]  # (1, T, 2) npz layout
    flat = controls_block(out3)
    np.testing.assert_array_equal(flat[0, :T], accel)
    np.testing.assert_array_equal(flat[0, T:], sv)
    # already-flat arrays pass through
    np.testing.assert_array_equal(controls_block(flat), flat)


def test_grid_table_block_layout():
    """grid_table_from_arrays serves accel at [..., 0] and sv at [..., T]."""
    import numpy as np

    from irbfn_tpu.planning.explicit import (grid_lookup,
                                             grid_table_from_arrays)

    xs = np.linspace(0.0, 1.0, 3, dtype=np.float32)
    inputs = xs[:, None]
    T = 2
    accel = np.tile(xs[:, None], (1, T)) + 100  # distinct per row
    sv = np.tile(xs[:, None], (1, T)) + 200
    outputs = np.stack([accel, sv], axis=-1)  # (3, T, 2)
    table = grid_table_from_arrays(inputs, outputs)
    out, valid = grid_lookup(table, np.asarray([[0.5]], np.float32))
    assert abs(float(out[0, 0]) - 100.5) < 1e-6  # a0
    assert abs(float(out[0, T]) - 200.5) < 1e-6  # sv0
