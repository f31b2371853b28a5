"""NNS vs scipy brute force (ref test model: cpp/tests/core/NearestNeighborSearch.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from open3d_tpu.core import nns


def make_clouds(seed=0, n=500, m=700):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((n, 3)).astype(np.float32)
    t = rng.standard_normal((m, 3)).astype(np.float32)
    return q, t


def test_knn_matches_kdtree():
    q, t = make_clouds()
    idx, d2 = nns.knn_search(jnp.asarray(q), jnp.asarray(t), k=5)
    tree = cKDTree(t)
    ref_d, ref_i = tree.query(q, k=5)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), ref_d, rtol=1e-3, atol=1e-4)
    # indices can differ on ties; check distances of chosen indices
    chosen = np.linalg.norm(q[:, None] - t[np.asarray(idx)], axis=-1)
    np.testing.assert_allclose(chosen, ref_d, rtol=1e-3, atol=1e-4)


def test_one_nn():
    q, t = make_clouds(1)
    idx, d2 = nns.one_nn_search(jnp.asarray(q), jnp.asarray(t))
    tree = cKDTree(t)
    ref_d, ref_i = tree.query(q, k=1)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), ref_d, rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)


def test_hybrid_search_counts_and_radius():
    q, t = make_clouds(2, n=200, m=400)
    radius, k = 0.3, 8
    idx, d2, counts = nns.hybrid_search(jnp.asarray(q), jnp.asarray(t), radius, k)
    tree = cKDTree(t)
    for i in range(0, 200, 17):
        ref = sorted(tree.query_ball_point(q[i], radius))
        assert int(counts[i]) == min(len(ref), k)
        got = [j for j in np.asarray(idx[i]) if j >= 0]
        assert set(got) <= set(ref)
        # all within radius
        assert all(np.linalg.norm(q[i] - t[j]) <= radius + 1e-5 for j in got)


def test_target_mask_excludes():
    q, t = make_clouds(3, n=50, m=100)
    mask = np.zeros(100, dtype=bool)
    mask[:10] = True
    idx, _ = nns.knn_search(jnp.asarray(q), jnp.asarray(t), k=3, target_mask=jnp.asarray(mask))
    assert np.asarray(idx).max() < 10


def test_k_larger_than_targets():
    q, t = make_clouds(4, n=20, m=6)
    idx, d2 = nns.knn_search(jnp.asarray(q), jnp.asarray(t), k=10)
    assert idx.shape == (20, 6)


def test_chunking_consistency():
    q, t = make_clouds(5, n=1000, m=1500)
    i1, d1 = nns.one_nn_search(jnp.asarray(q), jnp.asarray(t), query_chunk=128, target_chunk=256)
    i2, d2 = nns.one_nn_search(jnp.asarray(q), jnp.asarray(t))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
