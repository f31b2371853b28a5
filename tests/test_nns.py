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


# ---------------------------------------------------------------------------
# Sorted-band 1-NN (round 5): exactness against the brute sweep
# ---------------------------------------------------------------------------


def test_banded_one_nn_matches_exact_sweep():
    import numpy as np

    from open3d_tpu.core import nns

    rng = np.random.default_rng(7)
    M, N = 20000, 15000
    tgt = jnp.asarray(rng.uniform(-1.5, 1.5, (M, 3)).astype(np.float32))
    tmask = jnp.asarray(rng.uniform(size=M) > 0.2)
    q = jnp.asarray(rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32))
    extras = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    dmax = 0.05

    b = nns.banded_build(tgt, tmask, extras, window=4096)
    qs = q[jnp.argsort(nns.banded_query_key(b, q))]
    idx_b, d2_b, sel, short = nns.banded_one_nn(b, qs, dmax)
    idx_e, d2_e = nns.one_nn_search(qs, tgt, target_mask=tmask)
    valid_e = (idx_e >= 0) & (d2_e <= dmax * dmax)

    assert int(short) == 0  # no candidate window truncated at this density
    # the banded result must be at least as close as the exact sweep's
    # (ties between equidistant neighbors may resolve differently)
    assert bool(jnp.all(valid_e == (idx_b >= 0)))
    agree = jnp.where(valid_e, idx_e, -1) == idx_b
    d2_ok = d2_b <= d2_e * (1 + 1e-5) + 1e-12
    assert bool(jnp.all(agree | (valid_e & d2_ok)))
    # selected attribute rows == gathered rows of the winners
    ok = np.asarray(idx_b >= 0)
    ib = np.asarray(idx_b)[ok]
    # hi/lo bf16 reconstruction: ~2^-17 relative
    np.testing.assert_allclose(
        np.asarray(sel[:, :3])[ok], np.asarray(tgt)[ib], rtol=3e-5, atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(sel[:, 3:6])[ok], np.asarray(extras)[ib], rtol=3e-5, atol=3e-5
    )
    # idx column decodes exactly
    np.testing.assert_array_equal(
        np.round(np.asarray(sel[:, -1])[ok]).astype(np.int64), ib
    )


def test_banded_icp_matches_exact_backend():
    """Banded and exact-backend ICP converge to the same pose."""
    import numpy as np

    from open3d_tpu.core import lie
    from open3d_tpu.geometry.pointcloud import PointCloud
    from open3d_tpu.pipelines import registration as reg

    rng = np.random.default_rng(3)
    n = 9000
    # bumpy surface so point-to-plane locks all 6 dof
    xy = rng.uniform(-1.0, 1.0, (n, 2)).astype(np.float32)
    z = 0.3 * np.sin(2.0 * xy[:, 0]) * np.cos(3.0 * xy[:, 1])
    pts = jnp.asarray(np.column_stack([xy, z]).astype(np.float32))
    nx = -0.6 * np.cos(2 * xy[:, 0]) * np.cos(3 * xy[:, 1])
    ny = 0.9 * np.sin(2 * xy[:, 0]) * np.sin(3 * xy[:, 1])
    nrm = np.column_stack([nx, ny, np.ones(n)]).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    tgt = PointCloud.create(pts, normals=jnp.asarray(nrm))
    xi = jnp.asarray([0.01, -0.02, 0.015, 0.01, -0.01, 0.02], jnp.float32)
    T_true = lie.se3_exp(xi)
    src = PointCloud.create(lie.transform_points(jnp.linalg.inv(T_true), pts))

    crit = reg.ICPConvergenceCriteria(max_iteration=15)
    for backend in ("banded", "exact"):
        r = reg.icp(src, tgt, 0.1, estimation=reg.TransformationEstimationPointToPlane(),
                    criteria=crit, nns_backend=backend)
        err = np.abs(np.asarray(r.transformation) - np.asarray(T_true)).max()
        assert err < 5e-4, (backend, err)
        assert float(r.fitness) > 0.95
