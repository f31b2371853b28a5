"""ML ops tests vs numpy references (the reference's own test strategy:
python/test/ml_ops/* compares CUDA ops against numpy implementations)."""

import jax
import jax.numpy as jnp
import numpy as np

from open3d_tpu.ml import ops


def test_voxelize_groups_points():
    pts = jnp.asarray(
        [[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [1.5, 0.1, 0.1], [9.9, 9.9, 9.9]],
        jnp.float32,
    )
    coords, vpi, counts, nv = ops.voxelize(
        pts, 1.0, [0, 0, 0], [3, 3, 3], max_points_per_voxel=8, max_voxels=16
    )
    nv = int(nv)
    assert nv == 2  # the far point is out of range
    c = np.asarray(coords[:nv])
    assert {tuple(r) for r in c.tolist()} == {(0, 0, 0), (1, 0, 0)}
    counts = np.asarray(counts[:nv])
    assert sorted(counts.tolist()) == [1, 2]
    # indices of the (0,0,0) voxel are points 0 and 1
    row = int(np.nonzero((c == [0, 0, 0]).all(1))[0][0])
    ids = set(np.asarray(vpi[row]).tolist()) - {-1}
    assert ids == {0, 1}


def test_voxel_pooling_average():
    pts = jnp.asarray([[0.1, 0, 0], [0.3, 0, 0], [5.0, 0, 0]], jnp.float32)
    feat = jnp.asarray([[1.0], [3.0], [10.0]])
    pos, f, valid = ops.voxel_pooling(pts, feat, 1.0, max_voxels=8)
    nv = int(np.asarray(valid).sum())
    assert nv == 2
    f = np.sort(np.asarray(f[np.asarray(valid)]).ravel())
    np.testing.assert_allclose(f, [2.0, 10.0])


def test_ball_query_fill_convention():
    pts = jnp.asarray([[0, 0, 0], [0.1, 0, 0], [5, 5, 5]], jnp.float32)
    q = jnp.asarray([[0.0, 0, 0], [9.0, 9, 9]], jnp.float32)
    idx, cnt = ops.ball_query(pts, q, radius=0.5, nsample=4)
    idx = np.asarray(idx)
    assert int(cnt[0]) == 2
    assert set(idx[0].tolist()) == {0, 1}  # empty slots repeat first found
    assert (idx[1] == -1).all() and int(cnt[1]) == 0


def test_three_nn_interpolate_exact_at_point():
    pts = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [4, 4, 4]], jnp.float32)
    feat = jnp.asarray([[1.0], [2.0], [3.0], [9.0]])
    q = jnp.asarray([[0, 0, 0], [0.5, 0.5, 0]], jnp.float32)
    idx, w = ops.three_nn(q, pts)
    out = np.asarray(ops.three_interpolate(feat, idx, w))
    assert abs(out[0, 0] - 1.0) < 1e-3  # coincident: weight collapses to pt 0
    assert 1.0 < out[1, 0] < 3.0


def test_reduce_subarrays_sum_and_ragged():
    vals = jnp.asarray([1.0, 2, 3, 4, 5, 6])
    rs = jnp.asarray([0, 2, 2, 6])
    out = np.asarray(ops.reduce_subarrays_sum(vals, rs))
    np.testing.assert_allclose(out, [3.0, 0.0, 18.0])
    dense = np.asarray(ops.ragged_to_dense(vals, rs, 3, -1.0))
    np.testing.assert_allclose(dense[0], [1, 2, -1])
    np.testing.assert_allclose(dense[1], [-1, -1, -1])
    np.testing.assert_allclose(dense[2], [3, 4, 5])  # capped at 3


def test_invert_neighbors_list():
    # point0 -> [1, 2]; point1 -> [2]; point2 -> []
    inv, cnt = ops.invert_neighbors_list(
        3, jnp.asarray([1, 2, 2], jnp.int32), jnp.asarray([0, 2, 3, 3]), k=4
    )
    inv = np.asarray(inv)
    assert set(inv[1].tolist()) - {-1} == {0}
    assert set(inv[2].tolist()) - {-1} == {0, 1}
    assert (inv[0] == -1).all()
    np.testing.assert_array_equal(np.asarray(cnt), [0, 1, 2])


def test_iou_bev_axis_aligned():
    a = jnp.asarray([[0, 0, 2, 2, 0.0]], jnp.float32)
    b = jnp.asarray([[1, 0, 2, 2, 0.0], [0, 0, 2, 2, 0.0], [10, 0, 2, 2, 0.0]], jnp.float32)
    iou = np.asarray(ops.iou_bev(a, b))[0]
    np.testing.assert_allclose(iou, [2.0 / 6.0, 1.0, 0.0], atol=1e-5)


def test_iou_bev_rotated():
    # 45-degree rotated unit square on identical center: IoU of square vs
    # rotated square = area(octagon)/area(union) = (2(sqrt2-1))/(2-2(sqrt2-1))
    a = jnp.asarray([[0, 0, 1, 1, 0.0]], jnp.float32)
    b = jnp.asarray([[0, 0, 1, 1, np.pi / 4]], jnp.float32)
    iou = float(np.asarray(ops.iou_bev(a, b))[0, 0])
    inter = 2 * (np.sqrt(2) - 1)
    expect = inter / (2 - inter)
    assert abs(iou - expect) < 1e-3


def test_iou_3d():
    a = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.0]], jnp.float32)
    b = jnp.asarray([[0, 1, 0, 2, 2, 2, 0.0]], jnp.float32)
    iou = float(np.asarray(ops.iou_3d(a, b))[0, 0])
    np.testing.assert_allclose(iou, 4.0 / 12.0, atol=1e-5)


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray(
        [[0, 0, 2, 2, 0.0], [0.1, 0, 2, 2, 0.0], [5, 5, 2, 2, 0.0]], jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(ops.nms(boxes, scores, iou_threshold=0.5))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_continuous_conv_constant_filter_is_masked_mean():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (64, 3)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(64, 2)).astype(np.float32))
    q = pts[:8]
    w = jnp.ones((3, 3, 3, 2, 2)) * jnp.eye(2)  # identity per tap
    out = ops.continuous_conv(feat, pts, q, w, extents=0.8, max_nn=32)
    assert out.shape == (8, 2)
    assert np.isfinite(np.asarray(out)).all()
    # with an identity constant filter, output ~ mean of in-box neighbor feats
    # (trilinear weights sum to 1 per neighbor)
    assert np.abs(np.asarray(out)).max() < 10.0


def test_continuous_conv_grad_flows():
    pts = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (32, 3)), jnp.float32)
    feat = jnp.ones((32, 1), jnp.float32)
    q = pts[:4]

    def loss(w):
        return jnp.sum(ops.continuous_conv(feat, pts, q, w, extents=1.0, max_nn=16) ** 2)

    g = jax.grad(loss)(jnp.ones((3, 3, 3, 1, 1)) * 0.1)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_sparse_conv_identity_kernel():
    coords = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], jnp.int32)
    feat = jnp.asarray([[1.0, 2], [3, 4], [5, 6]])
    w = jnp.zeros((3, 3, 3, 2, 2)).at[1, 1, 1].set(jnp.eye(2))
    out = np.asarray(ops.sparse_conv(feat, coords, w))
    np.testing.assert_allclose(out, np.asarray(feat), atol=1e-6)


def test_sparse_conv_neighbor_sum():
    coords = jnp.asarray([[0, 0, 0], [1, 0, 0], [2, 0, 0]], jnp.int32)
    feat = jnp.asarray([[1.0], [1.0], [1.0]])
    w = jnp.ones((3, 3, 3, 1, 1))  # box filter: sums all occupied taps
    out = np.asarray(ops.sparse_conv(feat, coords, w)).ravel()
    np.testing.assert_allclose(out, [2.0, 3.0, 2.0], atol=1e-6)


def test_roi_pool_inside_outside():
    from open3d_tpu.ml import ops as mlops

    pts = jnp.asarray(
        [[0.0, 0.0, 0.0], [0.4, 0.0, 0.0], [2.0, 0.0, 0.0], [0.0, 0.0, 0.9]],
        jnp.float32,
    )
    feats = jnp.arange(4, dtype=jnp.float32)[:, None]
    boxes = jnp.asarray([[0, 0, 0, 1.0, 1.0, 1.0, 0.0]], jnp.float32)
    pooled, empty = mlops.roi_pool(pts, feats, boxes, num_sampled_points=8)
    assert not bool(empty[0])
    got = set(np.asarray(pooled)[0, :, 3].tolist())
    assert 0.0 in got and 1.0 in got  # the two inside points
    assert 2.0 not in got  # x=2 is outside
    assert 3.0 not in got  # z=0.9 above half-height

    # rotated box: yaw pi/2 swaps the footprint axes
    boxes_r = jnp.asarray([[0, 0, 0, 0.5, 5.0, 1.0, np.pi / 2]], jnp.float32)
    pooled_r, empty_r = mlops.roi_pool(pts, feats, boxes_r, num_sampled_points=8)
    got_r = set(np.asarray(pooled_r)[0, :, 3].tolist())
    assert 2.0 in got_r  # the long axis now covers x


def test_roi_pool_empty_box():
    from open3d_tpu.ml import ops as mlops

    pts = jnp.zeros((4, 3), jnp.float32)
    feats = jnp.zeros((4, 2), jnp.float32)
    boxes = jnp.asarray([[10, 10, 10, 1, 1, 1, 0.3]], jnp.float32)
    pooled, empty = mlops.roi_pool(pts, feats, boxes, num_sampled_points=4)
    assert bool(empty[0])
    assert float(jnp.abs(pooled).max()) == 0.0


def test_trilinear_devoxelize_matches_manual():
    from open3d_tpu.ml import ops as mlops

    R, C = 4, 2
    rng = np.random.default_rng(0)
    vox = jnp.asarray(rng.normal(size=(C, R, R, R)).astype(np.float32))
    pts = jnp.asarray([[1.25, 2.5, 0.75], [0.0, 0.0, 0.0]], jnp.float32)
    out, idx, w = mlops.trilinear_devoxelize(vox, pts, R)
    assert out.shape == (2, C) and idx.shape == (2, 8) and w.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, -1)), 1.0, atol=1e-6)
    # manual trilerp for point 0
    from itertools import product

    p = np.asarray([1.25, 2.5, 0.75])
    g0 = np.floor(p).astype(int)
    f = p - g0
    expect = np.zeros(C)
    for dx, dy, dz in product((0, 1), repeat=3):
        wt = (f[0] if dx else 1 - f[0]) * (f[1] if dy else 1 - f[1]) * (
            f[2] if dz else 1 - f[2]
        )
        expect += wt * np.asarray(vox)[:, g0[0] + dx, g0[1] + dy, g0[2] + dz]
    np.testing.assert_allclose(np.asarray(out[0]), expect, rtol=1e-5)


def test_trilinear_devoxelize_grad_flows():
    from open3d_tpu.ml import ops as mlops

    R, C = 3, 1
    vox = jnp.ones((C, R, R, R), jnp.float32)
    pts = jnp.asarray([[1.2, 1.3, 0.4]], jnp.float32)

    def loss(v):
        out, _, _ = mlops.trilinear_devoxelize(v, pts, R)
        return jnp.sum(out**2)

    g = jax.grad(loss)(vox)
    assert float(jnp.abs(g).sum()) > 0
