"""Viewer-bridge tests: msgpack framing, array codec, ZMQ loopback, draw()."""

import numpy as np
import pytest
import jax.numpy as jnp

from open3d_tpu.geometry.pointcloud import PointCloud
from open3d_tpu.visualization import rpc


def test_set_mesh_data_frame_roundtrip():
    buf = rpc.BufferConnection()
    v = np.arange(12, dtype=np.float32).reshape(4, 3)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    rpc.set_mesh_data(path="scene/mesh", time=7, vertices=v, faces=f,
                      vertex_attributes={"colors": np.ones((4, 3), np.float32)},
                      o3d_type="TriangleMesh", connection=buf)
    assert len(buf.frames) == 1
    msg_id, body = rpc.unpack_request(buf.frames[0])
    assert msg_id == "set_mesh_data"
    assert body["path"] == "scene/mesh" and body["time"] == 7
    data = body["data"]
    np.testing.assert_array_equal(rpc.decode_array(data["vertices"]), v)
    np.testing.assert_array_equal(rpc.decode_array(data["faces"]), f)
    assert data["vertices"]["type"] == "<f4"
    assert rpc.decode_array(data["vertex_attributes"]["colors"]).shape == (4, 3)


def test_set_point_cloud_respects_mask():
    pos = jnp.asarray([[0.0, 0, 0], [1, 1, 1], [2, 2, 2]])
    pcd = PointCloud.create(pos, colors=jnp.ones((3, 3)))
    pcd = pcd.select_by_mask(jnp.asarray([True, False, True]))
    buf = rpc.BufferConnection()
    rpc.set_point_cloud(pcd, path="pcd", connection=buf)
    _, body = rpc.unpack_request(buf.frames[0])
    verts = rpc.decode_array(body["data"]["vertices"])
    assert verts.shape[0] == 2
    assert body["data"]["o3d_type"] == "PointCloud"


def test_zmq_loopback():
    import threading

    import msgpack
    import zmq

    ctx = zmq.Context.instance()
    rep = ctx.socket(zmq.REP)
    port = rep.bind_to_random_port("tcp://127.0.0.1")
    got = {}

    def server():
        raw = rep.recv()
        got["msg"] = rpc.unpack_request(raw)
        rep.send(
            msgpack.packb({"msg_id": "status"}) + msgpack.packb({"code": 0, "str": "OK"})
        )

    t = threading.Thread(target=server)
    t.start()
    conn = rpc.Connection(f"tcp://127.0.0.1:{port}", timeout_ms=10000)
    reply = rpc.set_mesh_data(
        path="x", vertices=np.zeros((2, 3), np.float32), connection=conn
    )
    t.join(timeout=10)
    conn.close()
    rep.close()
    assert reply == {"code": 0, "str": "OK"}
    assert got["msg"][0] == "set_mesh_data"


def test_draw_writes_png(tmp_path):
    from open3d_tpu.visualization import draw as drw

    pcd = PointCloud.create(jnp.asarray(np.random.rand(100, 3), jnp.float32))
    out = drw.draw([pcd], output_path=str(tmp_path / "scene.png"))
    import os

    assert os.path.getsize(out) > 1000


class TestLiveZMQReceiver:
    """Round-trip over a REAL ZeroMQ socket: a background REP receiver
    (the ZMQReceiver analog) decodes set_mesh_data requests from the
    msgpack wire schema — closes the round-2 'untested against a live
    receiver' gap (io/rpc/ZMQReceiver.cpp)."""

    def test_set_point_cloud_over_socket(self):
        zmq = pytest.importorskip("zmq")
        import threading

        import msgpack

        from open3d_tpu.visualization import rpc

        addr = "tcp://127.0.0.1:51999"
        received = {}
        ready = threading.Event()

        def server():
            ctx = zmq.Context.instance()
            sock = ctx.socket(zmq.REP)
            sock.bind(addr)
            ready.set()
            raw = sock.recv()
            msg_id, body = rpc.unpack_request(raw)
            received["msg_id"] = msg_id
            received["body"] = body
            reply = msgpack.packb({"status": {"code": 0, "str": "OK"}})
            sock.send(msgpack.packb("status", use_bin_type=True) + reply)
            sock.close()

        th = threading.Thread(target=server, daemon=True)
        th.start()
        assert ready.wait(5)

        from open3d_tpu.geometry.pointcloud import PointCloud

        pcd = PointCloud.create(jnp.asarray(np.random.default_rng(0).normal(size=(32, 3)).astype(np.float32)))
        conn = rpc.Connection(addr, timeout_ms=5000)
        try:
            rpc.set_point_cloud(pcd, path="test/pcd", connection=conn)
        finally:
            conn.close()
        th.join(timeout=5)
        assert received["msg_id"] == "set_mesh_data"
        data = received["body"]["data"]
        verts = rpc.decode_array(data["vertices"])
        assert verts.shape == (32, 3)
