"""STL / OFF / glTF-binary mesh codecs, written in-tree.

Reference: io/file_format/FileSTL.cpp (binary STL with normal + attribute
word), FileOFF.cpp, FileGLTF.cpp (tinygltf). The TPU build keeps the codecs
as small numpy transcoders feeding the fixed-capacity TriangleMesh."""

from __future__ import annotations

import json
import os
import struct

import numpy as np


# ----------------------------------------------------------------- STL ----
def read_stl(path: str):
    """Binary or ASCII STL -> (vertices (V, 3) f32, triangles (T, 3) i32).
    Triangle-soup vertices are deduplicated (exact-match weld, matching the
    reference reader's behavior of indexing unique vertices)."""
    with open(path, "rb") as f:
        head = f.read(80)
        rest = f.read()
    is_ascii = head[:5] == b"solid" and b"facet" in (head + rest[:200])
    tris_v = []
    if is_ascii:
        for ln in (head + rest).decode("ascii", "ignore").splitlines():
            p = ln.split()
            if p[:1] == ["vertex"]:
                tris_v.append([float(p[1]), float(p[2]), float(p[3])])
        soup = np.asarray(tris_v, np.float32).reshape(-1, 3, 3)
    else:
        (n,) = struct.unpack("<I", rest[:4])
        data = np.frombuffer(rest[4 : 4 + n * 50], dtype=np.uint8).reshape(n, 50)
        facets = data[:, :48].copy().view(np.float32).reshape(n, 4, 3)
        soup = facets[:, 1:4, :]  # drop the normal row
    flat = soup.reshape(-1, 3)
    uniq, inv = np.unique(flat, axis=0, return_inverse=True)
    return uniq.astype(np.float32), inv.reshape(-1, 3).astype(np.int32)


def write_stl(path: str, vertices, triangles) -> None:
    """Binary STL (ref: WriteTriangleMeshToSTL, FileSTL.cpp)."""
    v = np.asarray(vertices, np.float32)
    t = np.asarray(triangles, np.int64)
    tri = v[t]  # (T, 3, 3)
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    nrm = np.cross(e1, e2)
    ln = np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = (nrm / np.maximum(ln, 1e-12)).astype(np.float32)
    with open(path, "wb") as f:
        f.write(b"open3d_tpu binary STL".ljust(80, b"\0"))
        f.write(struct.pack("<I", len(t)))
        rec = np.zeros((len(t), 50), np.uint8)
        payload = np.concatenate([nrm[:, None, :], tri], axis=1).reshape(len(t), 48 // 4)
        rec[:, :48] = payload.astype(np.float32).view(np.uint8).reshape(len(t), 48)
        f.write(rec.tobytes())


# ----------------------------------------------------------------- OFF ----
def read_off(path: str):
    with open(path) as f:
        toks = []
        for ln in f:
            ln = ln.split("#")[0].strip()
            if ln:
                toks.extend(ln.split())
    assert toks[0] == "OFF", "not an OFF file"
    nv, nf = int(toks[1]), int(toks[2])
    i = 4
    verts = np.asarray(toks[i : i + 3 * nv], np.float32).reshape(nv, 3)
    i += 3 * nv
    tris = []
    for _ in range(nf):
        k = int(toks[i])
        ids = [int(x) for x in toks[i + 1 : i + 1 + k]]
        for j in range(1, k - 1):
            tris.append([ids[0], ids[j], ids[j + 1]])
        i += 1 + k
    return verts, np.asarray(tris, np.int32).reshape(-1, 3)


def write_off(path: str, vertices, triangles) -> None:
    v = np.asarray(vertices)
    t = np.asarray(triangles)
    with open(path, "w") as f:
        f.write("OFF\n")
        f.write(f"{len(v)} {len(t)} 0\n")
        for p in v:
            f.write(f"{p[0]:.7f} {p[1]:.7f} {p[2]:.7f}\n")
        for tr in t:
            f.write(f"3 {tr[0]} {tr[1]} {tr[2]}\n")


# ---------------------------------------------------------------- glTF ----
def write_glb(path: str, vertices, triangles) -> None:
    """Minimal valid glTF 2.0 binary (one mesh, positions + indices)
    (ref: FileGLTF.cpp via tinygltf — the schema, not the code)."""
    v = np.asarray(vertices, np.float32)
    t = np.asarray(triangles, np.uint32)
    vbytes = v.tobytes()
    ibytes = t.tobytes()
    pad_v = (-len(vbytes)) % 4
    bin_chunk = vbytes + b"\0" * pad_v + ibytes
    pad_b = (-len(bin_chunk)) % 4
    bin_chunk += b"\0" * pad_b

    gltf = {
        "asset": {"version": "2.0", "generator": "open3d_tpu"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [
            {"primitives": [{"attributes": {"POSITION": 0}, "indices": 1, "mode": 4}]}
        ],
        "accessors": [
            {
                "bufferView": 0,
                "componentType": 5126,
                "count": int(len(v)),
                "type": "VEC3",
                "min": [float(x) for x in v.min(0)] if len(v) else [0, 0, 0],
                "max": [float(x) for x in v.max(0)] if len(v) else [0, 0, 0],
            },
            {
                "bufferView": 1,
                "componentType": 5125,
                "count": int(t.size),
                "type": "SCALAR",
            },
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(vbytes), "target": 34962},
            {
                "buffer": 0,
                "byteOffset": len(vbytes) + pad_v,
                "byteLength": len(ibytes),
                "target": 34963,
            },
        ],
        "buffers": [{"byteLength": len(bin_chunk)}],
    }
    js = json.dumps(gltf).encode()
    js += b" " * ((-len(js)) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_chunk)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))  # glTF magic
        f.write(struct.pack("<II", len(js), 0x4E4F534A))  # JSON chunk
        f.write(js)
        f.write(struct.pack("<II", len(bin_chunk), 0x004E4942))  # BIN chunk
        f.write(bin_chunk)


def read_glb(path: str):
    """Read positions + indices of the first mesh primitive from a .glb
    (or a .gltf with an external/embedded buffer)."""
    if path.lower().endswith(".gltf"):
        with open(path) as f:
            gltf = json.load(f)
        buf = gltf["buffers"][0]
        uri = buf.get("uri", "")
        if uri.startswith("data:"):
            import base64

            bin_chunk = base64.b64decode(uri.split(",", 1)[1])
        else:
            with open(os.path.join(os.path.dirname(path), uri), "rb") as f:
                bin_chunk = f.read()
    else:
        with open(path, "rb") as f:
            magic, ver, total = struct.unpack("<III", f.read(12))
            assert magic == 0x46546C67, "not a glb"
            ln, ty = struct.unpack("<II", f.read(8))
            js = f.read(ln)
            gltf = json.loads(js)
            bin_chunk = b""
            hdr = f.read(8)
            if hdr:
                ln2, ty2 = struct.unpack("<II", hdr)
                bin_chunk = f.read(ln2)

    prim = gltf["meshes"][0]["primitives"][0]

    def load_accessor(aid):
        acc = gltf["accessors"][aid]
        bv = gltf["bufferViews"][acc["bufferView"]]
        off = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
        comp = {5126: np.float32, 5125: np.uint32, 5123: np.uint16, 5121: np.uint8}[
            acc["componentType"]
        ]
        n_comp = {"VEC3": 3, "VEC2": 2, "SCALAR": 1}[acc["type"]]
        count = acc["count"]
        arr = np.frombuffer(
            bin_chunk, dtype=comp, count=count * n_comp, offset=off
        )
        return arr.reshape(count, n_comp) if n_comp > 1 else arr

    verts = load_accessor(prim["attributes"]["POSITION"]).astype(np.float32)
    tris = load_accessor(prim["indices"]).astype(np.int32).reshape(-1, 3)
    return verts, tris
