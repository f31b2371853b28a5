"""PCD reader/writer (ascii, binary, binary_compressed), from scratch.

Reference surface: io/file_format/FilePCD.cpp — PCL's PCD container with
LZF-compressed binary variant. The LZF codec below implements the liblzf
block format (the de-facto PCD compression) in pure Python/numpy.
"""

from __future__ import annotations

import numpy as np

_TYPE_MAP = {("F", 4): "f4", ("F", 8): "f8", ("I", 1): "i1", ("I", 2): "i2",
             ("I", 4): "i4", ("U", 1): "u1", ("U", 2): "u2", ("U", 4): "u4"}


def lzf_decompress(data: bytes, expected_size: int) -> bytes:
    """liblzf decompression (format: literal runs + back-references)."""
    out = bytearray(expected_size)
    i, o, n = 0, 0, len(data)
    while i < n:
        ctrl = data[i]
        i += 1
        if ctrl < 32:  # literal run of ctrl+1 bytes
            run = ctrl + 1
            out[o : o + run] = data[i : i + run]
            i += run
            o += run
        else:  # back reference
            length = ctrl >> 5
            if length == 7:
                length += data[i]
                i += 1
            ref = o - ((ctrl & 0x1F) << 8) - data[i] - 1
            i += 1
            for k in range(length + 2):
                out[o] = out[ref]
                o += 1
                ref += 1
    return bytes(out[:o])


def lzf_compress(data: bytes) -> bytes:
    """Minimal valid LZF stream: emit pure literal runs (decompresses with
    any liblzf implementation; compression ratio 1.0 — correctness over
    ratio, the TPU path never ships compressed PCDs itself)."""
    out = bytearray()
    for i in range(0, len(data), 32):
        chunk = data[i : i + 32]
        out.append(len(chunk) - 1)
        out.extend(chunk)
    return bytes(out)


def read_pcd(path: str) -> dict:
    """Returns {field: np.ndarray}; xyz fields combined downstream."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            if line.startswith("#") or not line:
                continue
            key, _, rest = line.partition(" ")
            header[key] = rest.split()
            if key == "DATA":
                break
        fields = header["FIELDS"]
        sizes = [int(s) for s in header["SIZE"]]
        types = header["TYPE"]
        counts = [int(c) for c in header.get("COUNT", ["1"] * len(fields))]
        n = int(header["POINTS"][0])
        mode = header["DATA"][0]

        dt_fields = []
        for fname, sz, ty, ct in zip(fields, sizes, types, counts):
            base = _TYPE_MAP[(ty, sz)]
            dt_fields.append((fname, "<" + base, (ct,)) if ct > 1 else (fname, "<" + base))
        dt = np.dtype(dt_fields)

        if mode == "ascii":
            rows = np.loadtxt(f, dtype=np.float64, max_rows=n).reshape(n, -1)
            out, col = {}, 0
            for fname, sz, ty, ct in zip(fields, sizes, types, counts):
                base = _TYPE_MAP[(ty, sz)]
                out[fname] = rows[:, col : col + ct].astype(base).squeeze(-1) if ct > 1 else rows[:, col].astype(base)
                col += ct
            return out
        elif mode == "binary":
            arr = np.frombuffer(f.read(dt.itemsize * n), dtype=dt, count=n)
            return {fname: np.ascontiguousarray(arr[fname]) for fname in fields}
        elif mode == "binary_compressed":
            import struct

            comp_size, uncomp_size = struct.unpack("<II", f.read(8))
            from open3d_tpu import native

            raw = native.lzf_decompress(f.read(comp_size), uncomp_size)
            # binary_compressed stores data column-major (field-by-field)
            out, off = {}, 0
            for fname, sz, ty, ct in zip(fields, sizes, types, counts):
                base = np.dtype("<" + _TYPE_MAP[(ty, sz)])
                nbytes = base.itemsize * ct * n
                col = np.frombuffer(raw[off : off + nbytes], dtype=base)
                out[fname] = col.reshape(n, ct).squeeze(-1) if ct > 1 else col
                off += nbytes
            return out
        raise ValueError(f"unsupported PCD DATA mode {mode}")


def write_pcd(
    path: str,
    positions: np.ndarray,
    normals: np.ndarray | None = None,
    colors: np.ndarray | None = None,
    binary: bool = True,
) -> None:
    positions = np.asarray(positions, np.float32)
    n = positions.shape[0]
    fields, sizes, types, counts, cols = ["x", "y", "z"], [4, 4, 4], ["F"] * 3, [1] * 3, [
        positions[:, 0], positions[:, 1], positions[:, 2]
    ]
    if normals is not None:
        nn = np.asarray(normals, np.float32)
        fields += ["normal_x", "normal_y", "normal_z"]
        sizes += [4] * 3
        types += ["F"] * 3
        counts += [1] * 3
        cols += [nn[:, 0], nn[:, 1], nn[:, 2]]
    if colors is not None:
        c = np.asarray(colors)
        if c.dtype != np.uint8:
            c = np.clip(np.asarray(c, np.float64) * 255.0, 0, 255).astype(np.uint8)
        rgb = (
            c[:, 0].astype(np.uint32) << 16
            | c[:, 1].astype(np.uint32) << 8
            | c[:, 2].astype(np.uint32)
        ).view(np.float32)
        fields.append("rgb")
        sizes.append(4)
        types.append("F")
        counts.append(1)
        cols.append(rgb)

    header = "\n".join(
        [
            "# .PCD v0.7 - Point Cloud Data file format",
            "VERSION 0.7",
            "FIELDS " + " ".join(fields),
            "SIZE " + " ".join(map(str, sizes)),
            "TYPE " + " ".join(types),
            "COUNT " + " ".join(map(str, counts)),
            f"WIDTH {n}",
            "HEIGHT 1",
            "VIEWPOINT 0 0 0 1 0 0 0",
            f"POINTS {n}",
            "DATA " + ("binary" if binary else "ascii"),
        ]
    )
    with open(path, "wb") as f:
        f.write((header + "\n").encode("ascii"))
        arr = np.zeros(n, dtype=np.dtype([(fn, "<f4") for fn in fields]))
        for fn, col in zip(fields, cols):
            arr[fn] = col
        if binary:
            f.write(arr.tobytes())
        else:
            for i in range(n):
                f.write((" ".join(repr(float(arr[fn][i])) for fn in fields) + "\n").encode())
