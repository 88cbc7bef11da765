"""Point-cloud IO + visualization output.

Reference parity (viscom-ulm/MCCNN): ``utils/PyUtils.py`` (SURVEY §2.2):
read/write point clouds (txt / ply), color maps, and saving colored
segmentation / normal visualizations for inspection.

A native C++ fast path for bulk txt/pts parsing lives in
``mccnn_tpu/native`` (ctypes); these functions transparently use it when the
shared library is built (python fallback otherwise).
"""

from __future__ import annotations

import struct

import numpy as np

from ..native import fast_parse_floats


def read_points_txt(path: str, delimiter: str | None = None) -> np.ndarray:
    """Read an (n, d) float table (.txt/.pts/.xyz; auto comma/space)."""
    data = open(path, "rb").read()
    if delimiter is None:
        head = data[:4096]
        delimiter = "," if b"," in head.split(b"\n", 1)[0] else None
    arr = fast_parse_floats(data, delimiter)
    return arr.astype(np.float32)


def write_points_txt(path: str, points: np.ndarray, delimiter: str = ",") -> None:
    np.savetxt(path, points, fmt="%.6f", delimiter=delimiter)


def read_ply(path: str) -> dict:
    """Minimal PLY reader (ascii + binary_little_endian, vertex props)."""
    with open(path, "rb") as f:
        assert f.readline().strip() == b"ply"
        fmt = None
        n_vertex = 0
        props: list[tuple[str, str]] = []
        while True:
            line = f.readline().strip()
            if line == b"end_header":
                break
            parts = line.split()
            if parts[0] == b"format":
                fmt = parts[1].decode()
            elif parts[0] == b"element" and parts[1] == b"vertex":
                n_vertex = int(parts[2])
            elif parts[0] == b"property" and parts[1] != b"list":
                props.append((parts[2].decode(), parts[1].decode()))
        type_map = {
            "float": "f4", "float32": "f4", "double": "f8",
            "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
            "short": "i2", "ushort": "u2", "int": "i4", "int32": "i4",
            "uint": "u4",
        }
        if fmt == "ascii":
            rows = np.loadtxt(f, max_rows=n_vertex)
            rows = np.atleast_2d(rows)
            return {name: rows[:, i] for i, (name, _) in enumerate(props)}
        dtype = np.dtype([(n, "<" + type_map[t]) for n, t in props])
        raw = np.frombuffer(f.read(dtype.itemsize * n_vertex), dtype=dtype)
        return {name: np.asarray(raw[name]) for name, _ in props}


def write_ply(
    path: str,
    points: np.ndarray,
    colors: np.ndarray | None = None,
    normals: np.ndarray | None = None,
) -> None:
    """Write a binary-little-endian PLY (colors uint8, normals float)."""
    n = len(points)
    props = ["property float x", "property float y", "property float z"]
    if normals is not None:
        props += ["property float nx", "property float ny", "property float nz"]
    if colors is not None:
        props += [
            "property uchar red", "property uchar green", "property uchar blue"
        ]
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n" + "\n".join(props) + "\nend_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        for i in range(n):
            f.write(struct.pack("<3f", *points[i]))
            if normals is not None:
                f.write(struct.pack("<3f", *normals[i]))
            if colors is not None:
                f.write(struct.pack("<3B", *colors[i].astype(np.uint8)))


_SEG_COLORS = np.asarray(
    [
        [230, 25, 75], [60, 180, 75], [255, 225, 25], [0, 130, 200],
        [245, 130, 48], [145, 30, 180], [70, 240, 240], [240, 50, 230],
        [210, 245, 60], [250, 190, 190], [0, 128, 128], [230, 190, 255],
        [170, 110, 40], [255, 250, 200], [128, 0, 0], [170, 255, 195],
        [128, 128, 0], [255, 215, 180], [0, 0, 128], [128, 128, 128],
    ],
    np.uint8,
)


def label_colors(labels: np.ndarray) -> np.ndarray:
    """Categorical color map for segmentation labels (cycled)."""
    return _SEG_COLORS[np.asarray(labels) % len(_SEG_COLORS)]


def save_segmentation_ply(path: str, points, labels) -> None:
    """Colored segmentation dump — the reference's visual-inspection output."""
    write_ply(path, np.asarray(points), colors=label_colors(labels))


def save_normals_ply(path: str, points, normals) -> None:
    """Normals visualized as RGB = (n+1)/2."""
    n = np.asarray(normals)
    colors = ((n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9) + 1)
              * 0.5 * 255).astype(np.uint8)
    write_ply(path, np.asarray(points), colors=colors, normals=n)
