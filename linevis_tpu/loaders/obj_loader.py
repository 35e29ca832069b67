""".obj line-set loader.

Format (reference `README.md:144-153`, parser `src/Loaders/ObjLoader.cpp:37+`):
`v x y z` vertices, `vt a0 a1 ...` per-vertex attributes, `g name` group
markers (ignored), `l i1 i2 ... iN` 1-based polyline index lists,
`a name0 name1 ...` attribute names. Points with any coordinate magnitude
> 1e10 are dropped (invalid-point convention, `ObjLoader.cpp:142-147`).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from linevis_tpu.core.trajectories import RaggedTrajectories

_MAX_VAL = 1.0e10


def load_trajectories_from_obj(filename: str) -> RaggedTrajectories:
    # Fast path: native C++ parser (native/loaders.cpp), ~30x faster on
    # multi-hundred-MB files; identical output (tested).
    from linevis_tpu import native

    if native.available():
        parsed = native.parse_obj(filename)
        if parsed is not None:
            positions, attributes, names = parsed
            return RaggedTrajectories(
                positions=positions, attributes=attributes, attribute_names=names
            )

    vertices: List[Tuple[float, float, float]] = []
    vertex_attrs: List[List[float]] = []
    num_attrs = 0
    attribute_names: List[str] = []
    lines_pos: List[np.ndarray] = []
    lines_att: List[np.ndarray] = []

    with open(filename, "r") as f:
        for raw in f:
            line = raw.strip()
            if not line or line[0] == "#":
                continue
            parts = line.split()
            cmd = parts[0]
            if cmd == "v":
                vertices.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif cmd == "vt":
                a = [float(x) for x in parts[1:]]
                num_attrs = len(a)
                vertex_attrs.append(a)
            elif cmd == "a":
                if not attribute_names:
                    attribute_names = parts[1:]
            elif cmd == "l":
                idx = np.array([int(x) - 1 for x in parts[1:]], np.int64)
                pos = np.asarray(vertices, np.float32)[idx]
                keep = np.all(np.abs(pos) <= _MAX_VAL, axis=1)
                pos = pos[keep]
                if num_attrs:
                    att = np.asarray(vertex_attrs, np.float32)[idx][keep].T
                else:
                    att = np.zeros((0, pos.shape[0]), np.float32)
                lines_pos.append(pos)
                lines_att.append(att)
            # 'g', 'vn', others: ignored (matches reference behavior)

    return RaggedTrajectories(
        positions=lines_pos, attributes=lines_att, attribute_names=attribute_names
    )
