"""Principal stress line (PSL) `.dat` loaders.

Reference: `src/Loaders/StressTrajectoriesDatLoader.cpp:108-235` (v1) and
`loadStressLineHierarchyFromDat` (`:77-106`). The v1 ASCII format, per
principal-stress block:

  [psName] numLines            # psName optional; major|medium|minor
  per line:
    numPoints
    3*numPoints floats         # positions
    12*numPoints floats        # (sigma, dir.xyz) × major/medium/minor
    numPoints floats           # von Mises stress

Attributes emitted per line (reference `:165-199`): attr0 = von Mises,
attr1 = |sigma_psIdx| of the block's own principal direction.
Hierarchy `.dat`: per PS block `numLines` then one level per line.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from linevis_tpu.core.trajectories import RaggedTrajectories


@dataclasses.dataclass
class RaggedStressTrajectories:
    """One principal-stress direction's ragged line set + per-point PS data."""

    trajectories: RaggedTrajectories
    ps_index: int  # 0=major, 1=medium, 2=minor
    # per line: [P] sigma and [P, 3] direction for each of the 3 PS
    major_ps: List[np.ndarray] = dataclasses.field(default_factory=list)
    medium_ps: List[np.ndarray] = dataclasses.field(default_factory=list)
    minor_ps: List[np.ndarray] = dataclasses.field(default_factory=list)
    major_ps_dir: List[np.ndarray] = dataclasses.field(default_factory=list)
    medium_ps_dir: List[np.ndarray] = dataclasses.field(default_factory=list)
    minor_ps_dir: List[np.ndarray] = dataclasses.field(default_factory=list)
    hierarchy_levels: List[List[float]] = dataclasses.field(default_factory=list)


class _TokenReader:
    """Line-oriented whitespace-token reader (mirrors sgl::LineReader)."""

    def __init__(self, filename: str):
        with open(filename, "r") as f:
            self.lines = [ln.split() for ln in f if ln.strip()]
        self.idx = 0

    def is_line_left(self) -> bool:
        return self.idx < len(self.lines)

    def vector_line(self) -> List[str]:
        toks = self.lines[self.idx]
        self.idx += 1
        return toks

    def floats_line(self, expected: int) -> np.ndarray:
        """Read tokens across lines until `expected` floats are collected."""
        out: List[str] = []
        while len(out) < expected:
            out.extend(self.lines[self.idx])
            self.idx += 1
        return np.array(out[:expected], np.float32)

    def scalar_line(self) -> str:
        toks = self.vector_line()
        return toks[0]


_PS_NAMES = {"major": 0, "medium": 1, "minor": 2}


def load_stress_trajectories_from_dat_v1(
    filenames_trajectories: Sequence[str],
    filenames_hierarchy: Sequence[str] = (),
) -> Tuple[List[int], List[RaggedStressTrajectories]]:
    """Returns (loaded_ps_indices, per-PS ragged stress trajectories)."""
    result: List[RaggedStressTrajectories] = []
    loaded_ps_indices: List[int] = []
    ps_idx = 0
    for filename in filenames_trajectories:
        reader = _TokenReader(filename)
        while reader.is_line_left():
            info = reader.vector_line()
            if len(info) == 1:
                num_lines = int(info[0])
            elif len(info) == 2:
                num_lines = int(info[1])
                name = info[0].lower()
                for key, val in _PS_NAMES.items():
                    if name.endswith(key):
                        loaded_ps_indices.append(val)
                        break
                else:
                    raise ValueError(f"Invalid PS identifier {info[0]!r}")
            else:
                raise ValueError(f"Invalid line metadata in {filename}")
            block = RaggedStressTrajectories(
                trajectories=RaggedTrajectories(
                    [], [], ["von Mises Stress", "Principal Stress Magnitude"]
                ),
                ps_index=ps_idx,
            )
            for _ in range(num_lines):
                n = int(reader.scalar_line())
                pos = reader.floats_line(n * 3).reshape(n, 3)
                ps = reader.floats_line(n * 12).reshape(n, 12)
                von_mises = reader.floats_line(n)
                block.trajectories.positions.append(pos)
                block.major_ps.append(ps[:, 0])
                block.major_ps_dir.append(ps[:, 1:4])
                block.medium_ps.append(ps[:, 4])
                block.medium_ps_dir.append(ps[:, 5:8])
                block.minor_ps.append(ps[:, 8])
                block.minor_ps_dir.append(ps[:, 9:12])
                own = [block.major_ps, block.medium_ps, block.minor_ps][ps_idx][-1]
                block.trajectories.attributes.append(
                    np.stack([von_mises, np.abs(own)]).astype(np.float32)
                )
            result.append(block)
            ps_idx += 1

    if filenames_hierarchy:
        _load_hierarchy(filenames_hierarchy, result)
    if not loaded_ps_indices and len(result) == 3:
        loaded_ps_indices = [0, 1, 2]
    for i, block in enumerate(result):
        if i < len(loaded_ps_indices):
            block.ps_index = loaded_ps_indices[i]
    return loaded_ps_indices, result


def _load_hierarchy(
    filenames: Sequence[str], blocks: List[RaggedStressTrajectories]
) -> None:
    ps_idx = 0
    for filename in filenames:
        reader = _TokenReader(filename)
        while reader.is_line_left():
            info = reader.vector_line()
            num_lines = int(info[-1])
            block = blocks[ps_idx]
            for line_idx in range(num_lines):
                level = float(reader.scalar_line())
                while len(block.hierarchy_levels) <= line_idx:
                    block.hierarchy_levels.append([])
                block.hierarchy_levels[line_idx].append(level)
            ps_idx += 1
