"""8-wide BVH packing for the Pallas wavefront traversal kernel.

The reference traces tubes through a hardware binary BVH
(`Data/Shaders/Renderers/RayTracing/TubeRayTracing.glsl:61-82` over the
builders of `src/LineData/TrianglePayload/NodesBVHTreePayload.cpp:
474-521`). A binary tree is the wrong shape for a TPU: each traversal
step would fetch one 32-byte node and test it against one ray. This
module collapses any binary `Lbvh` (linear Karras or binned SAH — the
builder-quality choice survives the collapse) into an **8-wide BVH**
whose node group is one `[8, 128]` float32 record:

- each ROW is one child: lanes 0-2 aabb min, 3-5 aabb max, 6 child group
  pointer (-1 for leaves), 7 leaf flag, 8-19 the full capsule payload of
  leaf children (a, ba, r, baba, attr0, dattr, cap_a, prim id), so a
  LEAF group fetch carries its geometry — no second indirection;
- a group visit is therefore ONE 4 KB contiguous DMA and the child/ray
  tests run on `[8, P]` blocks with per-child scalars as `[8, 1]`
  sublane slices and the ray wavefront on lanes — the exact shape of
  the raster kernels' candidate math (`kernels/raster_capsule_oit.py`).

Groups are emitted in BFS order (root = group 0). Padding rows get
+inf bounds (never hit) and leaf flag 0.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from linevis_tpu.ops.lbvh import Lbvh

__all__ = ["WideBvh", "pack_wide_bvh"]

# Record lane layout (per child row).
LANE_BMIN = 0  # 0-2
LANE_BMAX = 3  # 3-5
LANE_PTR = 6
LANE_LEAF = 7
LANE_A = 8  # 8-10
LANE_BA = 11  # 11-13
LANE_R = 14
LANE_BABA = 15
LANE_ATTR0 = 16
LANE_DATTR = 17
LANE_CAPA = 18
LANE_ID = 19
RECORD_LANES = 128


@dataclasses.dataclass(frozen=True)
class WideBvh:
    """groups: [n_groups * 8, 128] float32 (device-ready, C-contiguous)."""

    groups: np.ndarray
    n_groups: int


def pack_wide_bvh(
    bvh: Lbvh,
    a: np.ndarray,  # [3, S] capsule starts
    ba: np.ndarray,  # [3, S]
    radius: float,
    attr0: np.ndarray,  # [S]
    dattr: np.ndarray,  # [S]
    cap_a: np.ndarray,  # [S] chain-start cap flags
    max_width: int = 8,
) -> WideBvh:
    """Collapse a binary Lbvh into BFS-ordered 8-wide groups."""
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    node_min = np.asarray(bvh.node_min)
    node_max = np.asarray(bvh.node_max)
    leaf_prim = np.asarray(bvh.leaf_prim)
    n = leaf_prim.shape[0]
    a = np.asarray(a, np.float32)
    ba = np.asarray(ba, np.float32)
    attr0 = np.asarray(attr0, np.float32)
    dattr = np.asarray(dattr, np.float32)
    cap_a = np.asarray(cap_a, np.float32)
    baba = np.sum(ba * ba, axis=0)

    def surface(c):
        d = np.maximum(node_max[c] - node_min[c], 0.0)
        return float(d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    def is_leaf(c):
        return c >= n - 1

    def expand(root):
        """Pick <= max_width binary subtree roots under `root` by
        repeatedly expanding the largest-surface internal child —
        the standard binary->wide collapse rule."""
        ch = [root]
        while len(ch) < max_width:
            ints = [c for c in ch if not is_leaf(c)]
            if not ints:
                break
            c = max(ints, key=surface)
            ch.remove(c)
            ch.append(int(left[c]))
            ch.append(int(right[c]))
        return ch

    # Root: with one primitive the tree is a single leaf node (id 0 ==
    # n - 1 boundary); treat it as a one-child group.
    root = 0
    groups = []  # list of child lists (binary node ids)
    ptrs = []  # parallel: per child, group index or -1
    queue = [root]
    gid_of = {}
    while queue:
        r = queue.pop(0)
        if is_leaf(r) and n > 1:
            raise AssertionError("leaf enqueued as group root")
        ch = [r] if n == 1 else expand(r)
        ptr_row = []
        for c in ch:
            if is_leaf(c):
                ptr_row.append(-1)
            else:
                gid_of[c] = len(groups) + len(queue) + 1
                ptr_row.append(gid_of[c])
                queue.append(c)
        groups.append(ch)
        ptrs.append(ptr_row)

    n_groups = len(groups)
    rec = np.zeros((n_groups * 8, RECORD_LANES), np.float32)
    # Padding rows: bmin == bmax == +inf makes the slab test miss every
    # ray regardless of direction sign (an inverted [-inf, +inf] box
    # would HIT — per-axis min/max in the slab test erases inversion).
    rec[:, LANE_BMIN:LANE_BMIN + 3] = np.inf
    rec[:, LANE_BMAX:LANE_BMAX + 3] = np.inf
    rec[:, LANE_PTR] = -1.0
    for g, (ch, ptr_row) in enumerate(zip(groups, ptrs)):
        for j, (c, ptr) in enumerate(zip(ch, ptr_row)):
            row = rec[g * 8 + j]
            row[LANE_BMIN:LANE_BMIN + 3] = node_min[c]
            row[LANE_BMAX:LANE_BMAX + 3] = node_max[c]
            row[LANE_PTR] = float(ptr)
            if is_leaf(c) or n == 1:
                p = int(leaf_prim[c - (n - 1)]) if n > 1 else int(leaf_prim[0])
                row[LANE_LEAF] = 1.0
                row[LANE_A:LANE_A + 3] = a[:, p]
                row[LANE_BA:LANE_BA + 3] = ba[:, p]
                row[LANE_R] = radius
                row[LANE_BABA] = baba[p]
                row[LANE_ATTR0] = attr0[p]
                row[LANE_DATTR] = dattr[p]
                row[LANE_CAPA] = cap_a[p]
                row[LANE_ID] = float(p)
    return WideBvh(groups=rec, n_groups=n_groups)
