"""Linear BVH (Morton radix tree) over primitive AABBs.

Port of the reference's BVH payload (`src/LineData/TrianglePayload/
NodesBVHTreePayload.cpp:474-521` building over `submodules/bvh`
(madmann91/bvh); builder enum `src/Renderers/Deferred/DeferredModes.hpp:
79-92` — Binned SAH / Sweep SAH / LOC / LINEAR (Morton) BVH).  The TPU
rebuild implements the LINEAR builder — the one the reference uses for
GPU-driven culling queues — as a fully data-parallel Karras 2012 radix
tree: every step (Morton codes, sort, per-node range search, split, and
range-min/max bounds) is a vmapped O(log N) primitive, so the whole
build is a handful of XLA kernels with no sequential host loop.

Layout (N leaves, N-1 internal nodes):
* leaves occupy ids [N-1, 2N-2] in sorted-Morton order,
* internal node i covers the contiguous sorted-leaf range
  [first[i], last[i]]; bounds come from an O(N log N) sparse-table
  range min/max, not a bottom-up traversal (no scatter dependencies).

`ray_query` is a classic stack-based closest-hit traversal inside
`lax.while_loop`, vmapped over the ray wavefront — the same consumer
shape as the reference's GPU queue traversal
(`Deferred/Tree/NodesBVHDrawCountPass`).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Lbvh", "morton_codes", "build_lbvh", "ray_query"]


def _expand_bits(v):
    """Spread 10 bits to every 3rd position (standard Morton helper)."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton_codes(points: jnp.ndarray) -> jnp.ndarray:
    """[N, 3] points in [0,1]^3 -> 30-bit Morton codes [N] (uint32)."""
    q = jnp.clip(points * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return (
        (_expand_bits(q[:, 0]) << 2)
        | (_expand_bits(q[:, 1]) << 1)
        | _expand_bits(q[:, 2])
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Lbvh:
    """Radix-tree BVH. Internal nodes [0, N-2], leaves [N-1, 2N-2]."""

    left: jnp.ndarray  # [N-1] child node id
    right: jnp.ndarray  # [N-1]
    node_min: jnp.ndarray  # [2N-1, 3]
    node_max: jnp.ndarray  # [2N-1, 3]
    leaf_prim: jnp.ndarray  # [N] sorted-leaf -> original primitive index


def _delta_fn(codes):
    """delta(i, j): common-prefix length of the (code, index) pairs —
    Karras 2012 §4's index tie-break, realized as two uint32 levels
    (uint64 is unavailable without x64)."""
    n = codes.shape[0]

    def delta(i, j):
        valid = (j >= 0) & (j < n)
        jc = jnp.clip(j, 0, n - 1)
        x = codes[i] ^ codes[jc]
        ix = (i.astype(jnp.uint32) ^ jc.astype(jnp.uint32))
        lz = jnp.where(
            x == 0,
            32 + (32 - _bit_length(ix)),
            32 - _bit_length(x),
        )
        return jnp.where(valid, lz, -1)

    return delta


def _bit_length(x):
    """Highest set bit position + 1 for uint64 (0 -> 0)."""
    r = jnp.zeros(x.shape, jnp.int32)
    for s in (32, 16, 8, 4, 2, 1):
        hi = x >> s
        has = hi > 0
        r = r + jnp.where(has, s, 0)
        x = jnp.where(has, hi, x)
    return r + (x > 0).astype(jnp.int32)


@partial(jax.jit)
def build_lbvh(aabb_min: jnp.ndarray, aabb_max: jnp.ndarray) -> Lbvh:
    """Build from per-primitive AABBs [N, 3] (N >= 2)."""
    n = aabb_min.shape[0]
    centroid = 0.5 * (aabb_min + aabb_max)
    lo = jnp.min(aabb_min, axis=0)
    hi = jnp.max(aabb_max, axis=0)
    unit = (centroid - lo) / jnp.maximum(hi - lo, 1e-12)
    codes = morton_codes(unit)
    order = jnp.argsort(codes)
    codes_s = codes[order]
    delta = _delta_fn(codes_s)

    n_bits = int(np.ceil(np.log2(max(n, 2)))) + 1

    def node_range(i):
        d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
        dmin = delta(i, i - d)

        # Exponential upper bound: first lmax with delta(i, i+lmax*d)
        # <= dmin (delta is non-increasing away from i, so once the
        # guard fails it stays false).
        def grow(_, l):
            return jnp.where(delta(i, i + l * d) > dmin, l * 2, l)

        lmax = jax.lax.fori_loop(0, n_bits + 2, grow, jnp.int32(2))

        # Binary search the exact length.
        def shrink(_, lt):
            l, t = lt
            l = jnp.where(
                (t > 0) & (delta(i, i + (l + t) * d) > dmin), l + t, l
            )
            return l, t // 2

        l, _ = jax.lax.fori_loop(
            0, n_bits + 1, shrink, (jnp.int32(0), lmax // 2)
        )
        j = i + l * d
        # Split position: highest differing bit inside [min(i,j), max(i,j)].
        dnode = delta(i, j)

        def split(_, st):
            s, t = st
            s = jnp.where(
                (t > 0) & (delta(i, i + (s + t) * d) > dnode), s + t, s
            )
            return s, jnp.where(t > 1, (t + 1) // 2, 0)

        s, _ = jax.lax.fori_loop(
            0, n_bits + 1, split, (jnp.int32(0), (l + 1) // 2)
        )
        gamma = i + s * d + jnp.minimum(d, 0)
        first = jnp.minimum(i, j)
        last = jnp.maximum(i, j)
        left = jnp.where(first == gamma, (n - 1) + gamma, gamma)
        right = jnp.where(last == gamma + 1, (n - 1) + gamma + 1, gamma + 1)
        return left, right, first, last

    idx = jnp.arange(n - 1)
    left, right, first, last = jax.vmap(node_range)(idx)

    # Bounds: sparse-table range min/max over sorted leaf AABBs.
    lmin = aabb_min[order]
    lmax_ = aabb_max[order]
    levels_min = [lmin]
    levels_max = [lmax_]
    j = 1
    while j < n:
        prev_min = levels_min[-1]
        prev_max = levels_max[-1]
        shift_min = jnp.concatenate([prev_min[j:], prev_min[-j:]], axis=0)
        shift_max = jnp.concatenate([prev_max[j:], prev_max[-j:]], axis=0)
        levels_min.append(jnp.minimum(prev_min, shift_min))
        levels_max.append(jnp.maximum(prev_max, shift_max))
        j *= 2

    levels_min_arr = jnp.stack(levels_min)  # [L, N, 3]
    levels_max_arr = jnp.stack(levels_max)

    def range_bounds(a, b):
        ln = b - a + 1
        k = _bit_length(ln.astype(jnp.uint32)) - 1
        k = jnp.clip(k, 0, len(levels_min) - 1)
        sz = (jnp.int32(1) << k)
        b2 = jnp.maximum(b - sz + 1, 0)
        bmin = jnp.minimum(levels_min_arr[k, a], levels_min_arr[k, b2])
        bmax = jnp.maximum(levels_max_arr[k, a], levels_max_arr[k, b2])
        return bmin, bmax

    int_min, int_max = jax.vmap(range_bounds)(first, last)
    node_min = jnp.concatenate([int_min, lmin], axis=0)
    node_max = jnp.concatenate([int_max, lmax_], axis=0)
    return Lbvh(
        left=left, right=right, node_min=node_min, node_max=node_max,
        leaf_prim=order,
    )


def _ray_aabb(o, inv_d, bmin, bmax, t_best, t_min=None):
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tn = jnp.max(jnp.minimum(t0, t1))
    tf = jnp.min(jnp.maximum(t0, t1))
    hit = (tf >= jnp.maximum(tn, 0.0)) & (tn <= t_best)
    if t_min is not None:
        hit = hit & (tf >= t_min)
    return hit


@partial(jax.jit, static_argnames=("prim_hit_fn", "max_stack"))
def ray_query(
    bvh: Lbvh,
    origins: jnp.ndarray,  # [R, 3]
    directions: jnp.ndarray,  # [R, 3]
    prim_hit_fn=None,  # (prim_idx, o, d) -> t (inf on miss); None: AABB t
    max_stack: int = 64,
    t_min: jnp.ndarray = None,  # [R] enumerate hits with (t, prim) >
    prim_min: jnp.ndarray = None,  # [R] ... lexicographically (t_min, prim_min)
):
    """Closest-hit traversal -> (t [R], prim [R], int32; -1 on miss).

    With `t_min`/`prim_min` given, returns the closest hit STRICTLY
    lexicographically after (t_min, prim_min): repeated queries from a
    FIXED origin enumerate every surface along the ray in (t, prim) order
    with no re-cast epsilon — coincident surfaces of different primitives
    are enumerated too, which the transparent ray tracer needs for its
    tie-window dedup (the reference's iterative re-cast loop,
    TubeRayTracing.glsl:61-82, achieves this with a tMin offset instead).
    `prim_hit_fn` is then called as (prim, o, d, t_min, prim_min) and must
    itself honor the lexicographic lower bound among its surfaces.
    """
    n = bvh.leaf_prim.shape[0]
    enumerate_mode = t_min is not None
    if enumerate_mode and prim_min is None:
        raise ValueError("t_min requires prim_min")

    def query_one(o, d, *bounds):
        inv_d = jnp.where(jnp.abs(d) < 1e-12, 1e12 * jnp.sign(d + 1e-30),
                          1.0 / d)
        tmin1 = bounds[0] if enumerate_mode else None
        stack = jnp.zeros((max_stack,), jnp.int32)
        state = (jnp.int32(1), stack.at[0].set(0), jnp.float32(jnp.inf),
                 jnp.int32(-1))

        def cond(s):
            return s[0] > 0

        def body(s):
            sp, stack, t_best, best = s
            node = stack[sp - 1]
            sp = sp - 1
            is_leaf = node >= (n - 1)
            hit_box = _ray_aabb(
                o, inv_d, bvh.node_min[node], bvh.node_max[node], t_best,
                t_min=tmin1,
            )

            # Leaf: run the primitive test.
            prim = bvh.leaf_prim[jnp.clip(node - (n - 1), 0, n - 1)]
            if prim_hit_fn is not None:
                if enumerate_mode:
                    t_leaf = prim_hit_fn(prim, o, d, bounds[0], bounds[1])
                else:
                    t_leaf = prim_hit_fn(prim, o, d)
            else:
                t0 = (bvh.node_min[node] - o) * inv_d
                t1 = (bvh.node_max[node] - o) * inv_d
                t_leaf = jnp.maximum(jnp.max(jnp.minimum(t0, t1)), 0.0)
            closer = t_leaf < t_best
            if enumerate_mode:
                # Ties on t resolve to the smallest prim id (the matching
                # upper-bound rule to the hit fn's (t, prim) lower bound).
                closer = closer | ((t_leaf == t_best) & jnp.isfinite(t_leaf)
                                   & (prim < best))
            leaf_take = is_leaf & hit_box & closer
            t_best = jnp.where(leaf_take, t_leaf, t_best)
            best = jnp.where(leaf_take, prim, best)

            # Internal: push children.
            ni = jnp.clip(node, 0, n - 2)
            push = (~is_leaf) & hit_box
            stack = stack.at[jnp.where(push, sp, max_stack - 1)].set(
                jnp.where(push, bvh.left[ni], stack[max_stack - 1])
            )
            sp = sp + push.astype(jnp.int32)
            stack = stack.at[jnp.where(push, sp, max_stack - 1)].set(
                jnp.where(push, bvh.right[ni], stack[max_stack - 1])
            )
            sp = sp + push.astype(jnp.int32)
            return (sp, stack, t_best, best)

        _, _, t_best, best = jax.lax.while_loop(cond, body, state)
        best = jnp.where(jnp.isfinite(t_best), best, -1)
        return t_best, best

    if enumerate_mode:
        return jax.vmap(query_one)(origins, directions, t_min, prim_min)
    return jax.vmap(query_one)(origins, directions)


def build_bvh_sah(aabb_min, aabb_max, num_bins: int = 16) -> Lbvh:
    """Binned-SAH top-down builder (host-side numpy), same `Lbvh` layout.

    The reference offers four builder qualities (Binned SAH / Sweep SAH /
    LOC / Linear, `src/LineData/TrianglePayload/NodesBVHTreePayload.cpp:
    474-521` over madmann91/bvh; enum `src/Renderers/Deferred/
    DeferredModes.hpp:79-92`) and builds them ON THE CPU — so does this
    one: a scene-build-time operation, not a per-frame kernel. Topology
    matches `build_lbvh` (N single-primitive leaves at ids [N-1, 2N-2]
    over a leaf permutation, N-1 internal nodes, internal ids in preorder
    so every child id exceeds its parent's), and `leaf_prim` carries the
    permutation — `ray_query` and the transparent ray tracer consume
    either builder unchanged.

    Split rule per node: `num_bins` uniform centroid bins on the largest
    (then every) axis, take the partition minimizing
    SA_L*N_L + SA_R*N_R; median split when binning degenerates.
    """
    amin = np.asarray(aabb_min, np.float32)
    amax = np.asarray(aabb_max, np.float32)
    n = amin.shape[0]
    if n == 0:
        raise ValueError("need >= 1 primitive")
    if n == 1:
        # Degenerate single-leaf tree (node 0 IS the leaf: `ray_query`
        # treats node >= n-1 = 0 as a leaf), matching what the linear
        # builder produces for one-primitive scenes.
        return Lbvh(
            left=jnp.zeros((0,), jnp.int32),
            right=jnp.zeros((0,), jnp.int32),
            node_min=jnp.asarray(amin),
            node_max=jnp.asarray(amax),
            leaf_prim=jnp.zeros((1,), jnp.int32),
        )
    cent = 0.5 * (amin + amax)

    left = np.zeros((n - 1,), np.int32)
    right = np.zeros((n - 1,), np.int32)
    node_min = np.zeros((2 * n - 1, 3), np.float32)
    node_max = np.zeros((2 * n - 1, 3), np.float32)
    perm = np.arange(n, dtype=np.int32)

    def surface(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                + d[..., 2] * d[..., 0])

    def split_range(lo, hi):
        """Partition perm[lo:hi]; returns mid (lo < mid < hi)."""
        idx = perm[lo:hi]
        c = cent[idx]
        clo = c.min(axis=0)
        chi = c.max(axis=0)
        ext = chi - clo
        best = None  # (cost, axis, bin_j)
        for ax in np.argsort(-ext):
            if ext[ax] <= 1e-12:
                continue
            rel = (c[:, ax] - clo[ax]) / ext[ax]
            b = np.minimum((rel * num_bins).astype(np.int32), num_bins - 1)
            counts = np.bincount(b, minlength=num_bins)
            if int((counts > 0).sum()) < 2:
                continue
            binmin = np.full((num_bins, 3), np.inf, np.float32)
            binmax = np.full((num_bins, 3), -np.inf, np.float32)
            np.minimum.at(binmin, b, amin[idx])
            np.maximum.at(binmax, b, amax[idx])
            lc = np.cumsum(counts)[:-1]
            rc = (hi - lo) - lc
            lmin = np.minimum.accumulate(binmin, axis=0)[:-1]
            lmax = np.maximum.accumulate(binmax, axis=0)[:-1]
            rmin = np.minimum.accumulate(binmin[::-1], axis=0)[::-1][1:]
            rmax = np.maximum.accumulate(binmax[::-1], axis=0)[::-1][1:]
            ok = (lc > 0) & (rc > 0)
            cost = np.where(
                ok, surface(lmin, lmax) * lc + surface(rmin, rmax) * rc,
                np.inf,
            )
            j = int(np.argmin(cost))
            if np.isfinite(cost[j]) and (best is None or cost[j] < best[0]):
                best = (float(cost[j]), int(ax), j)
        if best is None:
            return lo + (hi - lo) // 2
        _, ax, j = best
        rel = (c[:, ax] - clo[ax]) / ext[ax]
        b = np.minimum((rel * num_bins).astype(np.int32), num_bins - 1)
        go_left = b <= j
        order = np.argsort(~go_left, kind="stable")
        perm[lo:hi] = idx[order]
        mid = lo + int(go_left.sum())
        if mid == lo or mid == hi:
            mid = lo + (hi - lo) // 2
        return mid

    def child_id(lo, hi, next_internal):
        if hi - lo == 1:
            return (n - 1) + lo, next_internal
        return next_internal, next_internal + 1

    # Iterative DFS; internal ids in preorder (parent < children).
    next_internal = 1  # root = 0
    stack = [(0, 0, n)]
    while stack:
        my_id, lo, hi = stack.pop()
        mid = split_range(lo, hi)
        lid, next_internal = child_id(lo, mid, next_internal)
        rid, next_internal = child_id(mid, hi, next_internal)
        left[my_id] = lid
        right[my_id] = rid
        if mid - lo > 1:
            stack.append((lid, lo, mid))
        if hi - mid > 1:
            stack.append((rid, mid, hi))

    # Bounds: leaves from the final permutation, then internal nodes in
    # reverse id order (preorder ids => children already resolved).
    node_min[n - 1:] = amin[perm]
    node_max[n - 1:] = amax[perm]
    for i in range(n - 2, -1, -1):
        node_min[i] = np.minimum(node_min[left[i]], node_min[right[i]])
        node_max[i] = np.maximum(node_max[left[i]], node_max[right[i]])

    return Lbvh(
        left=jnp.asarray(left),
        right=jnp.asarray(right),
        node_min=jnp.asarray(node_min),
        node_max=jnp.asarray(node_max),
        leaf_prim=jnp.asarray(perm),
    )


def _surface_np(mn, mx):
    d = np.maximum(mx - mn, 0.0)
    return (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
            + d[..., 2] * d[..., 0])


def _topdown_from_split(amin, amax, perm, split_range):
    """Shared top-down scaffolding (iterative DFS, preorder internal ids,
    bounds fill) for host-side builders — `split_range(lo, hi)` partitions
    `perm[lo:hi]` in place and returns mid (lo < mid < hi)."""
    n = amin.shape[0]
    left = np.zeros((n - 1,), np.int32)
    right = np.zeros((n - 1,), np.int32)
    node_min = np.zeros((2 * n - 1, 3), np.float32)
    node_max = np.zeros((2 * n - 1, 3), np.float32)

    def child_id(lo, hi, next_internal):
        if hi - lo == 1:
            return (n - 1) + lo, next_internal
        return next_internal, next_internal + 1

    next_internal = 1
    stack = [(0, 0, n)]
    while stack:
        my_id, lo, hi = stack.pop()
        mid = split_range(lo, hi)
        lid, next_internal = child_id(lo, mid, next_internal)
        rid, next_internal = child_id(mid, hi, next_internal)
        left[my_id] = lid
        right[my_id] = rid
        if mid - lo > 1:
            stack.append((lid, lo, mid))
        if hi - mid > 1:
            stack.append((rid, mid, hi))

    node_min[n - 1:] = amin[perm]
    node_max[n - 1:] = amax[perm]
    for i in range(n - 2, -1, -1):
        node_min[i] = np.minimum(node_min[left[i]], node_min[right[i]])
        node_max[i] = np.maximum(node_max[left[i]], node_max[right[i]])
    return Lbvh(
        left=jnp.asarray(left),
        right=jnp.asarray(right),
        node_min=jnp.asarray(node_min),
        node_max=jnp.asarray(node_max),
        leaf_prim=jnp.asarray(perm),
    )


def build_bvh_sweep_sah(aabb_min, aabb_max) -> Lbvh:
    """Full-sweep SAH builder (host-side), same `Lbvh` layout.

    The reference's highest-quality CPU builder option ("Sweep SAH" of
    `src/LineData/TrianglePayload/NodesBVHTreePayload.cpp:474-521` over
    madmann91/bvh): per node, primitives are SORTED by centroid on each
    axis and the exact SAH cost SA_L*N_L + SA_R*N_R is evaluated at EVERY
    split position via prefix/suffix bound sweeps — no binning error.
    O(n log^2 n) vs binned's O(n log n); best tree quality of the
    top-down family.
    """
    amin = np.asarray(aabb_min, np.float32)
    amax = np.asarray(aabb_max, np.float32)
    n = amin.shape[0]
    if n == 0:
        raise ValueError("need >= 1 primitive")
    if n == 1:
        return Lbvh(
            left=jnp.zeros((0,), jnp.int32),
            right=jnp.zeros((0,), jnp.int32),
            node_min=jnp.asarray(amin),
            node_max=jnp.asarray(amax),
            leaf_prim=jnp.zeros((1,), jnp.int32),
        )
    cent = 0.5 * (amin + amax)
    perm = np.arange(n, dtype=np.int32)

    def split_range(lo, hi):
        idx = perm[lo:hi]
        m = hi - lo
        best = None  # (cost, axis, i, order)
        for ax in range(3):
            order = np.argsort(cent[idx, ax], kind="stable")
            o_idx = idx[order]
            pmin = np.minimum.accumulate(amin[o_idx], axis=0)[:-1]
            pmax = np.maximum.accumulate(amax[o_idx], axis=0)[:-1]
            smin = np.minimum.accumulate(amin[o_idx][::-1], axis=0)[::-1][1:]
            smax = np.maximum.accumulate(amax[o_idx][::-1], axis=0)[::-1][1:]
            counts = np.arange(1, m, dtype=np.float64)
            cost = (_surface_np(pmin, pmax) * counts
                    + _surface_np(smin, smax) * (m - counts))
            i = int(np.argmin(cost))
            if best is None or cost[i] < best[0]:
                best = (float(cost[i]), ax, i, order)
        _, ax, i, order = best
        perm[lo:hi] = idx[order]
        return lo + i + 1

    return _topdown_from_split(amin, amax, perm, split_range)


def build_bvh_ploc(aabb_min, aabb_max, search_radius: int = 16) -> Lbvh:
    """PLOC (parallel locally-ordered clustering) builder, `Lbvh` layout.

    The reference's "Locally-Ordered Clustering" builder option
    (`NodesBVHTreePayload.cpp:474-521` over madmann91/bvh, Meister &
    Bittner 2018): leaves are Morton-sorted, then clusters repeatedly
    merge with their nearest neighbor (minimal merged surface area)
    within a +-`search_radius` window; mutual nearest pairs merge each
    round. Bottom-up agglomerative topology, relabeled to this module's
    preorder id scheme.
    """
    amin = np.asarray(aabb_min, np.float32)
    amax = np.asarray(aabb_max, np.float32)
    n = amin.shape[0]
    if n == 0:
        raise ValueError("need >= 1 primitive")
    if n == 1:
        return Lbvh(
            left=jnp.zeros((0,), jnp.int32),
            right=jnp.zeros((0,), jnp.int32),
            node_min=jnp.asarray(amin),
            node_max=jnp.asarray(amax),
            leaf_prim=jnp.zeros((1,), jnp.int32),
        )
    cent = 0.5 * (amin + amax)
    lo_all = cent.min(axis=0)
    ext = np.maximum(cent.max(axis=0) - lo_all, 1e-12)
    q = np.clip(((cent - lo_all) / ext * 1023.0), 0, 1023).astype(np.uint64)

    def expand(v):
        v = (v | (v << 16)) & np.uint64(0x30000FF)
        v = (v | (v << 8)) & np.uint64(0x300F00F)
        v = (v | (v << 4)) & np.uint64(0x30C30C3)
        v = (v | (v << 2)) & np.uint64(0x9249249)
        return v

    codes = (expand(q[:, 0]) << np.uint64(2)) | (expand(q[:, 1])
             << np.uint64(1)) | expand(q[:, 2])
    order = np.argsort(codes, kind="stable")

    # Cluster state: temp node ids (leaves 0..n-1, internals n..2n-2).
    ids = order.astype(np.int32)
    bmin = amin[order].copy()
    bmax = amax[order].copy()
    tmp_l = np.zeros((n - 1,), np.int32)
    tmp_r = np.zeros((n - 1,), np.int32)
    next_tmp = n
    while ids.shape[0] > 1:
        m = ids.shape[0]
        rad = min(search_radius, m - 1)
        best_c = np.full((m,), np.inf, np.float64)
        best_j = np.full((m,), -1, np.int64)
        for d in range(1, rad + 1):
            mm = np.minimum(bmin[:-d], bmin[d:])
            mx = np.maximum(bmax[:-d], bmax[d:])
            c = _surface_np(mm, mx)
            i = np.arange(m - d)
            upd = c < best_c[:-d]
            best_c[:-d][upd] = c[upd]
            best_j[:-d][upd] = i[upd] + d
            updr = c < best_c[d:]
            best_c[d:][updr] = c[updr]
            best_j[d:][updr] = i[updr]
        mutual = best_j[best_j] == np.arange(m)
        first = mutual & (np.arange(m) < best_j)
        keep = np.ones((m,), bool)
        new_ids = ids.copy()
        fi = np.nonzero(first)[0]
        for i in fi:  # sequential id assignment (deterministic)
            j = best_j[i]
            tmp_l[next_tmp - n] = ids[i]
            tmp_r[next_tmp - n] = ids[j]
            new_ids[i] = next_tmp
            next_tmp += 1
            keep[j] = False
        bmin[fi] = np.minimum(bmin[fi], bmin[best_j[fi]])
        bmax[fi] = np.maximum(bmax[fi], bmax[best_j[fi]])
        if not first.any():  # safety: force-merge the first pair
            tmp_l[next_tmp - n] = ids[0]
            tmp_r[next_tmp - n] = ids[1]
            new_ids[0] = next_tmp
            next_tmp += 1
            keep[1] = False
            bmin[0] = np.minimum(bmin[0], bmin[1])
            bmax[0] = np.maximum(bmax[0], bmax[1])
        ids = new_ids[keep]
        bmin = bmin[keep]
        bmax = bmax[keep]

    # Preorder relabel: internal ids 0..n-2 (parent < children), leaf
    # slots in DFS encounter order carry the primitive permutation.
    left = np.zeros((n - 1,), np.int32)
    right = np.zeros((n - 1,), np.int32)
    perm = np.zeros((n,), np.int32)
    node_min = np.zeros((2 * n - 1, 3), np.float32)
    node_max = np.zeros((2 * n - 1, 3), np.float32)
    next_internal = 1
    next_leaf = 0
    stack = [(0, int(ids[0]))]  # (new id, tmp id) — tmp root
    while stack:
        my_id, tmp = stack.pop()
        for side, arr in ((tmp_l[tmp - n], left), (tmp_r[tmp - n], right)):
            if side < n:  # leaf
                slot = (n - 1) + next_leaf
                perm[next_leaf] = side
                next_leaf += 1
                arr[my_id] = slot
            else:
                arr[my_id] = next_internal
                stack.append((next_internal, int(side)))
                next_internal += 1
    node_min[n - 1:] = amin[perm]
    node_max[n - 1:] = amax[perm]
    for i in range(n - 2, -1, -1):
        node_min[i] = np.minimum(node_min[left[i]], node_min[right[i]])
        node_max[i] = np.maximum(node_max[left[i]], node_max[right[i]])
    return Lbvh(
        left=jnp.asarray(left),
        right=jnp.asarray(right),
        node_min=jnp.asarray(node_min),
        node_max=jnp.asarray(node_max),
        leaf_prim=jnp.asarray(perm),
    )
