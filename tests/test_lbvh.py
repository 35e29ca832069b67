"""Linear (Morton) BVH build + traversal — reference
`src/LineData/TrianglePayload/NodesBVHTreePayload.cpp:474-521` /
`submodules/bvh`, LINEAR_BVH builder of DeferredModes.hpp:79-92."""

import pytest
import numpy as np
import jax.numpy as jnp

from linevis_tpu.ops.lbvh import build_lbvh, morton_codes, ray_query


def _boxes(n, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    h = rng.uniform(0.01, 0.08, (n, 3)).astype(np.float32)
    return c - h, c + h


def test_morton_codes_order_locality():
    """Morton codes sort spatially: nearby points get nearby codes."""
    pts = np.array(
        [[0.0, 0.0, 0.0], [0.01, 0.0, 0.0], [0.99, 0.99, 0.99]],
        np.float32,
    )
    codes = np.asarray(morton_codes(jnp.asarray(pts)))
    assert abs(int(codes[0]) - int(codes[1])) < abs(
        int(codes[0]) - int(codes[2])
    )


def test_lbvh_structure_valid():
    """Every internal node's AABB contains its children; every leaf is
    reachable exactly once from the root (Karras 2012 invariants)."""
    for n in (2, 5, 64, 300):
        amin, amax = _boxes(n, seed=n)
        bvh = build_lbvh(jnp.asarray(amin), jnp.asarray(amax))
        nm = np.asarray(bvh.node_min)
        nM = np.asarray(bvh.node_max)
        L = np.asarray(bvh.left)
        R = np.asarray(bvh.right)
        for i in range(n - 1):
            for ch in (L[i], R[i]):
                assert (nm[i] <= nm[ch] + 1e-6).all()
                assert (nM[i] >= nM[ch] - 1e-6).all()
        seen = []
        stack = [0]
        guard = 0
        while stack and guard < 10 * n:
            guard += 1
            nd = stack.pop()
            if nd >= n - 1:
                seen.append(nd)
                continue
            stack += [int(L[nd]), int(R[nd])]
        assert sorted(seen) == list(range(n - 1, 2 * n - 1))
        # Leaf permutation covers all primitives.
        assert sorted(np.asarray(bvh.leaf_prim).tolist()) == list(range(n))


def test_ray_query_matches_brute_force():
    n = 300
    amin, amax = _boxes(n, seed=2)
    bvh = build_lbvh(jnp.asarray(amin), jnp.asarray(amax))
    rng = np.random.default_rng(3)
    R = 128
    o = rng.uniform(-3, -2, (R, 3)).astype(np.float32)
    d = rng.uniform(0.2, 1, (R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t, prim = ray_query(bvh, jnp.asarray(o), jnp.asarray(d))
    t = np.asarray(t)
    prim = np.asarray(prim)

    inv = 1.0 / d
    misses = hits = 0
    for r in range(R):
        t0 = (amin - o[r]) * inv[r]
        t1 = (amax - o[r]) * inv[r]
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        ts = np.where(tf >= np.maximum(tn, 0), np.maximum(tn, 0), np.inf)
        bt = ts.min()
        if np.isfinite(bt):
            hits += 1
            assert abs(t[r] - bt) < 1e-4, (r, t[r], bt)
        else:
            misses += 1
            assert prim[r] == -1
    assert hits > 10


def test_ray_query_custom_primitive_fn():
    """Closest-hit with an analytic sphere test inside each leaf (the
    reference's AABBs+analytic RT geometry mode, VulkanRayTracer.hpp:
    53-63)."""
    rng = np.random.default_rng(5)
    n = 64
    c = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    r = rng.uniform(0.02, 0.08, (n,)).astype(np.float32)
    amin = c - r[:, None]
    amax = c + r[:, None]
    bvh = build_lbvh(jnp.asarray(amin), jnp.asarray(amax))
    cj = jnp.asarray(c)
    rj = jnp.asarray(r)

    def sphere_hit(prim, o, d):
        oc = o - cj[prim]
        b = jnp.dot(oc, d)
        disc = b * b - (jnp.dot(oc, oc) - rj[prim] ** 2)
        t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        return jnp.where((disc >= 0) & (t > 0), t, jnp.inf)

    R = 64
    o = rng.uniform(-3, -2, (R, 3)).astype(np.float32)
    d = rng.uniform(0.2, 1, (R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t, prim = ray_query(bvh, jnp.asarray(o), jnp.asarray(d),
                        prim_hit_fn=sphere_hit)
    t = np.asarray(t)
    prim = np.asarray(prim)
    # Brute force spheres.
    for q in range(R):
        oc = o[q][None] - c
        b = (oc * d[q][None]).sum(-1)
        disc = b * b - ((oc * oc).sum(-1) - r ** 2)
        ts = np.where(disc >= 0, -b - np.sqrt(np.maximum(disc, 0)), np.inf)
        ts = np.where(ts > 0, ts, np.inf)
        bt = ts.min()
        if np.isfinite(bt):
            assert abs(t[q] - bt) < 1e-4
            assert prim[q] == ts.argmin()
        else:
            assert prim[q] == -1


def test_binned_sah_builder_matches_linear():
    """SAH builder (NodesBVHTreePayload.cpp:474-521 builder-quality
    option) returns the same closest hits as the Morton LBVH and a valid
    preorder topology."""
    from linevis_tpu.ops.lbvh import build_bvh_sah

    n = 300
    amin, amax = _boxes(n, seed=7)
    sah = build_bvh_sah(amin, amax)
    lin = build_lbvh(jnp.asarray(amin), jnp.asarray(amax))

    # Topology: preorder internal ids, every node referenced exactly once,
    # leaf permutation is a bijection.
    left = np.asarray(sah.left)
    right = np.asarray(sah.right)
    seen = np.zeros(2 * n - 1, bool)
    seen[0] = True
    for i in range(n - 1):
        assert left[i] > i and right[i] > i
        assert not seen[left[i]] and not seen[right[i]]
        seen[left[i]] = True
        seen[right[i]] = True
    assert seen.all()
    assert sorted(np.asarray(sah.leaf_prim).tolist()) == list(range(n))
    # Parent bounds contain child bounds.
    nm = np.asarray(sah.node_min)
    nx = np.asarray(sah.node_max)
    for i in range(n - 1):
        for ch in (left[i], right[i]):
            assert (nm[i] <= nm[ch] + 1e-6).all()
            assert (nx[i] >= nx[ch] - 1e-6).all()

    rng = np.random.default_rng(11)
    R = 96
    o = rng.uniform(-3, -2, (R, 3)).astype(np.float32)
    d = rng.uniform(0.2, 1, (R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t1, p1 = ray_query(sah, jnp.asarray(o), jnp.asarray(d))
    t2, p2 = ray_query(lin, jnp.asarray(o), jnp.asarray(d))
    t1, p1, t2, p2 = map(np.asarray, (t1, p1, t2, p2))
    assert ((p1 >= 0) == (p2 >= 0)).all()
    hit = p1 >= 0
    assert np.allclose(t1[hit], t2[hit], atol=1e-4)


@pytest.mark.parametrize("builder", ["sweep_sah", "ploc"])
def test_quality_builders_match_linear(builder):
    """Sweep-SAH and PLOC builders (the remaining two of the reference's
    4-builder set, NodesBVHTreePayload.cpp:474-521) return the same
    closest hits as the Morton LBVH and a valid preorder topology."""
    from linevis_tpu.ops.lbvh import build_bvh_ploc, build_bvh_sweep_sah

    fn = {"sweep_sah": build_bvh_sweep_sah, "ploc": build_bvh_ploc}[builder]
    n = 300
    amin, amax = _boxes(n, seed=13)
    bvh = fn(amin, amax)
    lin = build_lbvh(jnp.asarray(amin), jnp.asarray(amax))

    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    seen = np.zeros(2 * n - 1, bool)
    seen[0] = True
    for i in range(n - 1):
        assert left[i] > i and right[i] > i
        assert not seen[left[i]] and not seen[right[i]]
        seen[left[i]] = True
        seen[right[i]] = True
    assert seen.all()
    assert sorted(np.asarray(bvh.leaf_prim).tolist()) == list(range(n))
    nm = np.asarray(bvh.node_min)
    nx = np.asarray(bvh.node_max)
    for i in range(n - 1):
        for ch in (left[i], right[i]):
            assert (nm[i] <= nm[ch] + 1e-6).all()
            assert (nx[i] >= nx[ch] - 1e-6).all()

    rng = np.random.default_rng(29)
    R = 96
    o = rng.uniform(-3, -2, (R, 3)).astype(np.float32)
    d = rng.uniform(0.2, 1, (R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t1, p1 = ray_query(bvh, jnp.asarray(o), jnp.asarray(d))
    t2, p2 = ray_query(lin, jnp.asarray(o), jnp.asarray(d))
    t1, p1, t2, p2 = map(np.asarray, (t1, p1, t2, p2))
    assert ((p1 >= 0) == (p2 >= 0)).all()
    hit = p1 >= 0
    assert np.allclose(t1[hit], t2[hit], atol=1e-4)

    # Single-primitive degenerate tree (ADVICE r4: must not raise).
    one = fn(amin[:1], amax[:1])
    assert np.asarray(one.leaf_prim).tolist() == [0]
