"""Ray-traced transparent tubes: the iterative re-cast loop.

Port of the reference's hardware ray tracer's transparency core
(`src/Renderers/RayTracing/VulkanRayTracer.*`; `Data/Shaders/Renderers/
RayTracing/TubeRayTracing.glsl:61-82`): transparency is realized by
REPEATEDLY calling traceRay from just past the last accepted hit,
blending hits front-to-back until the transmittance is saturated or
`maxDepthComplexity` casts have been made.  Geometry is the analytic
linear-swept-sphere / capsule mode (`VulkanRayTracer.hpp:53-63`,
analytic tests `RayIntersectionTestsVulkan.glsl:39-140`).

TPU-native structure: the BLAS/TLAS becomes the Karras LBVH
(`ops/lbvh.py`) over per-segment capsule AABBs; each re-cast is one
closest-hit `ray_query` with the analytic ray-capsule test as the leaf
primitive function, and the whole cast loop is a `lax.fori_loop`
vmapped over the pixel wavefront.  The tile-binned MLAB kernel remains
the FAST transparency path — this ray tracer is the reference-parity
formulation (exact unbounded-depth blending, no K-node merge) and the
cross-check oracle for it: for depth complexity <= K the two must
agree (tests/test_ray_tracer.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from linevis_tpu.ops.lbvh import build_lbvh, ray_query
from linevis_tpu.render.pipeline import RasterSettings
from linevis_tpu.render.tube_raster import CapsuleScene, _ray_basis

__all__ = [
    "build_capsule_bvh",
    "render_tubes_raytraced",
    "render_tubes_mlat",
]


def build_capsule_bvh(scene: CapsuleScene, builder: str = "linear"):
    """BVH over per-segment capsule AABBs (the BLAS role). Masked-out
    segments get far-away degenerate boxes so they never intersect.

    `builder`: "linear" (Morton radix LBVH, on-device) or one of the
    host-side quality builders "binned_sah" | "sweep_sah" | "ploc" — the
    reference's full builder-quality set (Binned SAH / Sweep SAH / LOC /
    Linear, NodesBVHTreePayload.cpp:474-521 over madmann91/bvh).
    """
    r = scene.radius
    a = scene.a
    b = scene.a + scene.ba
    lo = jnp.minimum(a, b) - r
    hi = jnp.maximum(a, b) + r
    far = jnp.float32(1e7)
    lo = jnp.where(scene.mask[None], lo, far)
    hi = jnp.where(scene.mask[None], hi, far)
    if builder in ("binned_sah", "sweep_sah", "ploc"):
        import numpy as _np

        from linevis_tpu.ops import lbvh as _lbvh

        fn = {
            "binned_sah": _lbvh.build_bvh_sah,
            "sweep_sah": _lbvh.build_bvh_sweep_sah,
            "ploc": _lbvh.build_bvh_ploc,
        }[builder]
        return fn(_np.asarray(lo.T), _np.asarray(hi.T))
    if builder != "linear":
        raise ValueError(f"unknown BVH builder {builder!r}")
    return build_lbvh(lo.T, hi.T)


def _make_capsule_surfaces(scene: CapsuleScene):
    """Shared analytic ray-capsule math (RayIntersectionTestsVulkan.glsl:
    39-140 rayTubeIntersection + sphere caps), mirroring the OIT raster's
    candidate generation EXACTLY (kernels/raster_capsule_oit.py
    surface_t): both the ENTRY and the EXIT surface of body / cap-a /
    cap-b are blendable — the reference rasterizes transparent tubes with
    backface culling off, so exits are real fragments too.

    Returns (prim, o, d, accept) -> (t_entry, t_exit), inf on miss, where
    `accept(tp)` is the caller's extra per-candidate validity predicate.
    """
    a = scene.a.T  # [S, 3]
    ba = scene.ba.T
    r = jnp.float32(scene.radius)
    cap_a = scene.cap_a
    mask = scene.mask

    def surfaces(prim, o, d, accept):
        oa = o - a[prim]
        bav = ba[prim]
        baba = jnp.dot(bav, bav)
        bard = jnp.dot(bav, d)
        baoa = jnp.dot(bav, oa)
        rd = jnp.dot(d, oa)
        oaoa = jnp.dot(oa, oa)
        rr = r * r
        k2 = jnp.maximum(baba - bard * bard, 1e-20)
        k1 = baba * rd - baoa * bard
        k0 = baba * oaoa - baoa * baoa - rr * baba
        h = k1 * k1 - k2 * k0
        sq = jnp.sqrt(jnp.maximum(h, 0.0))
        ha = rd * rd - (oaoa - rr)
        sqa = jnp.sqrt(jnp.maximum(ha, 0.0))
        b1b = rd - bard
        obob = oaoa - 2.0 * baoa + baba
        hb = b1b * b1b - (obob - rr)
        sqb = jnp.sqrt(jnp.maximum(hb, 0.0))
        big = jnp.float32(jnp.inf)

        def cand(tp, ok):
            return jnp.where(ok & accept(tp), tp, big)

        def body_ok(tp):
            y = baoa + tp * bard
            return (h >= 0.0) & (y > 0.0) & (y < baba)

        cap_a_on = cap_a[prim] > 0.5

        def capa_ok(tp):
            y = baoa + tp * bard
            return (ha >= 0.0) & (y <= 0.0) & cap_a_on

        def capb_ok(tp):
            y = baoa + tp * bard
            return (hb >= 0.0) & (y >= baba)

        def surface_t(s_):
            tb = (-k1 + s_ * sq) / k2
            ta = -rd + s_ * sqa
            tc = -b1b + s_ * sqb
            return jnp.minimum(
                cand(tb, body_ok(tb)),
                jnp.minimum(cand(ta, capa_ok(ta)), cand(tc, capb_ok(tc))),
            )

        t_in = jnp.where(mask[prim], surface_t(-1.0), big)
        t_out = jnp.where(mask[prim], surface_t(1.0), big)
        return t_in, t_out

    return surfaces


def _make_capsule_hit(scene: CapsuleScene):
    """Leaf primitive fn for ray_query's enumerate mode: the nearest
    surface strictly lexicographically after (t_min, prim_min) — a
    fixed-origin re-query walks every surface, coincident ones included,
    exactly once (the first cast passes t_min=0, prim_min=INT32_MAX,
    reducing the rule to tp > 0, the raster's candidate validity)."""
    surfaces = _make_capsule_surfaces(scene)

    def hit(prim, o, d, t_min, prim_min):
        def accept(tp):
            return (tp > t_min) | ((tp == t_min) & (prim > prim_min))

        t_in, t_out = surfaces(prim, o, d, accept)
        return jnp.minimum(t_in, t_out)

    return hit


@partial(
    jax.jit,
    static_argnames=("settings", "max_depth_complexity", "opacity"),
)
def render_tubes_raytraced(
    scene: CapsuleScene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,  # [2] = (A, Bc): z_ndc = A - Bc / view_z
    settings: RasterSettings,
    max_depth_complexity: int = 32,
    opacity: float = 0.3,
    bvh=None,
    jitter: jnp.ndarray = None,  # [2] subpixel offset in pixels (AA accum)
) -> jnp.ndarray:
    """Transparent tubes by iterative closest-hit re-querying
    (TubeRayTracing.glsl:61-82) -> [4, H, W] linear RGBA.

    Blends EVERY surface along each ray front-to-back (up to
    `max_depth_complexity` surfaces, reference default far above any real
    depth complexity) — no K-node bound, no overflow merge.  Agrees with
    the MLAB raster BY CONSTRUCTION for depth complexity <= K:

    * surfaces are enumerated in exact lexicographic (t, prim) order from
      a fixed origin (ray_query t_min/prim_min — no re-cast epsilon that
      could skip or double-count surfaces near the raster's tie window);
    * near-coincident surfaces (within the raster's relative 1e-6 depth
      window) are grouped and their shading FEATURES (attr, cos1, cos2)
      and alphas averaged before shading — the raster's joint-cap dedup
      (raster_capsule_oit.py extraction window) reproduced exactly,
      including the shade-after-average nonlinearity;
    * fragments outside the NDC clip volume are culled like the raster's
      clip (znd in [0, 1]).
    """
    from linevis_tpu.render.transfer_function import tf_eval_points

    W, H = settings.width, settings.height
    if bvh is None:
        bvh = build_capsule_bvh(scene)
    hit_fn = _make_capsule_hit(scene)

    basis = _ray_basis(view_proj)
    jx = jnp.float32(0.0) if jitter is None else jitter[0]
    jy = jnp.float32(0.0) if jitter is None else jitter[1]
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5 + jx) * (2.0 / W) - 1.0
    v = 1.0 - (jnp.arange(H, dtype=jnp.float32) + 0.5 + jy) * (2.0 / H)
    uu, vv = jnp.meshgrid(u, v)
    d = (
        basis[:, 0][:, None, None] * uu[None]
        + basis[:, 1][:, None, None] * vv[None]
        + basis[:, 2][:, None, None]
    )
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    dirs = d.reshape(3, -1).T  # [R, 3]
    R = dirs.shape[0]
    origins = jnp.broadcast_to(camera_position, (R, 3))
    # View depth per unit t along the normalized ray: for a unit-forward
    # view row this equals the raster kernel's `invlen` (vz = t * wz).
    wz = dirs @ view_proj[3, :3]

    a_t = scene.a.T
    ba_t = scene.ba.T
    radius = jnp.float32(scene.radius)
    zA, zB = proj_ab[0], proj_ab[1]

    # Depth-cue range: same reduction as the raster's _mlab_params.
    w_all = view_proj[3, :3] @ scene.a + view_proj[3, 3]
    big = jnp.float32(3e38)
    dcue_min = jnp.min(jnp.where(scene.mask, w_all, big))
    dcue_max = jnp.max(jnp.where(scene.mask, w_all, -big))
    cue = jnp.float32(settings.depth_cue_strength)

    def hit_features(prim, o, dr, t):
        """(attr, cos1, cos2, alpha) of a surface point — the same
        quantities the deferred-shade MLAB kernel stores per node."""
        pos = o + dr * t
        bav = ba_t[prim]
        baba = jnp.maximum(jnp.dot(bav, bav), 1e-20)
        uax = jnp.clip(jnp.dot(pos - a_t[prim], bav) / baba, 0.0, 1.0)
        attr = scene.attr0[prim] + scene.dattr[prim] * uax
        axis_pt = a_t[prim] + bav * uax
        n = (pos - axis_pt) / radius
        tn = bav * jax.lax.rsqrt(baba)
        light = -dr
        ndl = jnp.dot(n, light)
        tdl = jnp.dot(tn, light)
        ndt = jnp.dot(n, tn)
        denom = jax.lax.rsqrt(jnp.maximum(1.0 - tdl * tdl, 1e-6))
        cos1 = jnp.clip(jnp.abs(ndl), 0.0, 1.0)
        cos2 = jnp.clip(jnp.abs(ndl - tdl * ndt) * denom, 0.0, 1.0)
        _, alpha = tf_eval_points(
            settings.tf_color, settings.tf_opacity, attr
        )
        return attr, cos1, cos2, alpha * opacity

    def shade_group(attr, cos1, cos2):
        """TF + Blinn-Phong + depth cue of (averaged) node features —
        mirrors oit.shade_deferred_nodes."""
        cos1 = jnp.maximum(cos1, 1e-20)
        cos2 = jnp.maximum(cos2, 1e-20)
        cosc = 0.3 * cos1 ** 1.7 + 0.7 * cos2 ** 1.7
        spec = 0.3 * cos1 ** 30.0
        rgb, _ = tf_eval_points(settings.tf_color, settings.tf_opacity, attr)
        col = rgb * (0.1 + 0.9 * cosc) + spec
        return col

    def trace_one(o, dr, wz1):
        def apply_cue(col, vz):
            fcue = jnp.clip(
                (vz - dcue_min) / jnp.maximum(dcue_max - dcue_min, 1e-6),
                0.0, 1.0,
            )
            fcue = fcue * fcue * cue
            return col * (1.0 - fcue) + 0.5 * fcue

        def flush(g, T, acc):
            """Blend the pending tie group (averaged features)."""
            g_t0, g_attr, g_c1, g_c2, g_a, g_n = g
            nn = jnp.maximum(g_n, 1.0)
            col = shade_group(g_attr / nn, g_c1 / nn, g_c2 / nn)
            col = apply_cue(col, g_t0 * wz1)
            a_m = g_a / nn
            has = g_n > 0.0
            acc = jnp.where(has, acc + T * a_m * col, acc)
            T = jnp.where(has, T * (1.0 - a_m), T)
            return acc, T

        def cast(i, state):
            t_last, p_last, g, T, acc, done = state
            t, prim = ray_query(
                bvh, o[None], dr[None], prim_hit_fn=hit_fn,
                t_min=t_last[None], prim_min=p_last[None],
            )
            t = t[0]
            prim = prim[0]
            miss = (prim < 0) | done
            # NDC clip-volume cull (parity with the raster's znd clip).
            vz = t * wz1
            znd = zA - zB / jnp.maximum(vz, 1e-12)
            clipped = (~miss) & ((znd < 0.0) | (znd > 1.0))
            attr, c1, c2, al = hit_features(jnp.maximum(prim, 0), o, dr, t)
            g_t0, g_attr, g_c1, g_c2, g_a, g_n = g
            join = (
                (~miss) & (~clipped) & (g_n > 0.0)
                & (t <= g_t0 + jnp.abs(g_t0) * 1e-6)
            )
            new_frag = (~miss) & (~clipped) & (~join)
            do_flush = (g_n > 0.0) & (miss | new_frag)
            acc_f, T_f = flush(g, T, acc)
            acc = jnp.where(do_flush, acc_f, acc)
            T = jnp.where(do_flush, T_f, T)

            def upd(cur, add):
                return jnp.where(
                    join, cur + add,
                    jnp.where(new_frag, add, jnp.where(miss, 0.0, cur)),
                )

            g = (
                jnp.where(new_frag, t, jnp.where(miss, 0.0, g_t0)),
                upd(g_attr, attr),
                upd(g_c1, c1),
                upd(g_c2, c2),
                upd(g_a, al),
                upd(g_n, 1.0),
            )
            done = miss | (T < 1e-4)
            t_last = jnp.where(miss, t_last, t)
            p_last = jnp.where(miss, p_last, prim)
            return (t_last, p_last, g, T, acc, done)

        g0 = tuple(jnp.float32(0.0) for _ in range(6))
        state = (
            jnp.float32(0.0), jnp.int32(np.iinfo(np.int32).max), g0,
            jnp.float32(1.0), jnp.zeros((3,), jnp.float32), jnp.bool_(False),
        )
        _, _, g, T, acc, _ = jax.lax.fori_loop(
            0, max_depth_complexity, cast, state
        )
        acc, T = flush(g, T, acc)  # pending tail group
        return acc, T

    acc, T = jax.vmap(trace_one)(origins, dirs, wz)
    bg = jnp.asarray(settings.background_color, jnp.float32)
    out = acc + T[:, None] * bg[None, :3]
    img = jnp.concatenate([out, (1.0 - T)[:, None]], axis=1)
    return jnp.moveaxis(img.reshape(H, W, 4), -1, 0)


@partial(
    jax.jit,
    static_argnames=("settings", "K", "opacity", "max_stack"),
)
def render_tubes_mlat(
    scene: CapsuleScene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,
    settings: RasterSettings,
    K: int = 8,
    opacity: float = 0.3,
    bvh=None,
    max_stack: int = 64,
    jitter: jnp.ndarray = None,  # [2] subpixel offset in pixels (AA accum)
) -> jnp.ndarray:
    """Multi-Layer Alpha Tracing: ONE BVH traversal per ray with a K-node
    payload (reference `TubeRayTracing.glsl:85-130` any-hit path +
    `MlatInsert.glsl`) instead of one traversal per surface — the fast
    ray-traced transparency mode.  Every capsule the traversal reaches
    inserts its entry and exit surfaces into K depth-sorted registers
    (premultiplied features); evictions composite into the farthest node
    (the MLAB overflow merge, same algebra as the raster kernel), and
    subtrees entirely behind a SATURATED full node buffer are culled.

    Exact sorted blending when per-pixel depth complexity <= K; beyond
    that it degrades like MLAB (same overflow-merge algebra as the raster
    kernel, but with the BVH's unordered arrival, like the reference's
    any-hit path).  Unlike the re-cast tracer it does NOT average
    coincident joint-cap surfaces — both are inserted, as in MlatInsert.
    """
    from linevis_tpu.render.transfer_function import tf_eval_points

    W, H = settings.width, settings.height
    if bvh is None:
        bvh = build_capsule_bvh(scene)
    surfaces = _make_capsule_surfaces(scene)
    n = bvh.leaf_prim.shape[0]

    basis = _ray_basis(view_proj)
    jx = jnp.float32(0.0) if jitter is None else jitter[0]
    jy = jnp.float32(0.0) if jitter is None else jitter[1]
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5 + jx) * (2.0 / W) - 1.0
    v = 1.0 - (jnp.arange(H, dtype=jnp.float32) + 0.5 + jy) * (2.0 / H)
    uu, vv = jnp.meshgrid(u, v)
    d = (
        basis[:, 0][:, None, None] * uu[None]
        + basis[:, 1][:, None, None] * vv[None]
        + basis[:, 2][:, None, None]
    )
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    dirs = d.reshape(3, -1).T
    R = dirs.shape[0]
    origins = jnp.broadcast_to(camera_position, (R, 3))
    wz = dirs @ view_proj[3, :3]

    a_t = scene.a.T
    ba_t = scene.ba.T
    radius = jnp.float32(scene.radius)
    zA, zB = proj_ab[0], proj_ab[1]

    w_all = view_proj[3, :3] @ scene.a + view_proj[3, 3]
    big = jnp.float32(3e38)
    dcue_min = jnp.min(jnp.where(scene.mask, w_all, big))
    dcue_max = jnp.max(jnp.where(scene.mask, w_all, -big))
    cue = jnp.float32(settings.depth_cue_strength)

    def hit_features(prim, o, dr, t):
        pos = o + dr * t
        bav = ba_t[prim]
        baba = jnp.maximum(jnp.dot(bav, bav), 1e-20)
        uax = jnp.clip(jnp.dot(pos - a_t[prim], bav) / baba, 0.0, 1.0)
        attr = scene.attr0[prim] + scene.dattr[prim] * uax
        axis_pt = a_t[prim] + bav * uax
        nrm = (pos - axis_pt) / radius
        tn = bav * jax.lax.rsqrt(baba)
        ndl = -jnp.dot(nrm, dr)
        tdl = -jnp.dot(tn, dr)
        ndt = jnp.dot(nrm, tn)
        denom = jax.lax.rsqrt(jnp.maximum(1.0 - tdl * tdl, 1e-6))
        cos1 = jnp.clip(jnp.abs(ndl), 0.0, 1.0)
        cos2 = jnp.clip(jnp.abs(ndl - tdl * ndt) * denom, 0.0, 1.0)
        _, alpha = tf_eval_points(
            settings.tf_color, settings.tf_opacity, attr
        )
        return attr, cos1, cos2, alpha * opacity

    def trace_one(o, dr, wz1):
        inv_d = jnp.where(jnp.abs(dr) < 1e-12,
                          1e12 * jnp.sign(dr + 1e-30), 1.0 / dr)
        stack = jnp.zeros((max_stack,), jnp.int32).at[0].set(0)
        # K nodes: depth (inf empty), premultiplied features, alpha.
        nd = jnp.full((K,), jnp.inf, jnp.float32)
        nf = jnp.zeros((3, K), jnp.float32)  # attr, cos1, cos2 (premult)
        na = jnp.zeros((K,), jnp.float32)
        state = (jnp.int32(1), stack, nd, nf, na)

        def cond(s):
            return s[0] > 0

        def insert(nd, nf, na, tc, feat, ac, valid):
            carry = (
                jnp.where(valid, tc, jnp.inf),
                jnp.where(valid, feat[0] * ac, 0.0),
                jnp.where(valid, feat[1] * ac, 0.0),
                jnp.where(valid, feat[2] * ac, 0.0),
                jnp.where(valid, ac, 0.0),
            )
            for j in range(K):
                cur = (nd[j], nf[0, j], nf[1, j], nf[2, j], na[j])
                take = carry[0] < cur[0]
                nd = nd.at[j].set(jnp.where(take, carry[0], cur[0]))
                nf = nf.at[0, j].set(jnp.where(take, carry[1], cur[1]))
                nf = nf.at[1, j].set(jnp.where(take, carry[2], cur[2]))
                nf = nf.at[2, j].set(jnp.where(take, carry[3], cur[3]))
                na = na.at[j].set(jnp.where(take, carry[4], cur[4]))
                carry = tuple(
                    jnp.where(take, cur[i], carry[i]) for i in range(5)
                )
            # Evicted fragment -> overflow merge into the last node
            # (MlatInsert.glsl merge; same algebra as the raster kernel).
            evict = jnp.isfinite(carry[0])
            w = 1.0 - na[K - 1]
            nf = nf.at[0, K - 1].add(jnp.where(evict, w * carry[1], 0.0))
            nf = nf.at[1, K - 1].add(jnp.where(evict, w * carry[2], 0.0))
            nf = nf.at[2, K - 1].add(jnp.where(evict, w * carry[3], 0.0))
            na = na.at[K - 1].set(jnp.minimum(
                na[K - 1] + jnp.where(evict, w * carry[4], 0.0), 1.0
            ))
            return nd, nf, na

        def body(s):
            sp, stack, nd, nf, na = s
            node = stack[sp - 1]
            sp = sp - 1
            is_leaf = node >= (n - 1)
            bmin = bvh.node_min[node]
            bmax = bvh.node_max[node]
            t0b = (bmin - o) * inv_d
            t1b = (bmax - o) * inv_d
            tn_ = jnp.max(jnp.minimum(t0b, t1b))
            tf_ = jnp.min(jnp.maximum(t0b, t1b))
            # Cull: box behind the farthest node AND buffer saturated
            # (the raster kernel's saturation-gated truncation).
            saturated = na[K - 1] > 0.999
            hit_box = (tf_ >= jnp.maximum(tn_, 0.0)) & (
                (tn_ <= nd[K - 1]) | ~saturated
            )

            prim = bvh.leaf_prim[jnp.clip(node - (n - 1), 0, n - 1)]
            do_leaf = is_leaf & hit_box

            def accept(tp):
                return tp > 0.0

            t_in, t_out = surfaces(prim, o, dr, accept)
            for tc in (t_in, t_out):
                valid = do_leaf & jnp.isfinite(tc)
                vz = tc * wz1
                znd = zA - zB / jnp.maximum(vz, 1e-12)
                valid = valid & (znd >= 0.0) & (znd <= 1.0)
                tsafe = jnp.where(jnp.isfinite(tc), tc, 0.0)
                attr, c1, c2, ac = hit_features(prim, o, dr, tsafe)
                nd, nf, na = insert(
                    nd, nf, na, tsafe, (attr, c1, c2), ac, valid
                )

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
            return (sp, stack, nd, nf, na)

        _, _, nd, nf, na = jax.lax.while_loop(cond, body, state)

        # Resolve: front-to-back blend of the K nodes (shade averaged
        # features exactly like oit.shade_deferred_nodes).
        T = jnp.float32(1.0)
        acc = jnp.zeros((3,), jnp.float32)
        for j in range(K):
            a_j = na[j]
            inv_a = jnp.where(a_j > 1e-6, 1.0 / jnp.maximum(a_j, 1e-6), 0.0)
            attr = nf[0, j] * inv_a
            c1 = jnp.maximum(nf[1, j] * inv_a, 1e-20)
            c2 = jnp.maximum(nf[2, j] * inv_a, 1e-20)
            cosc = 0.3 * c1 ** 1.7 + 0.7 * c2 ** 1.7
            spec = 0.3 * c1 ** 30.0
            rgb, _ = tf_eval_points(
                settings.tf_color, settings.tf_opacity, attr
            )
            col = rgb * (0.1 + 0.9 * cosc) + spec
            vz = jnp.where(jnp.isfinite(nd[j]), nd[j], 0.0) * wz1
            fcue = jnp.clip(
                (vz - dcue_min) / jnp.maximum(dcue_max - dcue_min, 1e-6),
                0.0, 1.0,
            )
            fcue = fcue * fcue * cue
            col = col * (1.0 - fcue) + 0.5 * fcue
            acc = acc + T * a_j * col
            T = T * (1.0 - a_j)
        return acc, T

    acc, T = jax.vmap(trace_one)(origins, dirs, wz)
    bg = jnp.asarray(settings.background_color, jnp.float32)
    out = acc + T[:, None] * bg[None, :3]
    img = jnp.concatenate([out, (1.0 - T)[:, None]], axis=1)
    return jnp.moveaxis(img.reshape(H, W, 4), -1, 0)


def build_wide_capsule_bvh(scene: CapsuleScene, builder: str = "linear"):
    """Pack the capsule BVH for the Pallas wavefront kernel.

    Returns the device groups array ([n_groups*8, 128], see
    ops/wide_bvh.py). Scene-build-time, camera-independent — hoist and
    reuse across frames like `build_capsule_bvh`."""
    from linevis_tpu.ops.wide_bvh import pack_wide_bvh

    bvh = build_capsule_bvh(scene, builder=builder)
    wide = pack_wide_bvh(
        bvh,
        np.asarray(scene.a),
        np.asarray(scene.ba),
        float(scene.radius),
        np.asarray(scene.attr0),
        np.asarray(scene.dattr),
        np.asarray(scene.cap_a),
    )
    return jnp.asarray(wide.groups)


def render_tubes_raytraced_wavefront(
    scene: CapsuleScene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,
    settings: RasterSettings,
    K: int = 8,
    opacity: float = 0.3,
    wide_groups: jnp.ndarray = None,  # build_wide_capsule_bvh output
    t_max: float = 1e6,
    interpret: bool = None,
) -> jnp.ndarray:
    """Ray-traced transparency through the Pallas wavefront kernel
    (`kernels/bvh_wavefront.py`): one shared-stack 8-wide BVH traversal
    per 128-ray tile block, K-nearest node buffer in VMEM, deferred
    shading features — the TubeRayTracing.glsl:61-82 + MlatInsert.glsl
    role in one kernel dispatch.

    Primary rays are generated TILE-major (tile_w x tile_h = 128 rays
    per wavefront block) so ray blocks are screen tiles: maximally
    coherent for the shared stack, and the kernel's [K, blocks, P]
    output resolves through the same shade_deferred_nodes + unpack_tiles
    path as the raster OIT kernels.
    """
    tw_, th_ = settings.tile_w, settings.tile_h
    if tw_ * th_ != 128:
        raise ValueError("wavefront blocks are 128 rays: need tile_w*tile_h"
                         f" == 128, got {tw_}x{th_}")
    if wide_groups is None:
        # Host-side packing -> must happen outside the jitted core.
        wide_groups = build_wide_capsule_bvh(scene)
    return _wavefront_core(
        scene, view_proj, camera_position, proj_ab, wide_groups,
        settings, K, opacity, t_max, interpret,
    )


@partial(
    jax.jit,
    static_argnames=("settings", "K", "opacity", "t_max", "interpret"),
)
def _wavefront_core(
    scene, view_proj, camera_position, proj_ab, wide_groups,
    settings: RasterSettings, K: int, opacity: float, t_max: float,
    interpret: bool = None,
):
    from linevis_tpu.kernels.bvh_wavefront import trace_wavefront_kbuffer
    from linevis_tpu.kernels.raster_xla import unpack_tiles
    from linevis_tpu.render.oit import shade_deferred_nodes

    W, H = settings.width, settings.height
    tw_, th_ = settings.tile_w, settings.tile_h
    if interpret is None:
        # Under jax.default_device(cpu) the default BACKEND can still be
        # the TPU plugin — callers cross-checking on CPU pass
        # interpret=True explicitly.
        interpret = jax.default_backend() == "cpu"

    basis = _ray_basis(view_proj)
    tiles_x = -(-W // tw_)
    tiles_y = -(-H // th_)
    n_tiles = tiles_x * tiles_y
    # Tile-major pixel centers (the raster kernels' indexing).
    lin = jnp.arange(128, dtype=jnp.float32)
    tid = jnp.arange(n_tiles, dtype=jnp.float32)
    gx = (
        (tid % tiles_x)[:, None] * tw_ + (lin % tw_)[None, :] + 0.5
    )  # [T, P]
    gy = (tid // tiles_x)[:, None] * th_ + (lin // tw_)[None, :] + 0.5
    un = gx * (2.0 / W) - 1.0
    vn = 1.0 - gy * (2.0 / H)
    d = (
        basis[:, 0][:, None, None] * un[None]
        + basis[:, 1][:, None, None] * vn[None]
        + basis[:, 2][:, None, None]
    )  # [3, T, P] unit-forward dirs
    R = n_tiles * 128
    rays = jnp.concatenate(
        [
            jnp.broadcast_to(camera_position[:, None], (3, R)),
            d.reshape(3, R),
            jnp.full((1, R), t_max, jnp.float32),
            jnp.ones((1, R), jnp.float32),
        ],
        axis=0,
    )
    depths, feat, alpha = trace_wavefront_kbuffer(
        wide_groups, rays, proj_ab, K=K, opacity=opacity,
        tf_opacity=settings.tf_opacity, interpret=interpret,
    )

    # Depth-cue range: same reduction as the raster's _mlab_params.
    w_all = view_proj[3, :3] @ scene.a + view_proj[3, 3]
    big = jnp.float32(3e38)
    dmin = jnp.min(jnp.where(scene.mask, w_all, big))
    dmax = jnp.max(jnp.where(scene.mask, w_all, -big))
    col = shade_deferred_nodes(
        depths, feat, alpha, proj_ab, dmin, dmax,
        jnp.float32(settings.depth_cue_strength), settings,
    )
    T = jnp.ones_like(alpha[0])
    acc = jnp.zeros((3,) + alpha.shape[1:], jnp.float32)
    for i in range(K):
        acc = acc + T[None] * col[:, i]
        T = T * (1.0 - alpha[i])
    bg = jnp.asarray(settings.background_color, jnp.float32)
    out = acc + T[None] * bg[:3, None, None]

    def unp(x):
        return unpack_tiles(x, tiles_x, tiles_y, tw_, th_, W, H)

    return jnp.stack([unp(out[0]), unp(out[1]), unp(out[2]), unp(1.0 - T)], 0)
