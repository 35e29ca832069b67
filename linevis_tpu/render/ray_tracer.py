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

__all__ = ["build_capsule_bvh", "render_tubes_raytraced"]


def build_capsule_bvh(scene: CapsuleScene):
    """LBVH over per-segment capsule AABBs (the BLAS role). Masked-out
    segments get far-away degenerate boxes so they never intersect."""
    r = scene.radius
    a = scene.a
    b = scene.a + scene.ba
    lo = jnp.minimum(a, b) - r
    hi = jnp.maximum(a, b) + r
    far = jnp.float32(1e7)
    lo = jnp.where(scene.mask[None], lo, far)
    hi = jnp.where(scene.mask[None], hi, far)
    return build_lbvh(lo.T, hi.T)


def _make_capsule_hit(scene: CapsuleScene):
    """Leaf primitive fn for ray_query: analytic ray-capsule
    (RayIntersectionTestsVulkan.glsl:39-140 rayTubeIntersection +
    sphere caps)."""
    a = scene.a.T  # [S, 3]
    ba = scene.ba.T
    r = jnp.float32(scene.radius)
    cap_a = scene.cap_a
    mask = scene.mask

    def hit(prim, o, d):
        # Mirrors the OIT raster's candidate generation EXACTLY
        # (kernels/raster_capsule_oit.py surface_t): both the ENTRY and
        # the EXIT surface of body / cap-a / cap-b are blendable — the
        # reference rasterizes transparent tubes with backface culling
        # off, so exits are real fragments too.
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
            return jnp.where(ok & (tp > 0.0), tp, big)

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

        t = jnp.minimum(surface_t(-1.0), surface_t(1.0))
        return jnp.where(mask[prim], t, big)

    return hit


@partial(
    jax.jit,
    static_argnames=("settings", "max_depth_complexity", "opacity"),
)
def render_tubes_raytraced(
    scene: CapsuleScene,
    view_proj: jnp.ndarray,
    camera_position: jnp.ndarray,
    proj_ab: jnp.ndarray,  # unused (parity signature with the raster paths)
    settings: RasterSettings,
    max_depth_complexity: int = 32,
    opacity: float = 0.3,
    bvh=None,
) -> jnp.ndarray:
    """Transparent tubes by iterative closest-hit re-casting
    (TubeRayTracing.glsl:61-82) -> [4, H, W] linear RGBA.

    Blends EVERY surface along each ray front-to-back (up to
    `max_depth_complexity` casts, reference default far above any real
    depth complexity) — no K-node bound, no overflow merge.
    """
    from linevis_tpu.render.transfer_function import tf_eval_points

    W, H = settings.width, settings.height
    if bvh is None:
        bvh = build_capsule_bvh(scene)
    hit_fn = _make_capsule_hit(scene)

    basis = _ray_basis(view_proj)
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5) * (2.0 / W) - 1.0
    v = 1.0 - (jnp.arange(H, dtype=jnp.float32) + 0.5) * (2.0 / H)
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

    a_t = scene.a.T
    ba_t = scene.ba.T
    radius = jnp.float32(scene.radius)
    eps = 1e-4 * jnp.maximum(radius, 1e-3)

    def shade_hit(prim, o, dr, t):
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
        cos1 = jnp.maximum(cos1, 1e-20)
        cos2 = jnp.maximum(cos2, 1e-20)
        cosc = 0.3 * cos1 ** 1.7 + 0.7 * cos2 ** 1.7
        spec = 0.3 * cos1 ** 30.0
        rgb, alpha = tf_eval_points(
            settings.tf_color, settings.tf_opacity, attr
        )
        col = rgb * (0.1 + 0.9 * cosc) + spec
        return col, alpha * opacity

    def trace_one(o, dr):
        def cast(i, state):
            t_cur, T, acc, done = state
            t, prim = ray_query(
                bvh, (o + dr * t_cur)[None], dr[None], prim_hit_fn=hit_fn
            )
            t = t[0]
            prim = prim[0]
            miss = (prim < 0) | done
            col, al = shade_hit(jnp.maximum(prim, 0), o + dr * t_cur, dr, t)
            acc = jnp.where(miss, acc, acc + T * al * col)
            T_new = jnp.where(miss, T, T * (1.0 - al))
            t_next = t_cur + t + eps
            done = miss | (T_new < 1e-3)
            return (jnp.where(miss, t_cur, t_next), T_new, acc, done)

        t0 = jnp.float32(0.0)
        state = (t0, jnp.float32(1.0), jnp.zeros((3,), jnp.float32),
                 jnp.bool_(False))
        _, T, acc, _ = jax.lax.fori_loop(
            0, max_depth_complexity, cast, state
        )
        return acc, T

    acc, T = jax.vmap(trace_one)(origins, dirs)
    bg = jnp.asarray(settings.background_color, jnp.float32)
    out = acc + T[:, None] * bg[None, :3]
    img = jnp.concatenate([out, (1.0 - T)[:, None]], axis=1)
    return jnp.moveaxis(img.reshape(H, W, 4), -1, 0)
