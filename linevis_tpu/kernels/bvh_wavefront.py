"""Pallas wavefront BVH traversal with an in-kernel K-nearest buffer.

Reference role: the tube ray tracer's re-cast loop + MLAT any-hit payload
(`Data/Shaders/Renderers/RayTracing/TubeRayTracing.glsl:61-82`,
`MlatInsert.glsl`) over the hardware BVH. SURVEY §7.6 prescribes the TPU
shape: "Pallas wavefront kernel: ray gen → BVH traversal (stack in
registers/SMEM) → hit shading".

TPU-native design (see `ops/wide_bvh.py` for the packing):

- Rays are processed as 128-lane WAVEFRONT BLOCKS (one tile of pixels for
  primary rays — coherent by construction). Each block owns ONE shared
  traversal stack in SMEM: a node group is visited when ANY ray in the
  block wants it (speculative shared-stack traversal). Coherent rays
  amortize every fetch 128 ways; incoherent rays only over-visit, never
  miss.
- A visit is one contiguous [8, 128] DMA (the whole 8-wide node group,
  leaf geometry included) + slab tests + capsule tests as [8, P] vector
  blocks: per-child scalars are [8, 1] sublane slices, rays are lanes —
  the same vector shape as the raster kernels' candidate math, and the
  reason the tree is 8-wide.
- Hits insert into a per-ray K-nearest buffer ([K, P] VMEM, vectorized
  insertion sort — `kernels/raster_capsule_oit.py` machinery). Insertion
  keeps the K nearest REGARDLESS of arrival order, so the traversal
  needs no front-to-back ordering; a full buffer's K-th depth prunes
  whole subtrees (the RT analogue of the raster's blocked-zk cull).
- Nodes store deferred shading FEATURES (attr, cos1, cos2 — headlight
  scalar identities, no transcendentals in-kernel); the caller resolves
  with `render.oit.shade_deferred_nodes` + front-to-back blending.

Entry and exit surfaces are both inserted — the reference ray tracer
composites both (no backface culling in its re-cast loop), unlike its
CULL_BACK rasterizers.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from linevis_tpu.kernels.raster_capsule_oit import _tf_channels_static
from linevis_tpu.ops.wide_bvh import (
    LANE_A,
    LANE_ATTR0,
    LANE_BA,
    LANE_BABA,
    LANE_BMAX,
    LANE_BMIN,
    LANE_CAPA,
    LANE_DATTR,
    LANE_ID,
    LANE_LEAF,
    LANE_PTR,
    LANE_R,
)

__all__ = ["trace_wavefront_kbuffer"]

_BIG = 1e30
BLOCK_GROUP = 8  # ray blocks per grid step (output sublane rule)
P = 128  # rays per wavefront block (one vreg of lanes)
MAX_STACK = 192


def _wavefront_kernel(
    params_ref,  # [8]: 0 zA, 1 zB, 2 opacity_scale, 3 n_groups
    rays_vmem,  # [8, BLOCK_GROUP * P]: o(3), d(3), tmax, valid
    groups_hbm,  # [n_groups * 8, 128]
    *refs,
    K: int,
    tf_opacity: tuple,
    no_overflow: bool,
):
    n_out = 5 * K
    out = refs[:n_out]
    rec_scr, sem, stack_smem = refs[n_out], refs[n_out + 1], refs[n_out + 2]
    node_scr = refs[n_out + 3 : n_out + 8]  # [K, P] x (d, attr, c1, c2, a)
    any_scr = refs[n_out + 8]  # [8, 128] child any-hit flags
    tw_scr = refs[n_out + 9]  # [16, P] candidate depths (entry+exit)

    d_refs = out[0:K]
    f0_refs = out[K : 2 * K]
    f1_refs = out[2 * K : 3 * K]
    f2_refs = out[3 * K : 4 * K]
    a_refs = out[4 * K : 5 * K]
    for dref in d_refs:
        dref[:] = jnp.full(dref.shape, 2.0, jnp.float32)
    for group in (f0_refs, f1_refs, f2_refs, a_refs):
        for ref in group:
            ref[:] = jnp.zeros(ref.shape, jnp.float32)

    zA = params_ref[0]
    zB = params_ref[1]
    opacity_scale = params_ref[2]

    for k in range(BLOCK_GROUP):
        rays = rays_vmem[:, k * P : (k + 1) * P]  # [8, P]
        ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
        dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
        tmax_w = rays[6:7, :]
        valid = rays[7:8, :] > 0.5
        invlen = jax.lax.rsqrt(
            jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-30)
        )
        dnx, dny, dnz = dx * invlen, dy * invlen, dz * invlen
        # Robust slab reciprocals (zero components -> huge signed).
        def safe_inv(c):
            tiny = jnp.abs(c) < 1e-12
            return jnp.where(
                tiny, jnp.where(c >= 0, 1e12, -1e12), 1.0 / jnp.where(
                    tiny, 1.0, c
                )
            )

        idx_, idy_, idz_ = safe_inv(dnx), safe_inv(dny), safe_inv(dnz)
        len_p = 1.0 / invlen
        # NDC clip volume as tw bounds (parity with the raster's znd
        # in [0, 1] cull; raster_capsule_oit.py tw_lo/tw_hi).
        tw_lo = (zB / zA) * len_p
        tw_hi = (zB / (zA - 1.0)) * len_p

        node_scr[0][:] = jnp.full(node_scr[0].shape, 2.0, jnp.float32)
        for s in node_scr[1:]:
            s[:] = jnp.zeros(s.shape, jnp.float32)

        stack_smem[0] = jnp.int32(0)

        def cond(sp):
            return sp > 0

        def body(sp):
            g = stack_smem[sp - 1]
            sp = sp - 1
            pltpu.make_async_copy(
                groups_hbm.at[pl.ds(g * 8, 8), :], rec_scr, sem
            ).start()
            pltpu.make_async_copy(
                groups_hbm.at[pl.ds(g * 8, 8), :], rec_scr, sem
            ).wait()
            rec = rec_scr[:]  # [8, 128]

            def scal(lane):
                return rec[:, lane : lane + 1]  # [8, 1] child scalars

            # Per-ray prune bound in tw space: with a FULL buffer, a node
            # entirely behind the pixel's K-th depth cannot change the K
            # nearest (no_overflow insert at pos K is an exact no-op).
            # With the MLAB overflow merge every fragment still
            # contributes, so only the caller's tmax prunes there.
            if no_overflow:
                dK_row = node_scr[0][K - 1 : K, :]
                full = dK_row < 2.0
                tw_bound = jnp.where(
                    full, zB / jnp.maximum(zA - dK_row, 1e-9) * len_p, _BIG
                )
                tw_bound = jnp.minimum(tw_bound, tmax_w)
            else:
                tw_bound = tmax_w

            # AABB slab test: [8 children, P rays].
            t0x = (scal(LANE_BMIN + 0) - ox) * idx_
            t1x = (scal(LANE_BMAX + 0) - ox) * idx_
            t0y = (scal(LANE_BMIN + 1) - oy) * idy_
            t1y = (scal(LANE_BMAX + 1) - oy) * idy_
            t0z = (scal(LANE_BMIN + 2) - oz) * idz_
            t1z = (scal(LANE_BMAX + 2) - oz) * idz_
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), 0.0),
            )
            tf_ = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            hitb = (tf_ >= tn) & (tn <= tw_bound) & valid  # [8, P]
            any_scr[:] = jnp.concatenate(
                [
                    jnp.max(jnp.where(hitb, 1.0, 0.0), axis=1, keepdims=True),
                    jnp.zeros((8, 127), jnp.float32),
                ],
                axis=1,
            )

            has_leaf = jnp.max(rec[:, LANE_LEAF]) > 0.5

            @pl.when(has_leaf)
            def _():
                # Capsule test, [8, P]: padding / internal rows carry
                # +inf bounds and zero payload -> no candidates (gated
                # by the leaf flag below anyway).
                leaf_ok = scal(LANE_LEAF) > 0.5
                oax = ox - scal(LANE_A + 0)
                oay = oy - scal(LANE_A + 1)
                oaz = oz - scal(LANE_A + 2)
                bard = (
                    scal(LANE_BA + 0) * dnx
                    + scal(LANE_BA + 1) * dny
                    + scal(LANE_BA + 2) * dnz
                )
                rdoa = oax * dnx + oay * dny + oaz * dnz
                baba = jnp.maximum(scal(LANE_BABA), 1e-20)
                rr = scal(LANE_R) * scal(LANE_R)
                # Re-origin at closest approach to the segment midpoint
                # (f32 conditioning, same as the raster kernels).
                t0 = -(rdoa + 0.5 * bard)
                pax = oax + t0 * dnx
                pay = oay + t0 * dny
                paz = oaz + t0 * dnz
                baoa = (
                    scal(LANE_BA + 0) * pax
                    + scal(LANE_BA + 1) * pay
                    + scal(LANE_BA + 2) * paz
                )
                oaoa = pax * pax + pay * pay + paz * paz
                rd = rdoa + t0
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

                def cand(tp, ok):
                    ok = ok & leaf_ok & valid & (t0 + tp > 0.0)
                    return jnp.where(ok, tp, _BIG)

                def body_ok(tp, disc):
                    y = baoa + tp * bard
                    return (disc >= 0.0) & (y > 0.0) & (y < baba)

                cap_on = scal(LANE_CAPA) > 0.5

                def capa_ok(tp, disc):
                    y = baoa + tp * bard
                    return (disc >= 0.0) & (y <= 0.0) & cap_on

                def capb_ok(tp, disc):
                    y = baoa + tp * bard
                    return (disc >= 0.0) & (y >= baba)

                def surface_t(s_):
                    tb = (-k1 + s_ * sq) / k2
                    ta = -rd + s_ * sqa
                    tc = -b1b + s_ * sqb
                    return jnp.minimum(
                        cand(tb, body_ok(tb, h)),
                        jnp.minimum(
                            cand(ta, capa_ok(ta, ha)),
                            cand(tc, capb_ok(tc, hb)),
                        ),
                    )

                t_in = surface_t(-1.0)
                t_out = surface_t(1.0)

                def two(x):
                    return jnp.concatenate([x, x], axis=0)

                tcand = jnp.concatenate([t_in, t_out], axis=0)  # [16, P]
                tw = jnp.where(tcand < _BIG, two(t0) + tcand, _BIG)
                tw = jnp.where(
                    (tw >= tw_lo) & (tw <= jnp.minimum(tw_hi, tw_bound)),
                    tw, _BIG,
                )  # [16,P] vs [1,P] broadcasts

                tw_scr[:] = tw
                nhit = jnp.max(jnp.sum(jnp.where(tw < _BIG, 1, 0), axis=0))

                @pl.when(nhit > 0)
                def _():
                    # Deferred shading features via the scalar identities
                    # (raster_capsule_oit.shade_candidates):
                    #   n.l = -(rd + t - uax*bard)/r, headlight l = -dn.
                    bard2, rd2 = two(bard), two(rd)
                    y2 = two(baoa) + tcand * bard2
                    uax = jnp.clip(y2 / two(baba), 0.0, 1.0)
                    attr = two(scal(LANE_ATTR0)) + two(scal(LANE_DATTR)) * uax
                    inv_r2 = 1.0 / jnp.maximum(two(scal(LANE_R)), 1e-12)
                    ndl = -(rd2 + tcand - uax * bard2) * inv_r2
                    tn2 = two(jax.lax.rsqrt(baba))
                    tdl = -bard2 * tn2
                    ndt = (y2 - uax * two(baba)) * tn2 * inv_r2
                    denom = jax.lax.rsqrt(jnp.maximum(1.0 - tdl * tdl, 1e-6))
                    cos1 = jnp.clip(jnp.abs(ndl), 0.0, 1.0)
                    cos2 = jnp.clip(jnp.abs(ndl - tdl * ndt) * denom, 0.0, 1.0)
                    alpha = _tf_channels_static(tf_opacity, 1, attr)[0]
                    ac = alpha * opacity_scale

                    def sweep_body(_s, carry):
                        tw_s = tw_scr[:]
                        bt = jnp.min(tw_s, axis=0, keepdims=True)
                        has = bt < _BIG
                        win = tw_s <= bt + jnp.abs(bt) * 1e-6
                        nwin = jnp.maximum(
                            jnp.sum(jnp.where(win, 1.0, 0.0), axis=0,
                                    keepdims=True),
                            1.0,
                        )

                        def sel(v):
                            return jnp.where(
                                has,
                                jnp.sum(jnp.where(win, v, 0.0), axis=0,
                                        keepdims=True) / nwin,
                                0.0,
                            )

                        vz = bt * invlen
                        znd = jnp.where(
                            has, zA - zB / jnp.maximum(vz, 1e-12), 2.0
                        )
                        sa = sel(ac)
                        carry_vals = (
                            znd, sel(attr) * sa, sel(cos1) * sa,
                            sel(cos2) * sa, sa,
                        )
                        dS = node_scr[0][:]
                        kidx = jax.lax.broadcasted_iota(
                            jnp.int32, (K, P), 0
                        )
                        pos = jnp.sum(
                            jnp.where(dS <= carry_vals[0], 1, 0), axis=0,
                            keepdims=True,
                        )
                        # Cross-visit dedup: coincident joint surfaces
                        # already in the buffer (same tie window, mapped
                        # to NDC) must not re-insert.
                        eps_znd = jnp.abs(zB) * 1e-6 / jnp.maximum(
                            bt * invlen, 1e-12
                        )
                        dup = (
                            jnp.sum(
                                jnp.where(
                                    (jnp.abs(dS - carry_vals[0]) <= eps_znd)
                                    & (dS < 2.0),
                                    1, 0,
                                ),
                                axis=0, keepdims=True,
                            )
                            > 0
                        ) & has
                        pos = jnp.where(dup, K, pos)

                        olds = [ref[:] for ref in node_scr]

                        def ins(all_v, c_v):
                            shifted = jnp.concatenate(
                                [all_v[0:1], all_v[: K - 1]], axis=0
                            )
                            return jnp.where(
                                kidx < pos, all_v,
                                jnp.where(kidx == pos, c_v, shifted),
                            )

                        news = [ins(o, c) for o, c in zip(olds, carry_vals)]
                        if not no_overflow:
                            ev_sel = pos < K
                            evs = [
                                jnp.where(ev_sel, o[K - 1 : K, :], c)
                                for o, c in zip(olds, carry_vals)
                            ]
                            evict_has = (
                                has & jnp.logical_not(dup) & (evs[0] < 2.0)
                            )
                            aK = news[4][K - 1 : K, :]
                            w = 1.0 - aK

                            def merge(c_):
                                return jnp.where(evict_has, w * c_, 0.0)

                            lastrow = kidx == (K - 1)
                            for ch in (1, 2, 3):
                                news[ch] = jnp.where(
                                    lastrow, news[ch] + merge(evs[ch]),
                                    news[ch],
                                )
                            news[4] = jnp.where(
                                lastrow,
                                jnp.minimum(news[4] + merge(evs[4]), 1.0),
                                news[4],
                            )
                        for ref, new in zip(node_scr, news):
                            ref[:] = new
                        tw_scr[:] = jnp.where(win, _BIG, tw_s)
                        return carry

                    jax.lax.fori_loop(
                        0, jnp.minimum(nhit, K), sweep_body, jnp.int32(0)
                    )

            # Push internal children whose subtree any ray still wants.
            for j in range(8):
                ptr = rec_scr[j, LANE_PTR]
                do = (ptr >= 0.0) & (any_scr[j, 0] > 0.5)

                @pl.when(do)
                def _(sp=sp, ptr=ptr):
                    stack_smem[sp] = ptr.astype(jnp.int32)

                sp = sp + jnp.where(do, 1, 0)
            return sp

        jax.lax.while_loop(cond, body, jnp.int32(1))

        for group, ref in zip(
            (d_refs, f0_refs, f1_refs, f2_refs, a_refs), node_scr
        ):
            for j in range(K):
                group[j][k : k + 1, :] = ref[j : j + 1, :]


@partial(
    jax.jit,
    static_argnames=("K", "tf_opacity", "no_overflow", "interpret"),
)
def trace_wavefront_kbuffer(
    groups: jnp.ndarray,  # [n_groups * 8, 128] packed 8-wide BVH
    rays: jnp.ndarray,  # [8, R]: o(3), d(3), tmax_world, valid
    proj_ab: jnp.ndarray,  # [2] = (zA, zB) NDC depth mapping
    K: int = 8,
    opacity: float = 0.3,
    tf_opacity: tuple = ((0.0, 1.0), (1.0, 1.0)),
    no_overflow: bool = False,
    interpret: bool = False,
):
    """Trace R rays -> K-nearest deferred-shading node buffers.

    Returns (depths [K, B, P], feat [3, K, B, P] premultiplied
    (attr, cos1, cos2), alpha [K, B, P]) with B = ceil(R / 128) ray
    blocks — the `shade_deferred_nodes` convention. Ray DIRECTIONS are
    expected with unit forward component (basis @ [u, v, 1]), so the
    world hit distance along the unit ray maps to view depth via
    vz = tw / |d| and to NDC via zA - zB / vz.
    """
    R = rays.shape[1]
    n_blocks = -(-R // P)
    n_pad_blocks = -(-n_blocks // BLOCK_GROUP) * BLOCK_GROUP
    pad = n_pad_blocks * P - R
    rays_p = jnp.pad(rays, ((0, 0), (0, pad)))
    params = jnp.stack(
        [proj_ab[0], proj_ab[1], jnp.float32(opacity),
         jnp.float32(groups.shape[0] // 8)]
    )
    kernel = functools.partial(
        _wavefront_kernel,
        K=K,
        tf_opacity=tf_opacity,
        no_overflow=no_overflow,
    )
    n_out = 5 * K
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad_blocks // BLOCK_GROUP,),
        in_specs=[
            pl.BlockSpec(
                (8, BLOCK_GROUP * P), lambda i, *_: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (BLOCK_GROUP, P), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        * n_out,
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),  # node group record
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((MAX_STACK,), jnp.int32),
            *([pltpu.VMEM((K, P), jnp.float32)] * 5),
            pltpu.VMEM((8, 128), jnp.float32),  # child any-hit flags
            pltpu.VMEM((16, P), jnp.float32),  # candidate depths
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pad_blocks, P), jnp.float32)
        ] * n_out,
        interpret=interpret,
    )(params, rays_p, groups)
    outs = [o[:n_blocks] for o in outs]
    depths = jnp.stack(outs[0:K], axis=0)
    feat = jnp.stack(
        [jnp.stack(outs[K : 2 * K], 0), jnp.stack(outs[2 * K : 3 * K], 0),
         jnp.stack(outs[3 * K : 4 * K], 0)],
        axis=0,
    )
    alpha = jnp.stack(outs[4 * K : 5 * K], axis=0)
    return depths, feat, alpha
