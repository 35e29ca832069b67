"""Order-independent transparency kernels over binned capsules.

TPU-native replacement for the reference's OIT zoo (`src/Renderers/OIT/*`):
instead of per-pixel linked lists built with atomics and sorted in a
resolve pass (PPLL, `LinkedListGather.glsl:33-73`), fragments are
generated in front-to-back run order (the CSR runs are z-bucket sorted)
and inserted into a fixed-K per-pixel node array held in VMEM — the
Multi-Layer Alpha Blending model of the reference's `MLABRenderer`
(`src/Renderers/OIT/MLABRenderer.*`: K nodes, insertion sort, overflow
composited into the last node), but with no atomics or fragment-shader
interlock: each tile is owned by one kernel instance, so insertion is
race-free and deterministic by construction (SURVEY §5 "race detection").

With K >= scene depth complexity the result equals exact sorted blending,
i.e. the reference's PPLL resolve; K=8 matches MLAB defaults.

Culling hierarchy (the meshlet-culling role of the reference's deferred
pipeline, `src/Renderers/Deferred/DeferredModes.hpp:31-62`, recast per
tile): runs arrive front-to-back (z-bucket sorted), and each level tests
candidates against the per-pixel K-buffer state —
  1. per-CANDIDATE: a fragment behind a pixel's K-th node is rejected
     when that pixel is *blocked* — exactly (no_overflow: a full buffer
     inserts at pos K and drops) or with TOTAL per-pixel error < 1-`sat`
     (overflow: the K-node cumulative transmittance prod(1-a_i) is
     already <= 1-sat, and everything dropped composites under it);
  2. per-BLOCK: a [sub]-candidate block whose nearest conservative depth
     is behind every *unblocked* pixel's bound is skipped before its
     intersection math;
  3. per-CHUNK: the chunk loop exits once the remaining chunks' min
     depth is behind the tile-wide blocked bound.
Rejection also empties blocks' live-candidate counts (nhit), which gates
candidate shading and each of the K extraction sweeps individually.

Fragments are SHADED at generation (Blinn-Phong tube shading with the
camera headlight: light == view == -ray, so no world positions are
needed); the transfer function is unrolled from static control points.
Each capsule contributes its ENTRY surface only by default: the
reference rasterizes transparent tubes with backface culling
(`LineRasterPass.cpp:86-91` selects CULL_BACK when transparency is on),
so exit-surface fragments never exist there. `two_sided=True` restores
the entry+exit variant (and doubles the kernel's candidate width).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from linevis_tpu.kernels.moment_math import (
    transmittance_at_depth_4,
    transmittance_at_depth_6,
    transmittance_at_depth_8,
)
from linevis_tpu.kernels.trig_moment_math import (
    circle_powers,
    transmittance_at_depth_trig_2,
    transmittance_at_depth_trig_3,
    transmittance_at_depth_trig_4,
)
from linevis_tpu.kernels.raster_pallas import TILE_GROUP, SortedBinning

__all__ = ["rasterize_capsules_mlab"]

_BIG = 1e30

# Node-row width of the narrow-insert fast path for K > 8 kernels (one
# 8x128 vreg of sublanes): while a tile's occupancy fits, sweeps insert
# into [8, P] slices of the [K, P] node buffer.
_NARROW_R = 8


def _row_product(x, n):
    """prod over the leading n sublane rows of x ([n, P] -> [1, P]).

    Mosaic has no multiplicative reduce; a halving tree is log2(n) wide
    vector multiplies (an odd remainder row folds into row 0)."""
    while n > 1:
        h = n // 2
        lo = x[0:h] * x[h : 2 * h]
        if n % 2:
            lo = jnp.concatenate(
                [lo[0:1] * x[n - 1 : n], lo[1:]], axis=0
            )
        x, n = lo, h
    return x

# store modes that are pure per-pixel accumulators (no K-buffer insertion)
_ACCUM_MODES = ("wboit", "count", "mboit_gen", "mboit_resolve")


def _tf_channels_static(pts, nch, x):
    """Unrolled piecewise-linear TF (see transfer_function.tf_eval_points)."""
    xc = jnp.clip(x, 0.0, 1.0)
    outs = [jnp.full(x.shape, float(pts[0][1 + c]), jnp.float32)
            for c in range(nch)]
    for k in range(len(pts) - 1):
        p0, p1 = float(pts[k][0]), float(pts[k + 1][0])
        seg = (xc >= p0) & (xc <= p1)
        w = (xc - p0) / max(p1 - p0, 1e-9)
        for c in range(nch):
            v0, v1 = float(pts[k][1 + c]), float(pts[k + 1][1 + c])
            outs[c] = jnp.where(seg, v0 + w * (v1 - v0), outs[c])
    return outs


def _tf_eval_static(tf_color, tf_opacity, x):
    return (_tf_channels_static(tf_color, 3, x),
            _tf_channels_static(tf_opacity, 1, x)[0])


def _mlab_kernel(
    count_ref,
    start_ref,
    params_ref,  # [24]: ray basis 0-8, zA 9, zB 10, dmin 11, dmax 12,
    #            depth_cue_strength 13, opacity_scale 14, log-depth 15-16,
    #            moment bias 17, overestimation 18, px scale 19, wzp 20-22
    payload_hbm,  # [Np + C, 128] — PAIRS AS ROWS (pre-transposed in XLA,
    #            row dim zero-padded to 128 lanes for DMA alignment):
    #            per-candidate scalars land on SUBLANES, so the kernel's
    #            [sub, 1] payload reads are plain slices instead of the
    #            [1, C] -> [C, 1] lane->sublane transposes that dominated
    #            the per-block cost (~17 per candidate block) in the
    #            row-major layout.
    *refs,
    tile_w: int,
    tile_h: int,
    tiles_x: int,
    chunk: int,
    width: int,
    height: int,
    K: int,
    tf_color: tuple,
    tf_opacity: tuple,
    use_bands: bool,
    store_mode: str,  # 'shade' | 'gather' (opacity-optimization importance)
    #  | 'wboit' | 'count' | 'mboit_gen' | 'mboit_resolve'
    alpha_from_rows: bool,  # alpha = row11 + row12*u (per-segment opacities)
    n_mom: int,  # MBOIT moment count (4 | 6 | 8 scalar channels)
    trig: bool,  # MBOIT trigonometric moments (usePowerMoments = false)
    use_peel: bool,  # depth peeling: discard fragments at znd <= peel input
    no_overflow: bool,  # drop evicted fragments instead of MLAB-merging
    deferred_shade: bool,  # store (attr, cosc, spec) features, shade in XLA
    sub: int,  # compute sub-chunk width (DMA stays at `chunk`)
    sat: float,  # last-node alpha above which behind-dK fragments drop
    composite: bool,  # shade + front-to-back blend the K nodes IN-KERNEL
    two_sided: bool,  # also emit exit-surface (back-face) fragments
):
    # mboit_resolve receives the per-pixel moment images (pass-1 output) as
    # extra *inputs* ahead of the outputs: b0, n/2 odd, n/2 even moments.
    # Depth peeling receives the previous pass's per-pixel max depth.
    if store_mode == "mboit_resolve":
        n_min = 1 + n_mom
        mom_in = refs[:n_min]
        refs = refs[n_min:]
    if use_peel:
        peel_in = refs[0]
        refs = refs[1:]
    n_out = 4 if composite else 5 * K
    out = refs[:n_out]
    coef_scr, sem = refs[n_out], refs[n_out + 1]
    # K-node buffer scratch, [K, P] per channel: the insertion sort runs
    # vectorized over all K nodes at once (K=8 exactly fills the 8x128
    # VREG sublanes) instead of K chained [1, P] row swaps; the final
    # node state is copied to the per-node output planes at tile end.
    node_scr = refs[n_out + 2 : n_out + 7]
    # Candidate-depth scratch [2*sub, P]: holding tw in VMEM lets each of
    # the K extraction sweeps live under pl.when, gated on the chunk's
    # max per-pixel hit count — thin tubes leave most chunks with far
    # fewer than K hits, and a skipped sweep saves ~7 full [2C, P]
    # reduction passes (min + tie window + 5 masked channel sums).
    tw_scr = refs[n_out + 7]
    # Narrow-insert fast path (K > NARROW_R only): per-tile max node
    # occupancy, tracked in SMEM. Nodes pack as a depth-sorted prefix
    # (sentinels at the end), so while occupancy + pending sweeps fits in
    # the first NARROW_R rows, the insertion sort runs on [NARROW_R, P]
    # slices instead of [K, P] — at K=32 that is 4x less vector work per
    # sweep, and eviction/overflow-merge is statically impossible there.
    narrow_on = K > _NARROW_R and store_mode not in _ACCUM_MODES
    occ_smem = refs[n_out + 8] if narrow_on else None
    if not composite:
        d_refs = out[0:K]
        r_refs = out[K : 2 * K]
        g_refs = out[2 * K : 3 * K]
        b_refs = out[3 * K : 4 * K]
        a_refs = out[4 * K : 5 * K]

    gi = pl.program_id(0)
    C = chunk
    P = tile_w * tile_h

    lin = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    ly = (lin // tile_w).astype(jnp.float32)
    lx = (lin % tile_w).astype(jnp.float32)

    if composite:
        # Empty tiles show pure background (T = 1, no fragments).
        for ch in range(3):
            out[ch][:] = jnp.full(
                out[ch].shape, 1.0, jnp.float32
            ) * params_ref[24 + ch]
        out[3][:] = jnp.zeros(out[3].shape, jnp.float32)
    else:
        d_init = 0.0 if store_mode in _ACCUM_MODES else 2.0
        for dref in d_refs:
            dref[:] = jnp.full(dref.shape, d_init, jnp.float32)
        for cref in (*r_refs, *g_refs, *b_refs, *a_refs):
            cref[:] = jnp.zeros(cref.shape, jnp.float32)

    zA = params_ref[9]
    zB = params_ref[10]
    dmin = params_ref[11]
    dmax = params_ref[12]
    cue = params_ref[13]
    opacity_scale = params_ref[14]
    log_dmin = params_ref[15]
    log_dmax = params_ref[16]
    m_bias = params_ref[17]
    m_overest = params_ref[18]
    wzp_y = params_ref[20]  # wrapping-zone constants (trig moments)
    wzp_z = params_ref[21]
    wzp_w = params_ref[22]

    # Group prologue: start the FIRST chunk's DMA for every tile in the
    # group up front (slot k, sem k). Most tiles hold a single chunk
    # (Tornado@1080p: mean 0.62 chunks/tile), so without this each tile's
    # processing begins with a cold DMA wait; prefetched, tile k's data
    # lands while tiles 0..k-1 compute. Later chunks (c >= 1) double-buffer
    # through the two extra slots as before.
    for k in range(TILE_GROUP):
        t = gi * TILE_GROUP + k
        count_k = count_ref[t]
        b0_k = start_ref[t] // C

        @pl.when(count_k > 0)
        def _(b0_k=b0_k, k=k):
            pltpu.make_async_copy(
                payload_hbm.at[pl.ds(pl.multiple_of(b0_k * C, C), C), :],
                coef_scr.at[k],
                sem.at[k],
            ).start()

    for k in range(TILE_GROUP):
        t = gi * TILE_GROUP + k
        count = count_ref[t]
        base = start_ref[t]
        b0 = base // C
        nch = jnp.where(count > 0, (base + count + C - 1) // C - b0, 0)
        ty = (t // tiles_x).astype(jnp.float32)
        tx = (t % tiles_x).astype(jnp.float32)
        gx = tx * tile_w + lx + 0.5
        gy = ty * tile_h + ly + 0.5
        un = gx * (2.0 / width) - 1.0
        vn = 1.0 - gy * (2.0 / height)
        dx = params_ref[0] * un + params_ref[1] * vn + params_ref[2]
        dy = params_ref[3] * un + params_ref[4] * vn + params_ref[5]
        dz = params_ref[6] * un + params_ref[7] * vn + params_ref[8]
        invlen = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        dn = jnp.concatenate([dx * invlen, dy * invlen, dz * invlen], axis=0)
        # All per-candidate depth comparisons run in tw (world-distance)
        # space: znd = zA - zB/(tw*invlen) is monotone in tw, so an NDC
        # threshold d maps to tw >= zB/(zA-d)*len once per PIXEL ROW
        # instead of a [2*sub, P] divide per candidate block.
        len_p = 1.0 / invlen  # [1, P]
        tw_lo = (zB / zA) * len_p  # znd >= 0
        tw_hi = (zB / (zA - 1.0)) * len_p  # znd <= 1

        def slot_of(c, k=k):
            # Chunk 0 was group-prefetched into slot k; chunks >= 1
            # double-buffer through the two extra slots.
            return jnp.where(
                c == 0, k, TILE_GROUP + jax.lax.rem(c, 2)
            )

        def get_dma(slot, c, b0=b0):
            start = pl.multiple_of((b0 + c) * C, C)
            return pltpu.make_async_copy(
                payload_hbm.at[pl.ds(start, C), :], coef_scr.at[slot],
                sem.at[slot],
            )

        @pl.when(nch > 0)
        def _(nch=nch, count=count, base=base, b0=b0, dn=dn, invlen=invlen,
              k=k, get_dma=get_dma, slot_of=slot_of):
            if store_mode not in _ACCUM_MODES:
                node_scr[0][:] = jnp.full(
                    node_scr[0].shape, 2.0, jnp.float32
                )
                for s in node_scr[1:]:
                    s[:] = jnp.zeros(s.shape, jnp.float32)
            if narrow_on:
                occ_smem[0] = jnp.int32(0)

            def cond(state):
                c, _ = state
                return c < nch

            def body(state):
                c, zk_eff_prev = state
                slot = slot_of(c)
                get_dma(slot, c).wait()
                coef = coef_scr[slot]  # [C, 16] (pairs are sublanes)
                lane = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
                glob = (b0 + c) * C + lane
                in_run = (glob >= base) & (glob < base + count)
                zmin_t = coef[:, 15:16]  # [C, 1]
                chunk_zmin = jnp.min(jnp.where(in_run, zmin_t, 3.0))
                # Early exit against the per-pixel BLOCKED depth bound
                # zk_eff = max over pixels of (dK where the pixel rejects
                # behind-dK fragments, else 2.0) — see _blocked_zk below.
                # A fragment behind a blocked pixel's dK is an exact no-op
                # (no_overflow: full buffer inserts at pos K and drops) or
                # a bounded-error drop (overflow: the last node is
                # saturated, so its merge weight is < 1 - sat).
                # Accumulation modes must see EVERY fragment (their d_refs
                # hold sums, not depths, so the depth test is meaningless).
                if store_mode in _ACCUM_MODES:
                    exit_now = jnp.bool_(False)
                else:
                    exit_now = chunk_zmin > zk_eff_prev

                def _blocked_zk():
                    # Per-pixel "no fragment behind dK can matter" bound.
                    # Pixels whose buffer is not full (no_overflow) or
                    # whose K-node transmittance budget is not yet spent
                    # keep bound 2.0: every future fragment still matters.
                    dK_row = node_scr[0][K - 1 : K, :]
                    if no_overflow:
                        blocked = dK_row < 2.0
                    else:
                        # Cumulative transmittance T_K = prod(1 - a_i):
                        # every fragment behind the K-th node composites
                        # under T_K, so the TOTAL contribution of ALL
                        # dropped fragments is < T_K <= 1 - sat — a
                        # rigorous per-pixel error bound (the pre-r5
                        # last-node-alpha test bounded only each MERGE's
                        # weight, not the accumulated error, and fired
                        # strictly less often since 1 - a_K >= T_K).
                        T_K = _row_product(1.0 - node_scr[4][:], K)
                        blocked = T_K <= (1.0 - sat)
                    return blocked, dK_row

                # Per-candidate-block processing, shapes [sub, P] /
                # [2*sub, P].  The DMA granularity stays at `chunk` (lane-
                # dim DMA offsets must be 128-aligned), but compute runs on
                # `sub`-wide sublane slices so a tile whose run covers only
                # part of a chunk skips the padding blocks entirely — on
                # Tornado@1080p the median tile holds ~22 of the 128 pairs
                # it would otherwise pay intersection + K extraction
                # sweeps for.  `scal` yields the [sub, 1] payload-row
                # slice; `in_run` is the block's [sub, 1] run mask.
                def process(scal, in_run):
                    # Derived per-candidate scalar rows (16-22, appended
                    # post-sort by tube_raster.prepare_capsule_frame):
                    # ba.oa, oa.oa, 1/baba, rr*baba, rsqrt(baba), 1/r, rr.
                    # They replace per-block [sub, 1] dot products AND let
                    # the shading below run on scalar identities instead
                    # of reconstructing per-pixel normals (see
                    # shade_candidates).
                    baoa0 = scal(16)
                    oaoa0 = scal(17)
                    inv_baba = scal(18)
                    rrbaba = scal(19)
                    tnorm_s = scal(20)
                    inv_r_s = scal(21)
                    rr = scal(22)
                    baba = scal(10)

                    def dot_dn(r):
                        return (
                            scal(r) * dn[0:1, :]
                            + scal(r + 1) * dn[1:2, :]
                            + scal(r + 2) * dn[2:3, :]
                        )

                    bard = dot_dn(3)
                    rdoa = dot_dn(0)
                    t0 = -(rdoa + 0.5 * bard)
                    # Re-origin at closest approach to the segment
                    # midpoint: rd = (oa + t0*d).d = -bard/2 exactly.
                    rd = -0.5 * bard
                    baoa = baoa0 + t0 * bard
                    oaoa = oaoa0 + t0 * (rdoa + rd)

                    k2 = jnp.maximum(baba - bard * bard, 1e-20)
                    k1 = baba * rd - baoa * bard
                    k0 = baba * oaoa - baoa * baoa - rrbaba
                    h = k1 * k1 - k2 * k0
                    sq = jnp.sqrt(jnp.maximum(h, 0.0))
                    ha = rd * rd - (oaoa - rr)
                    sqa = jnp.sqrt(jnp.maximum(ha, 0.0))
                    b1b = rd - bard
                    obob = oaoa - 2.0 * baoa + baba
                    hb = b1b * b1b - (obob - rr)
                    sqb = jnp.sqrt(jnp.maximum(hb, 0.0))

                    def cand(tp, ok):
                        ok = ok & in_run & (t0 + tp > 0.0)
                        return jnp.where(ok, tp, _BIG)

                    def body_ok(tp, disc):
                        y = baoa + tp * bard
                        return (disc >= 0.0) & (y > 0.0) & (y < baba)

                    cap_a_on = scal(13) > 0.5  # chain-start caps only

                    def capa_ok(tp, disc):
                        y = baoa + tp * bard
                        return (disc >= 0.0) & (y <= 0.0) & cap_a_on

                    def capb_ok(tp, disc):
                        y = baoa + tp * bard
                        return (disc >= 0.0) & (y >= baba)

                    def surface_t(near):
                        s_ = -1.0 if near else 1.0
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

                    t_in = surface_t(True)  # [sub, P] relative t
                    # Front faces only by default: the reference rasterizes
                    # transparent tubes with CULL_BACK
                    # (LineRasterPass.cpp:86-91 — getIsTransparencyUsed()
                    # selects CULL_BACK), so exit-surface fragments are
                    # never generated there. two_sided=True keeps the
                    # entry+exit variant (halved sweep/shading width is
                    # also the kernel's single largest perf lever).
                    if two_sided:
                        t_out = surface_t(False)

                        def two(x):
                            return jnp.concatenate([x, x], axis=0)

                        tcand = jnp.concatenate([t_in, t_out], axis=0)
                    else:

                        def two(x):
                            return x

                        tcand = t_in
                    tw = jnp.where(tcand < _BIG, two(t0) + tcand, _BIG)
                    # Near/far clip in NDC (the raster pipeline's clip
                    # volume), expressed as tw bounds precomputed per tile.
                    # Also culls grazing-ray junk candidates (k2 ~ 1e-20
                    # quadratics yield t ~ 1e16 'hits' whose blown-up
                    # shading is NaN under Mosaic) before they can reach
                    # the K-buffer or the overflow merge.
                    tw = jnp.where(
                        (tw >= tw_lo) & (tw <= tw_hi), tw, _BIG
                    )
                    # Exact modes compare in znd space: stored thresholds
                    # (the peel depth, the K-th node) are znd values the
                    # extraction computed from tw via this exact formula,
                    # so recomputing it reproduces them bit-for-bit —
                    # a tw-space threshold would misround the boundary
                    # fragment by an ulp and duplicate or skip a layer.
                    if use_peel or no_overflow:
                        znd_cand = zA - zB / jnp.maximum(
                            tw * invlen, 1e-12
                        )
                    if use_peel:
                        # Depth peeling (DepthPeelingRenderer.cpp:423):
                        # fragments at or in front of the previous pass's
                        # farthest extracted layer are already composited.
                        tw = jnp.where(
                            znd_cand > peel_in[k : k + 1, :], tw, _BIG
                        )
                    if store_mode not in _ACCUM_MODES:
                        # Per-pixel candidate rejection against the pixel's
                        # OWN last node (the tile-wide chunk/block culls
                        # cannot fire while ANY pixel in the tile is
                        # unsaturated — e.g. one background pixel): behind
                        # a blocked pixel's dK a fragment inserts at pos K
                        # and is an exact no-op (no_overflow) or merges
                        # with weight < 1 - sat (overflow). Rejection also
                        # shrinks nhit, which gates both the shading below
                        # and the number of extraction sweeps.
                        blocked, dK_row = _blocked_zk()
                        if no_overflow:
                            tw = jnp.where(
                                blocked & (znd_cand >= dK_row), _BIG, tw
                            )
                        else:
                            # Saturation mode tolerates the ulp-scale
                            # boundary misrounding of the tw-space compare
                            # (coincident surfaces only; within the
                            # 1 - sat error budget), which keeps the
                            # [2*sub, P] divide out of the hot path.
                            t_rej = zB / jnp.maximum(
                                zA - dK_row, 1e-9
                            ) * len_p
                            tw = jnp.where(
                                blocked & (tw >= t_rej), _BIG, tw
                            )

                    def shade_candidates():
                        # Shade ALL candidates once (headlight Blinn-Phong)
                        # via scalar identities: with unit ray d, the tube
                        # normal n = (p - axis(uax))/r satisfies
                        #   n.d = (rd + t - uax*bard)/r
                        #   n.t̂ = (y2 - uax*baba)*tnorm/r,  y2 = baoa+t*bard
                        # so cos1/cos2 need NO per-pixel normal or position
                        # reconstruction (saves ~60 [2*sub, P] vector ops vs
                        # computing nx/ny/nz explicitly).
                        bard2, rd2 = two(bard), two(rd)
                        y2 = two(baoa) + tcand * bard2
                        uax = jnp.clip(y2 * two(inv_baba), 0.0, 1.0)
                        attr = (
                            two(scal(7))
                            + two(scal(8)) * uax
                        )
                        inv_r2 = two(inv_r_s)
                        ndl = -(rd2 + tcand - uax * bard2) * inv_r2
                        tn2 = two(tnorm_s)
                        tdl = -bard2 * tn2
                        # n.t is nonzero on the sphere caps; full projection of
                        # the light onto the plane orthogonal to the tangent:
                        # cos2 = |n.l - (l.t)(n.t)| / sqrt(1 - (l.t)^2).
                        ndt = (y2 - uax * two(baba)) * tn2 * inv_r2
                        denom = jax.lax.rsqrt(
                            jnp.maximum(1.0 - tdl * tdl, 1e-6)
                        )
                        cos1 = jnp.clip(jnp.abs(ndl), 0.0, 1.0)
                        cos2_ = jnp.clip(
                            jnp.abs(ndl - tdl * ndt) * denom, 0.0, 1.0
                        )
                        e = 1.0 if use_bands else 1.7
                        # Mosaic lowers x**e as exp(e*log(x)) and log(0) is
                        # NaN there (not -inf like XLA:CPU) — silhouette
                        # fragments hit cos == 0 exactly, so clamp the base
                        # (1e-20**1.7 flushes to zero in f32, as intended).
                        cos1s = jnp.maximum(cos1, 1e-20)
                        cos2s = jnp.maximum(cos2_, 1e-20)
                        cosc = 0.3 * cos1s**e + 0.7 * cos2s**e
                        spec = 0.3 * cos1s**30.0
                        if store_mode == "gather":
                            # Opacity-optimization gather pass: store
                            # importance g_i and segment id instead of shaded
                            # color (reference GeometryPassOpacities.glsl).
                            rc = attr
                            gc = two(scal(9)) * jnp.ones_like(attr)  # seg id
                            bc = jnp.zeros_like(attr)
                            ac = jnp.ones_like(attr)
                        elif deferred_shade:
                            # Shade-after-extract: store the shading FEATURES
                            # (attr, cos1, cos2) premultiplied through the
                            # same node algebra; TF color, the Phong cosine
                            # POWERS (exp/log on the VPU — the kernel's only
                            # transcendentals) and the depth cue run once per
                            # extracted NODE in XLA (oit.shade_deferred_nodes)
                            # instead of once per candidate fragment here.
                            # Alpha stays exact in-kernel (ordering, overflow
                            # merge, saturation gate all need it).
                            alpha = _tf_channels_static(tf_opacity, 1, attr)[0]
                            if alpha_from_rows:
                                ac = jnp.clip(
                                    two(scal(11)) + two(scal(12)) * uax,
                                    0.0, 1.0,
                                )
                            else:
                                ac = alpha * opacity_scale
                            rc = attr
                            gc = cos1
                            bc = cos2_
                        else:
                            rgb, alpha = _tf_eval_static(
                                tf_color, tf_opacity, attr
                            )
                            shade_f = 0.1 + 0.9 * cosc
                            vzf = tw * invlen
                            fcue = jnp.clip(
                                (vzf - dmin) / jnp.maximum(dmax - dmin, 1e-6),
                                0.0, 1.0,
                            )
                            fcue = fcue * fcue * cue
                            if alpha_from_rows:
                                ac = jnp.clip(
                                    two(scal(11))
                                    + two(scal(12)) * uax,
                                    0.0, 1.0,
                                )
                            else:
                                ac = alpha * opacity_scale
                            rc = (rgb[0] * shade_f + spec) * (1 - fcue) \
                                + 0.5 * fcue
                            gc = (rgb[1] * shade_f + spec) * (1 - fcue) \
                                + 0.5 * fcue
                            bc = (rgb[2] * shade_f + spec) * (1 - fcue) \
                                + 0.5 * fcue
                        return rc, gc, bc, ac

                    if store_mode in _ACCUM_MODES:
                        rc, gc, bc, ac = shade_candidates()
                        # Accumulation modes: no per-fragment ordering.
                        valid_c = tw < _BIG
                        # MBOIT log depth warp (MBOITHeader.glsl:49-52).
                        vz_acc = tw * invlen
                        dw = jnp.clip(
                            (jnp.log(jnp.maximum(vz_acc, 1e-9)) - log_dmin)
                            / jnp.maximum(log_dmax - log_dmin, 1e-9)
                            * 2.0
                            - 1.0,
                            -1.0, 1.0,
                        )
                        if store_mode == "count":
                            d_refs[0][k : k + 1, :] += jnp.sum(
                                jnp.where(valid_c, 1.0, 0.0), axis=0,
                                keepdims=True,
                            )
                        elif store_mode == "mboit_gen":
                            # Power-moment accumulation, single precision
                            # (MomentOIT.glsl:69-133 generatePowerMoments).
                            absorb = jnp.minimum(
                                -jnp.log(jnp.maximum(1.0 - ac, 1e-7)), 10.0
                            )
                            absorb = jnp.where(valid_c, absorb, 0.0)
                            d_refs[0][k : k + 1, :] += jnp.sum(
                                absorb, axis=0, keepdims=True
                            )
                            odd_slots = (
                                r_refs[0], g_refs[0], b_refs[0], a_refs[0]
                            )
                            even_slots = (
                                d_refs[1], r_refs[1], g_refs[1], b_refs[1]
                            )
                            if trig:
                                # Trigonometric moments: complex powers of
                                # the unit-circle point at the warped depth
                                # (MomentOIT.glsl:338-355); odd slots hold
                                # Re(m_k), even slots Im(m_k).
                                for j, (p_re, p_im) in enumerate(
                                    circle_powers(dw, wzp_y, n_mom // 2)
                                ):
                                    odd_slots[j][k : k + 1, :] += jnp.sum(
                                        p_re * absorb, axis=0, keepdims=True
                                    )
                                    even_slots[j][k : k + 1, :] += jnp.sum(
                                        p_im * absorb, axis=0, keepdims=True
                                    )
                            else:
                                d2 = dw * dw
                                pow_odd = dw
                                pow_even = d2
                                for j in range(n_mom // 2):
                                    odd_slots[j][k : k + 1, :] += jnp.sum(
                                        pow_odd * absorb, axis=0,
                                        keepdims=True,
                                    )
                                    even_slots[j][k : k + 1, :] += jnp.sum(
                                        pow_even * absorb, axis=0,
                                        keepdims=True,
                                    )
                                    pow_odd = pow_odd * d2
                                    pow_even = pow_even * d2
                        elif store_mode == "mboit_resolve":
                            # Pass 2: reconstruct per-fragment transmittance
                            # from the pass-1 moments and accumulate weighted
                            # premultiplied color (MBOITPass2.glsl:21-37).
                            nh = n_mom // 2
                            b0v = mom_in[0][k : k + 1, :]
                            inv_b0 = 1.0 / jnp.maximum(b0v, 1e-6)
                            odds = tuple(
                                mom_in[1 + j][k : k + 1, :] * inv_b0
                                for j in range(nh)
                            )
                            evens = tuple(
                                mom_in[1 + nh + j][k : k + 1, :] * inv_b0
                                for j in range(nh)
                            )
                            if trig:
                                trans_fn = {
                                    4: transmittance_at_depth_trig_2,
                                    6: transmittance_at_depth_trig_3,
                                    8: transmittance_at_depth_trig_4,
                                }[n_mom]
                                T_at = trans_fn(
                                    b0v, list(zip(odds, evens)), dw,
                                    m_bias, m_overest, wzp_y, wzp_z, wzp_w,
                                )
                            else:
                                trans_fn = {
                                    4: transmittance_at_depth_4,
                                    6: transmittance_at_depth_6,
                                    8: transmittance_at_depth_8,
                                }[n_mom]
                                T_at = trans_fn(
                                    b0v, evens, odds, dw, m_bias, m_overest
                                )
                            # b_0 below threshold -> no absorbance recorded
                            # (resolveMoments discard, MomentOIT.glsl:421).
                            T_at = jnp.where(
                                b0v < 0.00100050033, 1.0, T_at
                            )
                            wgt = jnp.where(valid_c, ac * T_at, 0.0)
                            r_refs[0][k : k + 1, :] += jnp.sum(
                                wgt * rc, axis=0, keepdims=True
                            )
                            g_refs[0][k : k + 1, :] += jnp.sum(
                                wgt * gc, axis=0, keepdims=True
                            )
                            b_refs[0][k : k + 1, :] += jnp.sum(
                                wgt * bc, axis=0, keepdims=True
                            )
                            a_refs[0][k : k + 1, :] += jnp.sum(
                                wgt, axis=0, keepdims=True
                            )
                        else:
                            # WBOIT depth weight (WBOITGather.glsl:14-37).
                            vzc = tw * invlen
                            zndc = zA - zB / jnp.maximum(vzc, 1e-12)
                            wgt = jnp.clip(
                                jnp.power(
                                    jnp.minimum(ac * 10.0, 1.0) + 0.01, 3.0
                                )
                                * 1e8
                                * jnp.power(
                                    1.0 - jnp.clip(zndc, 0.0, 1.0) * 0.9, 3.0
                                ),
                                1e-2, 3e3,
                            )
                            wa = jnp.where(valid_c, wgt * ac, 0.0)
                            r_refs[0][k : k + 1, :] += jnp.sum(
                                wa * rc, axis=0, keepdims=True
                            )
                            g_refs[0][k : k + 1, :] += jnp.sum(
                                wa * gc, axis=0, keepdims=True
                            )
                            b_refs[0][k : k + 1, :] += jnp.sum(
                                wa * bc, axis=0, keepdims=True
                            )
                            a_refs[0][k : k + 1, :] += jnp.sum(
                                wa, axis=0, keepdims=True
                            )
                            # Revealage as sum of log(1 - a).
                            d_refs[0][k : k + 1, :] += jnp.sum(
                                jnp.where(
                                    valid_c,
                                    jnp.log(jnp.maximum(1.0 - ac, 1e-6)),
                                    0.0,
                                ),
                                axis=0, keepdims=True,
                            )

                    # K nearest extractions + insertion into the node
                    # array.  The sweep count is data-dependent
                    # (min(nhit, K)): one fori_loop with a dynamic trip
                    # count instead of K statically-unrolled pl.when
                    # regions — K scalar-core branches per block cost more
                    # than the skipped vector work they guard.
                    def sweep_once(rc, gc, bc, ac, R=K):
                        # R < K (narrow fast path): occupancy + pending
                        # sweeps fit in the first R rows, so rows [R:]
                        # are sentinels throughout and eviction is
                        # impossible — the insert runs on [R, P] slices.

                        def _run():
                            tw_s = tw_scr[:]
                            bt = jnp.min(tw_s, axis=0, keepdims=True)
                            has = bt < _BIG
                            # Near-ties are duplicated geometry (coincident caps
                            # of adjacent segments): average them, which both
                            # breaks the tie and dedups the joint (the reference
                            # tube mesh has a single shared surface there).
                            # The window is a relative epsilon, not exact fp
                            # equality — coincident-surface intersections computed
                            # through different ray arithmetic (e.g. the band
                            # window of the sharded path) differ by ~1 ulp.
                            win = tw_s <= bt + jnp.abs(bt) * 1e-6
                            nwin = jnp.maximum(
                                jnp.sum(
                                    jnp.where(win, 1.0, 0.0), axis=0, keepdims=True
                                ),
                                1.0,
                            )

                            def sel(v, win=win, nwin=nwin):
                                return (
                                    jnp.sum(
                                        jnp.where(win, v, 0.0), axis=0,
                                        keepdims=True,
                                    )
                                    / nwin
                                )

                            vz = bt * invlen
                            znd = jnp.where(
                                has, zA - zB / jnp.maximum(vz, 1e-12), 2.0
                            )

                            # When no candidate remains (has=False), win covers
                            # every (invalid) candidate and sel() would average
                            # their garbage — invalid-candidate shading can be
                            # NaN under Mosaic's transcendental lowering, and
                            # IEEE 0*NaN = NaN would poison the overflow merge.
                            # Gate every carried quantity on `has`.
                            def selh(v):
                                return jnp.where(has, sel(v), 0.0)

                            sa = selh(ac)
                            if store_mode == "gather":
                                carry = (znd, selh(rc), selh(gc), selh(bc), sa)
                            else:
                                carry = (
                                    znd,
                                    selh(rc) * sa,
                                    selh(gc) * sa,
                                    selh(bc) * sa,
                                    sa,
                                )
                            # Vectorized insertion sort over the [K, P] node
                            # buffer: pos = #{j : d_j <= carry} (strict-< swap
                            # semantics — the carry lands AFTER equal depths),
                            # rows < pos keep, row pos takes the carry, rows >
                            # pos shift down.  pos == K (including the
                            # has=False carry, whose depth 2.0 ties the empty-
                            # node sentinel) is automatically a no-op.
                            d_all = node_scr[0][0:R]
                            cd = carry[0]
                            kidx = jax.lax.broadcasted_iota(jnp.int32, (R, P), 0)
                            pos = jnp.sum(
                                jnp.where(d_all <= cd, 1, 0), axis=0,
                                keepdims=True,
                            )
                            # Cross-boundary dedup: a carry whose depth
                            # matches an EXISTING node (the same relative
                            # tie window, mapped from view distance into
                            # NDC: d(znd)/d(tw) = zB/(tw^2 invlen)) is the
                            # coincident surface already extracted in an
                            # earlier block/chunk — the within-sweep window
                            # only dedups ties that land in the same block.
                            # pos = K turns the insert into a no-op.
                            # Known asymmetry (accepted): two DISTINCT
                            # tubes crossing within the ~1e-6-relative
                            # window lose the later surface's alpha here,
                            # where the within-sweep window would average
                            # them. Matching on segment id would fix it but
                            # costs a 6th node channel through every sweep;
                            # the window is ~1 ulp wide, so genuine losses
                            # are confined to exactly-coincident geometry.
                            eps_znd = jnp.abs(zB) * 1e-6 / jnp.maximum(
                                bt * invlen, 1e-12
                            )
                            dup = (
                                jnp.sum(
                                    jnp.where(
                                        (jnp.abs(d_all - cd) <= eps_znd)
                                        & (d_all < 2.0),
                                        1, 0,
                                    ),
                                    axis=0, keepdims=True,
                                )
                                > 0
                            ) & has
                            pos = jnp.where(dup, R, pos)

                            def ins(all_v, c_v):
                                shifted = jnp.concatenate(
                                    [all_v[0:1], all_v[: R - 1]], axis=0
                                )
                                return jnp.where(
                                    kidx < pos, all_v,
                                    jnp.where(kidx == pos, c_v, shifted),
                                )

                            olds = tuple(s[0:R] for s in node_scr)
                            news = [ins(o, c) for o, c in zip(olds, carry)]
                            if not no_overflow and R == K:
                                # Evicted fragment (the old last node if an
                                # insert happened, else the carry itself):
                                # composite into the last node (MLAB overflow
                                # merge), weighted by its remaining
                                # transmittance under the node.
                                ev_sel = pos < K
                                evs = [
                                    jnp.where(ev_sel, o[K - 1 : K, :], c)
                                    for o, c in zip(olds, carry)
                                ]
                                # A dedup-dropped carry must not be merged
                                # either — it IS an already-extracted node.
                                evict_has = (
                                    has & jnp.logical_not(dup)
                                    & (evs[0] < 2.0)
                                )
                                aK = news[4][K - 1 : K, :]
                                w = 1.0 - aK

                                def merge(c):
                                    # select, don't multiply: w*NaN would
                                    # poison the node even with w == 0
                                    return jnp.where(evict_has, w * c, 0.0)

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
                                ref[0:R] = new
                            tw_scr[:] = jnp.where(win, _BIG, tw_s)

                        _run()

                    if store_mode not in _ACCUM_MODES:
                        tw_scr[:] = tw
                        nhit = jnp.max(
                            jnp.sum(jnp.where(tw < _BIG, 1, 0), axis=0)
                        )

                        # Candidate shading and the extraction sweeps only
                        # run while the block has a live candidate at all —
                        # in saturated tiles the per-pixel rejection above
                        # empties whole blocks, which then pay only the
                        # intersection math.
                        @pl.when(nhit > 0)
                        def _():
                            rc, gc, bc, ac = shade_candidates()
                            nsw = jnp.minimum(nhit, K)

                            def _sweeps(R):
                                def _sweep_body(_s, carry):
                                    sweep_once(rc, gc, bc, ac, R=R)
                                    return carry

                                jax.lax.fori_loop(
                                    0, nsw, _sweep_body, jnp.int32(0)
                                )

                            if not narrow_on:
                                _sweeps(K)
                            else:
                                # Occupancy can grow by at most one node
                                # per sweep: while occ + nsw fits the
                                # narrow window, the whole block inserts
                                # into [NARROW_R, P] slices.
                                narrow = occ_smem[0] + nsw <= _NARROW_R

                                @pl.when(narrow)
                                def _():
                                    _sweeps(_NARROW_R)

                                @pl.when(jnp.logical_not(narrow))
                                def _():
                                    _sweeps(K)

                                # Exact recompute (nodes pack as a depth-
                                # sorted prefix): one [K, P] compare+sum.
                                occ_smem[0] = jnp.max(
                                    jnp.sum(
                                        jnp.where(
                                            node_scr[0][:] < 2.0, 1, 0
                                        ),
                                        axis=0,
                                    )
                                )

                @pl.when(jnp.logical_not(exit_now))
                def _():
                    @pl.when(c + 1 < nch)
                    def _():
                        get_dma(slot_of(c + 1), c + 1).start()

                    for j in range(C // sub):
                        jlo = j * sub

                        def scal_j(r, jlo=jlo):
                            # Plain [sub, 1] sublane slice — the payload
                            # arrives pair-major, so no per-read transpose.
                            return coef[jlo : jlo + sub, r : r + 1]

                        lane_s = jax.lax.broadcasted_iota(
                            jnp.int32, (sub, 1), 0
                        )
                        glob_lo = (b0 + c) * C + jlo
                        in_run_s = (glob_lo + lane_s >= base) & (
                            glob_lo + lane_s < base + count
                        )
                        live = (glob_lo < base + count) & (
                            glob_lo + sub > base
                        )
                        if store_mode not in _ACCUM_MODES:
                            # Block-level cull against the CURRENT node
                            # state (the chunk-level early exit only sees
                            # the previous chunk's carry): skip the block
                            # when every pixel that could still accept a
                            # fragment has its bound in front of the
                            # block's nearest candidate.
                            sub_zmin = jnp.min(
                                jnp.where(
                                    in_run_s, zmin_t[jlo : jlo + sub], 3.0
                                )
                            )
                            blocked_b, dK_b = _blocked_zk()
                            zk_eff_cur = jnp.max(
                                jnp.where(blocked_b, dK_b, 2.0)
                            )
                            live = live & (sub_zmin <= zk_eff_cur)

                        @pl.when(live)
                        def _(scal_j=scal_j, in_run_s=in_run_s):
                            process(scal_j, in_run_s)

                if store_mode in _ACCUM_MODES:
                    zk_eff = jnp.float32(2.0)
                else:
                    blocked_c, dK_c = _blocked_zk()
                    zk_eff = jnp.max(jnp.where(blocked_c, dK_c, 2.0))
                c_next = jnp.where(exit_now, nch, c + 1)
                return (c_next, zk_eff)

            jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.float32(2.0))
            )
            if composite:
                # Shade + front-to-back blend the K nodes here instead of
                # writing 5*K node planes for an XLA resolve: at K=8 this
                # replaces 40 [T, P] output planes (330 MB at 1080p) with
                # 4, and the whole shade runs on [K, P] node buffers
                # already in VMEM (K=8, P=128 is a single vreg). Math
                # mirrors oit.shade_deferred_nodes + the FTB loop of
                # render_tubes_mlab exactly.
                dS = node_scr[0][:]
                fa = node_scr[1][:]
                f1 = node_scr[2][:]
                f2 = node_scr[3][:]
                aN = node_scr[4][:]
                inv_a = jnp.where(
                    aN > 1e-6, 1.0 / jnp.maximum(aN, 1e-6), 0.0
                )
                attr_n = fa * inv_a
                cos1n = jnp.maximum(f1 * inv_a, 1e-20)
                cos2n = jnp.maximum(f2 * inv_a, 1e-20)
                e_n = 1.0 if use_bands else 1.7
                cosc_n = 0.3 * cos1n**e_n + 0.7 * cos2n**e_n
                spec_n = 0.3 * cos1n**30.0
                rgb_n, _ = _tf_eval_static(tf_color, tf_opacity, attr_n)
                shade_n = 0.1 + 0.9 * cosc_n
                vz_n = zB / jnp.maximum(zA - dS, 1e-9)
                fcue_n = jnp.clip(
                    (vz_n - dmin) / jnp.maximum(dmax - dmin, 1e-6),
                    0.0, 1.0,
                )
                fcue_n = fcue_n * fcue_n * cue
                cols = [
                    ((c * shade_n + spec_n) * (1.0 - fcue_n)
                     + 0.5 * fcue_n) * aN
                    for c in rgb_n
                ]
                T = jnp.ones((1, P), jnp.float32)
                accs = [jnp.zeros((1, P), jnp.float32) for _ in range(3)]
                for j in range(K):
                    aj = aN[j : j + 1, :]
                    for ch in range(3):
                        accs[ch] = accs[ch] + T * cols[ch][j : j + 1, :]
                    T = T * (1.0 - aj)
                for ch in range(3):
                    out[ch][k : k + 1, :] = (
                        accs[ch] + T * params_ref[24 + ch]
                    )
                out[3][k : k + 1, :] = 1.0 - T
            elif store_mode not in _ACCUM_MODES:
                # Final node state -> per-node output planes.
                for group, ref in zip(
                    (d_refs, r_refs, g_refs, b_refs, a_refs), node_scr
                ):
                    for j in range(K):
                        group[j][k : k + 1, :] = ref[j : j + 1, :]


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile_w", "tile_h", "K", "tf_color", "tf_opacity",
        "use_bands", "store_mode", "alpha_from_rows", "n_mom", "trig",
        "no_overflow", "deferred_shade", "sub", "sat", "composite",
        "two_sided", "interpret",
    ),
)
def rasterize_capsules_mlab(
    csr: SortedBinning,
    params: jnp.ndarray,  # [24] (see tube_raster.prepare_capsule_frame)
    width: int,
    height: int,
    tile_w: int = 32,
    tile_h: int = 16,
    K: int = 8,
    tf_color: tuple = (),
    tf_opacity: tuple = ((0.0, 1.0), (1.0, 1.0)),
    use_bands: bool = False,
    store_mode: str = "shade",
    alpha_from_rows: bool = False,
    n_mom: int = 4,
    trig: bool = False,  # trigonometric moments (TrigonometricMomentMath)
    moments: jnp.ndarray = None,  # [1 + n_mom, n_tiles, P] for mboit_resolve
    peel: jnp.ndarray = None,  # [n_tiles, P] znd threshold (depth peeling)
    no_overflow: bool = False,  # drop evicted fragments (exact peeling pass)
    deferred_shade: bool = False,  # nodes carry (attr, cosc, spec) features
    sub: int = 32,  # compute sub-chunk width (DMA stays at `chunk`)
    # Transmittance budget for behind-dK rejection: fragments behind the
    # K-th node drop once the K-node cumulative transmittance
    # T_K = prod(1 - a_i) falls to <= 1 - sat. The TOTAL contribution of
    # all dropped fragments composites under T_K, so the per-pixel error
    # is rigorously < 1 - sat (sat >= 2 disables culling entirely).
    sat: float = 0.999,
    composite: bool = False,  # shade + blend the K nodes in-kernel
    # Default False = front-face fragments only, matching the reference's
    # CULL_BACK for every transparent pipeline (LineRasterPass.cpp:86-91).
    two_sided: bool = False,
    interpret: bool = False,
):
    """MLAB-K transparency pass.

    Returns (depths [K, n_tiles, P], premultiplied rgb [3, K, n_tiles, P],
    alpha [K, n_tiles, P]). Empty nodes have depth 2.0 and alpha 0.

    With `composite=True` (requires store_mode='shade', deferred_shade,
    no peel) the kernel instead shades its K nodes and blends them
    front-to-back over the background color in params[24:28], returning
    one [4, n_tiles, P] RGBA image — the XLA resolve and its 5*K node
    planes of HBM traffic disappear entirely.

    store_mode 'mboit_gen' (requires K=2) accumulates MBOIT power moments:
    channel layout b0 -> depths[0]; odd moments m1,m3(,m5,m7) -> rgb[0,0],
    rgb[1,0], rgb[2,0], alpha[0]; even moments m2,m4(,m6,m8) -> depths[1],
    rgb[0,1], rgb[1,1], rgb[2,1].  store_mode 'mboit_resolve' takes the
    stacked pass-1 channels via `moments` (order: b0, odds, evens) and
    accumulates (rgb*a*T_at_depth, a*T_at_depth) into rgb[:,0]/alpha[0].
    """
    n_tiles = csr.tile_start.shape[0]
    C = csr.chunk
    R = csr.payload.shape[0]
    P = tile_w * tile_h
    n_pad = -(-n_tiles // TILE_GROUP) * TILE_GROUP
    counts = jnp.pad(csr.tile_count, (0, n_pad - n_tiles))
    starts = jnp.pad(csr.tile_start, (0, n_pad - n_tiles))
    n_out = 4 if composite else 5 * K
    if store_mode == "mboit_gen" and K != 2:
        raise ValueError("mboit_gen requires K=2 (moment channel layout)")
    if deferred_shade and store_mode != "shade":
        raise ValueError("deferred_shade only applies to store_mode='shade'")
    if composite and not (
        deferred_shade and store_mode == "shade" and peel is None
    ):
        raise ValueError(
            "composite requires store_mode='shade' + deferred_shade, no peel"
        )
    # Sub-chunk width: a divisor of C, sublane-aligned (multiple of 8).
    # A sub wider than the chunk clamps to it (small test scenes use tiny
    # chunks); anything else is a caller error, not a silent fallback.
    if sub >= C:
        sub = C
    elif sub <= 0 or C % sub or sub % 8:
        raise ValueError(
            f"sub={sub} must be a multiple-of-8 divisor of chunk={C}"
        )

    kernel = functools.partial(
        _mlab_kernel,
        tile_w=tile_w,
        tile_h=tile_h,
        tiles_x=csr.tiles_x,
        chunk=C,
        width=width,
        height=height,
        K=K,
        tf_color=tf_color,
        tf_opacity=tf_opacity,
        use_bands=use_bands,
        store_mode=store_mode,
        alpha_from_rows=alpha_from_rows,
        n_mom=n_mom,
        trig=trig,
        use_peel=peel is not None,
        no_overflow=no_overflow,
        deferred_shade=deferred_shade,
        sub=sub,
        sat=sat,
        composite=composite,
        two_sided=two_sided,
    )
    extra_in = []
    extra_in_specs = []
    pad_t = n_pad - n_tiles

    def _blocked_input(arr):
        extra_in.append(jnp.pad(arr, ((0, pad_t), (0, 0))))
        extra_in_specs.append(
            pl.BlockSpec(
                (TILE_GROUP, P), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            )
        )

    if store_mode == "mboit_resolve":
        n_min = 1 + n_mom
        if moments is None or moments.shape[0] != n_min:
            raise ValueError(f"mboit_resolve needs moments[{n_min}, T, P]")
        for i in range(n_min):
            _blocked_input(moments[i])
    if peel is not None:
        _blocked_input(peel)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pad // TILE_GROUP,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + extra_in_specs,
        out_specs=[
            pl.BlockSpec(
                (TILE_GROUP, P), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            )
        ]
        * n_out,
        scratch_shapes=[
            # TILE_GROUP first-chunk prefetch slots + 2 double-buffer slots.
            # Pair-major [C, 128] blocks (see payload_hbm comment).
            pltpu.VMEM((TILE_GROUP + 2, C, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((TILE_GROUP + 2,)),
            # [K, P] node-buffer channels (d, r, g, b, a) for the
            # vectorized insertion sort.
            *([pltpu.VMEM((K, P), jnp.float32)] * 5),
            # Candidate-depth scratch ([2*sub, P] two-sided, [sub, P]
            # front-only): lets the K extraction sweeps be individually
            # skipped (pl.when on the live hit count).
            pltpu.VMEM(((2 if two_sided else 1) * sub, P), jnp.float32),
            # Narrow-insert occupancy cell (K > 8 K-buffer modes only).
            *([pltpu.SMEM((1,), jnp.int32)]
              if K > 8 and store_mode not in _ACCUM_MODES else []),
        ],
    )
    # Pair-major payload: one whole-array XLA transpose per frame (~0.1 ms
    # of HBM traffic at 1080p) buys zero in-kernel lane->sublane
    # transposes — the row-major layout cost ~17 [1,C]->[C,1] transposes
    # per candidate block, the dominant per-block fixed cost. The row dim
    # pads to 128 lanes (Mosaic: lane-dim DMA slices must be 128-aligned);
    # the padding lanes are DMA'd but never read (~0.8 ms of extra HBM
    # traffic at Tornado@1080p — bandwidth the r4 profile showed is idle).
    payload_t = jnp.pad(csr.payload.T, ((0, 0), (0, 128 - R)))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad, P), jnp.float32)] * n_out,
        interpret=interpret,
    )(counts, starts, params, payload_t, *extra_in)
    outs = [o[:n_tiles] for o in outs]
    if composite:
        return jnp.stack(outs, axis=0)  # [4, n_tiles, P] RGBA
    depths = jnp.stack(outs[0:K], axis=0)
    rgb = jnp.stack(
        [jnp.stack(outs[K : 2 * K], 0), jnp.stack(outs[2 * K : 3 * K], 0),
         jnp.stack(outs[3 * K : 4 * K], 0)],
        axis=0,
    )
    alpha = jnp.stack(outs[4 * K : 5 * K], axis=0)
    return depths, rgb, alpha
