"""Analytic capsule (tube segment) rasterizer — the primary line renderer.

Instead of triangulating tubes (16 triangles per segment through the
triangle machinery), each line segment is rendered as a **capsule /
linear-swept sphere** with an exact per-pixel ray intersection — the same
geometric model as the reference's hardware ray tracer's LSS mode
(`src/Renderers/RayTracing/VulkanRayTracer.hpp:53-63`, analytic tests
`Data/Shaders/Renderers/RayTracing/RayIntersectionTestsVulkan.glsl:39-140`)
— but driven by screen-space tile binning like its rasterizers. On TPU
this wins decisively: 16x fewer primitives to bin/sort/gather, pixel-exact
round tubes, and the inner loop is dense [C, P] vector math fed by two
[3, C] x [3, P] MXU dots per chunk.

Payload rows (16, per segment; o = camera origin, capsule (a, b, r));
packed by `render/tube_raster.py:prepare_capsule_frame`:
  0-2:  oa = o - a
  3-5:  ba = b - a
  6:    r
  7:    attr0 (attribute at a)
  8:    dattr (attr1 - attr0)
  9:    id (float, exact below 2^24)
  10:   baba = |ba|^2
  11:   alpha0 — per-segment alpha at a (opacity optimization; 1 otherwise)
  12:   dalpha — alpha(b) - alpha(a)
  13:   cap_a — 1.0 where the start cap renders (chain starts only)
  14:   Cb = |ob|^2 - r^2 (cap-b sphere constant, ob = oa - ba; unused here,
        consumed by the OIT variant in `raster_capsule_oit.py`)
  15:   conservative min NDC depth (bucket-floored sort key)

Scalar-prefetch params[16]: rows 0-8 the camera ray basis (row-major; ray
dir = B @ [u_ndc, v_ndc, 1], unit forward component), 9: A and 10: Bc of
the depth mapping z_ndc = A - Bc / view_z.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from linevis_tpu.kernels.raster_pallas import TILE_GROUP, SortedBinning

__all__ = ["rasterize_capsules_pallas"]

_BIG = 1e30


def _capsule_kernel(
    count_ref,  # [n_tiles_pad] SMEM — pairs per tile
    start_ref,  # [n_tiles_pad] SMEM — first pair of each tile's run
    params_ref,  # [16] SMEM
    payload_hbm,  # [Np + C, 128] tile-sorted pair payload, PAIRS AS
    #   ROWS (pre-transposed in XLA, row dim zero-padded to 128 lanes for
    #   DMA alignment): per-candidate scalars land on SUBLANES, so the
    #   kernel's [sub, 1] payload reads are plain slices instead of
    #   [1, C] -> [C, 1] lane->sublane transposes (the dominant per-block
    #   fixed cost in the row-major layout; see raster_capsule_oit.py)
    depth_ref,  # [TILE_GROUP, P] z_ndc
    id_ref,  # [TILE_GROUP, P] float ids
    attr_ref,  # [TILE_GROUP, P] interpolated attribute
    nx_ref,  # [TILE_GROUP, P] surface normal (unnormalized)
    ny_ref,
    nz_ref,
    tx_ref,  # [TILE_GROUP, P] tangent (unnormalized ba)
    ty_ref,
    tz_ref,
    cov_ref,  # [TILE_GROUP, P] analytic pixel coverage of the winner
    coef_scr,  # [TILE_GROUP + 2, C, 128]
    sem,
    *,
    tile_w: int,
    tile_h: int,
    tiles_x: int,
    chunk: int,
    width: int,
    height: int,
    use_early_z: bool,
    use_aa: bool,
    sub: int,  # compute sub-chunk width (DMA stays at `chunk`)
):
    gi = pl.program_id(0)
    C = chunk
    P = tile_w * tile_h

    lin = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    ly = (lin // tile_w).astype(jnp.float32)
    lx = (lin % tile_w).astype(jnp.float32)

    depth_ref[:] = jnp.full(depth_ref.shape, 2.0, jnp.float32)
    id_ref[:] = jnp.full(id_ref.shape, -1.0, jnp.float32)
    for r in (attr_ref, nx_ref, ny_ref, nz_ref, tx_ref, ty_ref, tz_ref,
              cov_ref):
        r[:] = jnp.zeros(r.shape, jnp.float32)

    zA = params_ref[9]
    zB = params_ref[10]
    px = params_ref[19]  # world units per pixel at view depth 1 (AA)

    # Group prologue: start the FIRST chunk's DMA for every tile in the
    # group up front (slot k, sem k) so tile k's payload lands while
    # tiles 0..k-1 compute — most tiles hold a single chunk, so without
    # this each tile's processing begins with a cold DMA wait. Later
    # chunks (c >= 1) double-buffer through the two extra slots.
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
        # Runs are pair-granular but lane DMAs must be C-aligned: iterate
        # aligned windows covering [base, base+count) and mask boundaries.
        b0 = base // C
        nch = jnp.where(count > 0, (base + count + C - 1) // C - b0, 0)
        ty = (t // tiles_x).astype(jnp.float32)
        tx = (t % tiles_x).astype(jnp.float32)
        gx = tx * tile_w + lx + 0.5  # [1, P]
        gy = ty * tile_h + ly + 0.5
        un = gx * (2.0 / width) - 1.0
        vn = 1.0 - gy * (2.0 / height)
        dx = params_ref[0] * un + params_ref[1] * vn + params_ref[2]
        dy = params_ref[3] * un + params_ref[4] * vn + params_ref[5]
        dz = params_ref[6] * un + params_ref[7] * vn + params_ref[8]
        invlen = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        dn = jnp.concatenate(
            [dx * invlen, dy * invlen, dz * invlen], axis=0
        )  # [3, P]

        def slot_of(c, k=k):
            # Chunk 0 was group-prefetched into slot k; chunks >= 1
            # double-buffer through the two extra slots.
            return jnp.where(c == 0, k, TILE_GROUP + jax.lax.rem(c, 2))

        def get_dma(slot, c, b0=b0):
            start = pl.multiple_of((b0 + c) * C, C)
            return pltpu.make_async_copy(
                payload_hbm.at[pl.ds(start, C), :], coef_scr.at[slot],
                sem.at[slot],
            )

        @pl.when(nch > 0)
        def _(nch=nch, count=count, base=base, b0=b0, dn=dn, invlen=invlen,
              k=k, get_dma=get_dma, slot_of=slot_of):

            def cond(state):
                c, _zfar = state
                return c < nch

            def body(state):
                c, zfar_prev = state
                slot = slot_of(c)
                get_dma(slot, c).wait()
                coef = coef_scr[slot]  # [C, 128] (pairs are sublanes)
                lane = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
                glob = (b0 + c) * C + lane
                in_run = (glob >= base) & (glob < base + count)
                # Conservative chunk zmin over in-run lanes only (boundary
                # chunks contain neighbors' pairs).
                zmin_t = coef[:, 15:16]  # [C, 1]
                chunk_zmin = jnp.min(jnp.where(in_run, zmin_t, 3.0))
                exit_now = (
                    (chunk_zmin > zfar_prev) if use_early_z else jnp.bool_(False)
                )

                # Per-candidate-block processing on [sub, P] slices: the DMA
                # granularity stays at `chunk` (lane-dim DMA offsets must be
                # 128-aligned) but compute skips the sub-blocks outside the
                # tile's pair run — the median tile holds a small fraction
                # of the chunk it overlaps (see raster_capsule_oit.py).
                def process(scal, in_run):

                    def dot_dn(r):
                        # [C,1] x [1,P] broadcast FMA per component. NOT an
                        # MXU dot: the TPU MXU evaluates f32 contractions at
                        # reduced precision, which breaks the re-origined
                        # capsule quadratic (segment scale ~1e-3).
                        return (
                            scal(r) * dn[0:1, :]
                            + scal(r + 1) * dn[1:2, :]
                            + scal(r + 2) * dn[2:3, :]
                        )

                    bard = dot_dn(3)  # ba . dn  [C, P]
                    rdoa = dot_dn(0)  # oa . dn  [C, P]
                    baba = scal(10)
                    rr = scal(6) * scal(6)

                    # Precision preconditioning: segments are typically 1e-3
                    # of the camera distance, so the raw capsule quadratic
                    # cancels catastrophically in f32 (h ~ 1e-18 vs term
                    # magnitudes ~1e-12). Re-origin each ray at its closest
                    # approach to the segment midpoint: all quantities become
                    # segment-scale and the quadratic is well conditioned.
                    t0 = -(rdoa + 0.5 * bard)  # [C, P]
                    oax = scal(0) + t0 * dn[0:1, :]
                    oay = scal(1) + t0 * dn[1:2, :]
                    oaz = scal(2) + t0 * dn[2:3, :]
                    baoa = scal(3) * oax + scal(4) * oay + scal(5) * oaz
                    oaoa = oax * oax + oay * oay + oaz * oaz
                    rd = rdoa + t0  # = dn . oa'  (== 0.5*bard)

                    # Cylinder body (iq's capsule quadratic, primed frame).
                    k2 = jnp.maximum(baba - bard * bard, 1e-20)
                    k1 = baba * rd - baoa * bard
                    k0 = baba * oaoa - baoa * baoa - rr * baba
                    h = k1 * k1 - k2 * k0
                    tb = (-k1 - jnp.sqrt(jnp.maximum(h, 0.0))) / k2
                    yb = baoa + tb * bard
                    # Sphere cap at a.
                    ha = rd * rd - (oaoa - rr)
                    ta = -rd - jnp.sqrt(jnp.maximum(ha, 0.0))
                    ya = baoa + ta * bard
                    # Sphere cap at b (ob' = oa' - ba).
                    b1b = rd - bard
                    obob = oaoa - 2.0 * baoa + baba
                    hb = b1b * b1b - (obob - rr)
                    tbb = -b1b - jnp.sqrt(jnp.maximum(hb, 0.0))
                    yb2 = baoa + tbb * bard

                    if use_aa:
                        # Analytic coverage AA (the reference's role of MSAA
                        # 8x, OpaqueLineRenderer.hpp:40): on a miss the
                        # -sqrt(max(h,0)) roots above ARE the closest-
                        # approach t, and the ray-to-axis miss distance
                        # follows from the discriminant (the capsule
                        # quadratic equals baba*(d_perp(t)^2 - r^2), so
                        # d_min^2 = r^2 - h/(k2*baba); caps analogously
                        # d_min^2 = r^2 - h). Accept candidates whose
                        # silhouette passes within half a pixel footprint
                        # and record coverage = 0.5 + signed pixel distance,
                        # the straight-edge pixel coverage model
                        # (Antialiasing.glsl role, built into the raster).
                        r_w = scal(6)

                        def sdist(d2, t_rel):
                            # Coverage is a 0..1 blend factor: the approx
                            # reciprocal's 2^-12 relative error is far below
                            # a visible coverage step.
                            w_px = jnp.maximum(
                                (t0 + t_rel) * invlen, 1e-6
                            ) * px
                            return (
                                r_w - jnp.sqrt(jnp.maximum(d2, 0.0))
                            ) * pl.reciprocal(w_px, approx=True)

                        sdb = sdist(
                            rr - h * pl.reciprocal(k2 * baba, approx=True), tb
                        )
                        sda = sdist(rr - ha, ta)
                        sdb2 = sdist(rr - hb, tbb)
                        okb = (sdb > -0.5) & (yb > 0.0) & (yb < baba)
                        oka = (sda > -0.5) & (ya <= 0.0) & (scal(13) > 0.5)
                        okb2 = (sdb2 > -0.5) & (yb2 >= baba)
                    else:
                        okb = (h >= 0.0) & (yb > 0.0) & (yb < baba)
                        # Start caps render only at chain starts (payload row
                        # 13); interior joints are covered by the previous
                        # segment's b-cap (identical union, single blend per
                        # joint).
                        oka = (ha >= 0.0) & (ya <= 0.0) & (scal(13) > 0.5)
                        okb2 = (hb >= 0.0) & (yb2 >= baba)
                    # Positivity in the ORIGINAL frame: t_world = t0 + t'.
                    okb = okb & (t0 + tb > 0.0) & in_run
                    oka = oka & (t0 + ta > 0.0) & in_run
                    okb2 = okb2 & (t0 + tbb > 0.0) & in_run

                    tall = jnp.minimum(
                        jnp.where(okb, tb, _BIG),
                        jnp.minimum(
                            jnp.where(oka, ta, _BIG),
                            jnp.where(okb2, tbb, _BIG),
                        ),
                    )  # [C, P] distance along dn, relative to t0
                    if use_aa:
                        def covp(sd, ok):
                            return jnp.where(
                                ok, jnp.clip(0.5 + sd, 0.0, 1.0), 0.0
                            )

                        cov_cand = jnp.maximum(
                            covp(sdb, okb),
                            jnp.maximum(covp(sda, oka), covp(sdb2, okb2)),
                        )
                    else:
                        cov_cand = jnp.where(tall < _BIG, 1.0, 0.0)
                    tw = jnp.where(tall < _BIG, t0 + tall, _BIG)
                    bt = jnp.min(tw, axis=0, keepdims=True)  # [1, P] world t
                    hit = bt < _BIG
                    # View depth and NDC depth of the nearest hit.
                    vz = bt * invlen
                    zndc = zA - zB / jnp.maximum(vz, 1e-12)
                    row = depth_ref[k : k + 1, :]
                    # Strict < means the EARLIER block wins exact f32 depth
                    # ties across blocks, while min-id tie-breaking applies
                    # within a block — so the winning id at exactly-equal
                    # depths can depend on the `sub` partitioning. Exact
                    # ties between distinct segments only occur at
                    # coincident geometry (shared joint caps), where attr/
                    # normal are continuous across the pair: the IMAGE is
                    # sub-invariant, only the id buffer may differ there.
                    take = hit & (zndc < row)

                    @pl.when(jnp.any(take))
                    def _():
                        ids = jnp.broadcast_to(scal(9), tall.shape)
                        win = tw <= bt
                        bid = jnp.min(
                            jnp.where(win, ids, _BIG), axis=0, keepdims=True
                        )
                        win2 = win & (ids == bid)

                        def sel(val):
                            return jnp.sum(
                                jnp.where(win2, val, 0.0), axis=0, keepdims=True
                            )

                        def upd(ref, val):
                            ref[k : k + 1, :] = jnp.where(
                                take, val, ref[k : k + 1, :]
                            )

                        yall = baoa + tall * bard
                        uax = jnp.clip(yall / baba, 0.0, 1.0)
                        # Interpolated attribute: attr0 + dattr * u.
                        battr = sel(scal(7) + scal(8) * uax)
                        # Surface normal (pos - axis point), with pos relative
                        # to the capsule start: pos - a = t*dn + oa.
                        oap = (oax, oay, oaz)
                        for cix, (nref, tref) in enumerate(
                            ((nx_ref, tx_ref), (ny_ref, ty_ref), (nz_ref, tz_ref))
                        ):
                            ba_c = scal(3 + cix)
                            dn_c = jnp.broadcast_to(
                                dn[cix : cix + 1, :], tall.shape
                            )
                            upd(nref, sel(tall * dn_c + oap[cix] - ba_c * uax))
                            upd(tref, sel(jnp.broadcast_to(ba_c, tall.shape)))

                        upd(depth_ref, zndc)
                        upd(id_ref, bid)
                        upd(attr_ref, battr)
                        upd(cov_ref, sel(cov_cand))

                @pl.when(jnp.logical_not(exit_now))
                def _():
                    @pl.when(c + 1 < nch)
                    def _():
                        get_dma(slot_of(c + 1), c + 1).start()

                    for j in range(C // sub):
                        jlo = j * sub

                        def scal_j(r, jlo=jlo):
                            # Plain [sub, 1] sublane slice (pair-major
                            # payload) — no per-read transpose.
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
                        if use_early_z:
                            # Block-level hierarchical-Z against the CURRENT
                            # depth buffer (the chunk-level exit only sees
                            # the previous chunk's zfar carry).
                            sub_zmin = jnp.min(
                                jnp.where(
                                    in_run_s, zmin_t[jlo : jlo + sub], 3.0
                                )
                            )
                            zfar_cur = jnp.max(depth_ref[k : k + 1, :])
                            live = live & (sub_zmin <= zfar_cur)

                        @pl.when(live)
                        def _(scal_j=scal_j, in_run_s=in_run_s):
                            process(scal_j, in_run_s)

                zfar = jnp.max(depth_ref[k : k + 1, :])
                c_next = jnp.where(exit_now, nch, c + 1)
                return (c_next, zfar)

            jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(2.0)))


@partial(
    jax.jit,
    static_argnames=("width", "height", "tile_w", "tile_h", "interpret",
                     "use_early_z", "use_aa", "sub"),
)
def rasterize_capsules_pallas(
    csr: SortedBinning,
    params: jnp.ndarray,  # [20] (ray basis, zA, zB, ..., 19: px scale)
    width: int,
    height: int,
    tile_w: int = 16,
    tile_h: int = 8,
    interpret: bool = False,
    use_early_z: bool = True,
    use_aa: bool = True,
    sub: int = 32,  # compute sub-chunk width (DMA stays at `chunk`)
):
    """Capsule raster pass ->
    (z_ndc, seg_id, [attr, nx, ny, nz, tx, ty, tz, coverage]).

    `coverage` is the analytic pixel coverage of the winning fragment in
    [0, 1] (1 inside the silhouette, a linear ramp across the edge; the
    resolve blends it against the layer behind).  With use_aa=False the
    pre-AA hit test is used and coverage is binary."""
    n_tiles = csr.tile_start.shape[0]
    C = csr.chunk
    R = csr.payload.shape[0]
    P = tile_w * tile_h
    n_pad = -(-n_tiles // TILE_GROUP) * TILE_GROUP
    counts = jnp.pad(csr.tile_count, (0, n_pad - n_tiles))
    starts = jnp.pad(csr.tile_start, (0, n_pad - n_tiles))
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
        _capsule_kernel,
        tile_w=tile_w,
        tile_h=tile_h,
        tiles_x=csr.tiles_x,
        chunk=C,
        width=width,
        height=height,
        use_early_z=use_early_z,
        use_aa=use_aa,
        sub=sub,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pad // TILE_GROUP,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(
                (TILE_GROUP, P), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            )
        ]
        * 10,
        scratch_shapes=[
            # TILE_GROUP first-chunk prefetch slots + 2 double-buffer slots.
            # Pair-major [C, 128] blocks (see payload_hbm comment).
            pltpu.VMEM((TILE_GROUP + 2, C, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((TILE_GROUP + 2,)),
        ],
    )
    # Pair-major payload: one whole-array XLA transpose + pad per frame
    # buys zero in-kernel lane->sublane transposes (see
    # raster_capsule_oit.py for the measured effect).
    payload_t = jnp.pad(csr.payload.T, ((0, 0), (0, 128 - R)))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad, P), jnp.float32)] * 10,
        interpret=interpret,
    )(counts, starts, params, payload_t)
    outs = [o[:n_tiles] for o in outs]
    depth, fid = outs[0], outs[1]
    seg_id = jnp.where(fid < 0, -1, fid.astype(jnp.int32))
    return depth, seg_id, outs[2:]
