"""Analytic N-gon prism rasterizer — the reference's triangle-tube
geometry at capsule-kernel speed.

The reference's default raster geometry is the `tubeNumSubdivisions`-gon
triangle tube (`src/Renderers/Tubes/Tubes.hpp:40`,
`src/LineData/LineData.hpp:374-386`): per line segment, S ring vertices at
each end (parallel-transport frames), S quads split into 2S triangles.
Rasterizing those triangles directly on TPU means binning/sorting 16x more
primitives than segments (2S * n_seg pairs through an XLA sort) — measured
880 ms/frame at 1080p Tornado. This kernel instead intersects each ray
with the CONVEX PRISM bounded by the S side-quad planes and the two ring
planes, per binned *segment* candidate — the same screen-space binning,
payload discipline, DMA pipeline and [sub, P] vector shapes as the capsule
kernel (`kernels/raster_capsule.py`), with the capsule quadratic replaced
by an S+2-plane slab clip.

Geometry fidelity: ring vertices, frames and the faceted silhouette are
IDENTICAL to the triangle mesh (`geometry/tubes.py`). The one deviation is
that each side quad is planarized (the triangle mesh splits the bilinear
quad along a diagonal): for a straight run the quads are exactly planar
(zero difference); under curvature the deviation is bounded by a quarter
of the quad's diagonal twist — sub-pixel for parallel-transport frames at
typical step sizes. `tests/test_prism_raster.py` pins both statements
(float64 triangle oracle on straight tubes; SSIM vs the exact triangle
G-buffer on curved ones).

Shading normals: the reference interpolates per-vertex RADIAL normals
across each triangle and normalizes (smooth shading over the faceted
surface). The radial direction from the tube axis at the hit point is
that same smooth normal (to ring-interpolation error, O((pi/S)^2)), so
the G-buffer emits `hit - axis(u)` exactly like the capsule kernel and
the shared shading path applies unchanged.

Payload rows 0-15 are the capsule layout (`render/tube_raster.py`), so
the binning is byte-identical; rows 24-35 append the parallel-transport
frames (na, bna, nb, bnb), gathered by sorted segment id AFTER the sort
(sort width stays 16).
"""

from __future__ import annotations

import functools
import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from linevis_tpu.kernels.raster_pallas import TILE_GROUP, SortedBinning

__all__ = ["rasterize_prisms_pallas", "ROW_FRAME0"]

_BIG = 1e30
ROW_FRAME0 = 24  # first frame row (na.x); 12 rows: na, bna, nb, bnb


def _prism_kernel(
    count_ref,  # [n_tiles_pad] SMEM — pairs per tile
    start_ref,  # [n_tiles_pad] SMEM — first pair of each tile's run
    params_ref,  # [16+] SMEM (capsule kernel params layout)
    payload_hbm,  # [Np + C, 128] pair-major tile-sorted payload
    depth_ref,  # [TILE_GROUP, P] z_ndc
    id_ref,  # [TILE_GROUP, P] float ids
    attr_ref,  # [TILE_GROUP, P]
    nx_ref,  # [TILE_GROUP, P] radial surface normal (unnormalized)
    ny_ref,
    nz_ref,
    tx_ref,  # [TILE_GROUP, P] tangent (unnormalized ba)
    ty_ref,
    tz_ref,
    cov_ref,  # [TILE_GROUP, P] coverage (binary; prism has no analytic AA)
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
    sub: int,
    n_sides: int,
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

    # Static ring angles (tube_ring_directions; Tubes.hpp:159 global
    # circle). Side s spans ring directions s -> s+1.
    coss = [math.cos(2.0 * math.pi * s / n_sides) for s in range(n_sides)]
    sins = [math.sin(2.0 * math.pi * s / n_sides) for s in range(n_sides)]

    # Group prologue: prefetch each tile's first chunk (capsule kernel
    # pattern — see raster_capsule.py for the rationale).
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
                coef = coef_scr[slot]  # [C, 128] pair-major
                lane = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
                glob = (b0 + c) * C + lane
                in_run = (glob >= base) & (glob < base + count)
                zmin_t = coef[:, 15:16]  # [C, 1]
                chunk_zmin = jnp.min(jnp.where(in_run, zmin_t, 3.0))
                exit_now = (
                    (chunk_zmin > zfar_prev) if use_early_z
                    else jnp.bool_(False)
                )

                def process(scal, in_run):
                    # Per-candidate [sub, 1] scalars: frames and segment.
                    oa = (scal(0), scal(1), scal(2))
                    ba = (scal(3), scal(4), scal(5))
                    r_w = scal(6)
                    baba = scal(10)
                    na = (scal(ROW_FRAME0), scal(ROW_FRAME0 + 1),
                          scal(ROW_FRAME0 + 2))
                    bna = (scal(ROW_FRAME0 + 3), scal(ROW_FRAME0 + 4),
                           scal(ROW_FRAME0 + 5))
                    nb = (scal(ROW_FRAME0 + 6), scal(ROW_FRAME0 + 7),
                          scal(ROW_FRAME0 + 8))
                    bnb = (scal(ROW_FRAME0 + 9), scal(ROW_FRAME0 + 10),
                           scal(ROW_FRAME0 + 11))

                    def cross(u, v):
                        return (
                            u[1] * v[2] - u[2] * v[1],
                            u[2] * v[0] - u[0] * v[2],
                            u[0] * v[1] - u[1] * v[0],
                        )

                    def dot3(u, v):
                        return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]

                    def scale(u, s):
                        return (u[0] * s, u[1] * s, u[2] * s)

                    def add(u, v):
                        return (u[0] + v[0], u[1] + v[1], u[2] + v[2])

                    def sub3(u, v):
                        return (u[0] - v[0], u[1] - v[1], u[2] - v[2])

                    # Ring corner offsets relative to a ([sub, 1] each).
                    va = []
                    vb = []
                    for s in range(n_sides):
                        da = add(scale(na, coss[s]), scale(bna, sins[s]))
                        db = add(scale(nb, coss[s]), scale(bnb, sins[s]))
                        va.append(scale(da, r_w))
                        vb.append(add(ba, scale(db, r_w)))
                    half_ba = scale(ba, 0.5)

                    # Plane accumulation over rays: f(t) = num + t * den,
                    # inside f <= 0. Entering planes (den < 0) raise t_in;
                    # exiting planes (den > 0) lower t_out; parallel planes
                    # with num > 0 reject the ray outright.
                    t_in = jnp.full((sub, P), -_BIG, jnp.float32)
                    t_out = jnp.full((sub, P), _BIG, jnp.float32)
                    cap_in = jnp.full((sub, P), -_BIG, jnp.float32)
                    rej = jnp.zeros((sub, P), jnp.bool_)

                    def clip(nq, cpl, is_cap, t_in, t_out, cap_in, rej):
                        # nq [sub,1] x3, cpl [sub,1]: plane n.(x-a) = c.
                        num = dot3(nq, oa) - cpl  # [sub, 1]
                        den = (
                            nq[0] * dn[0:1, :]
                            + nq[1] * dn[1:2, :]
                            + nq[2] * dn[2:3, :]
                        )  # [sub, P]
                        para = jnp.abs(den) < 1e-12
                        den_s = jnp.where(
                            para, jnp.where(den >= 0, 1e-12, -1e-12), den
                        )
                        tp = -num * pl.reciprocal(den_s, approx=False)
                        entering = (den < 0.0) & jnp.logical_not(para)
                        exiting = (den > 0.0) & jnp.logical_not(para)
                        t_in = jnp.maximum(
                            t_in, jnp.where(entering, tp, -_BIG)
                        )
                        t_out = jnp.minimum(
                            t_out, jnp.where(exiting, tp, _BIG)
                        )
                        if is_cap:
                            cap_in = jnp.maximum(
                                cap_in, jnp.where(entering, tp, -_BIG)
                            )
                        rej = rej | (para & (num > 0.0))
                        return t_in, t_out, cap_in, rej

                    for s in range(n_sides):
                        s1 = (s + 1) % n_sides
                        # Planarized side quad: normal from the two edge
                        # mid-directions, oriented outward from the axis
                        # midpoint, offset through the centroid.
                        d1 = sub3(add(vb[s], vb[s1]), add(va[s], va[s1]))
                        d2 = sub3(add(va[s1], vb[s1]), add(va[s], vb[s]))
                        nq = cross(d1, d2)
                        inv_n = jax.lax.rsqrt(
                            jnp.maximum(dot3(nq, nq), 1e-30)
                        )
                        nq = scale(nq, inv_n)
                        mid = scale(
                            add(add(va[s], va[s1]), add(vb[s], vb[s1])),
                            0.25,
                        )
                        sgn = jnp.where(
                            dot3(nq, sub3(mid, half_ba)) >= 0.0, 1.0, -1.0
                        )
                        nq = scale(nq, sgn)
                        cpl = dot3(nq, mid)
                        t_in, t_out, cap_in, rej = clip(
                            nq, cpl, False, t_in, t_out, cap_in, rej
                        )

                    # Ring (cap) planes: the ring at each end lies in the
                    # plane orthogonal to the PT tangent there (t = n x b
                    # for the right-handed frame). They BOUND the prism but
                    # carry no surface (the triangle tube is open-ended):
                    # entering through a cap is a miss.
                    ta = cross(na, bna)
                    tb = cross(nb, bnb)
                    # at a: inside is ta.(x-a) >= 0 -> plane (-ta, 0).
                    t_in, t_out, cap_in, rej = clip(
                        scale(ta, -1.0), jnp.zeros_like(r_w), True,
                        t_in, t_out, cap_in, rej,
                    )
                    # at b: inside is tb.(x-a) <= tb.ba.
                    t_in, t_out, cap_in, rej = clip(
                        tb, dot3(tb, ba), True, t_in, t_out, cap_in, rej,
                    )

                    hit = (
                        (t_in <= t_out)
                        & (t_in > 0.0)
                        & (t_in > cap_in)  # last-entered plane is a side
                        & jnp.logical_not(rej)
                        & in_run
                    )
                    tw = jnp.where(hit, t_in, _BIG)  # [sub, P] world t
                    bt = jnp.min(tw, axis=0, keepdims=True)  # [1, P]
                    any_hit = bt < _BIG
                    vz = bt * invlen
                    zndc = zA - zB / jnp.maximum(vz, 1e-12)
                    row = depth_ref[k : k + 1, :]
                    take = any_hit & (zndc < row)

                    @pl.when(jnp.any(take))
                    def _():
                        ids = jnp.broadcast_to(scal(9), tw.shape)
                        win = tw <= bt
                        bid = jnp.min(
                            jnp.where(win, ids, _BIG), axis=0, keepdims=True
                        )
                        win2 = win & (ids == bid)

                        def sel(val):
                            return jnp.sum(
                                jnp.where(win2, val, 0.0), axis=0,
                                keepdims=True,
                            )

                        def upd(ref, val):
                            ref[k : k + 1, :] = jnp.where(
                                take, val, ref[k : k + 1, :]
                            )

                        # Axis parameter u at the hit: y = ba.(hit - a)
                        # = ba.oa + t * ba.dn.
                        bard = (
                            ba[0] * dn[0:1, :]
                            + ba[1] * dn[1:2, :]
                            + ba[2] * dn[2:3, :]
                        )
                        baoa = dot3(ba, oa)  # [sub, 1]
                        y = baoa + tw * bard
                        inv_baba = pl.reciprocal(
                            jnp.maximum(baba, 1e-20), approx=False
                        )
                        uax = jnp.clip(y * inv_baba, 0.0, 1.0)
                        battr = sel(scal(7) + scal(8) * uax)
                        # Radial normal: hit - axis(u) = oa + t*dn - ba*u.
                        for cix, (nref, tref) in enumerate(
                            ((nx_ref, tx_ref), (ny_ref, ty_ref),
                             (nz_ref, tz_ref))
                        ):
                            dn_c = jnp.broadcast_to(
                                dn[cix : cix + 1, :], tw.shape
                            )
                            upd(
                                nref,
                                sel(oa[cix] + tw * dn_c - ba[cix] * uax),
                            )
                            upd(tref, sel(jnp.broadcast_to(ba[cix], tw.shape)))

                        upd(depth_ref, zndc)
                        upd(id_ref, bid)
                        upd(attr_ref, battr)
                        upd(cov_ref, jnp.where(any_hit, 1.0, cov_ref[k:k+1, :]))

                @pl.when(jnp.logical_not(exit_now))
                def _():
                    @pl.when(c + 1 < nch)
                    def _():
                        get_dma(slot_of(c + 1), c + 1).start()

                    for j in range(C // sub):
                        jlo = j * sub

                        def scal_j(r, jlo=jlo):
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
                     "use_early_z", "sub", "n_sides"),
)
def rasterize_prisms_pallas(
    csr: SortedBinning,
    params: jnp.ndarray,  # capsule params layout (tube_raster.py)
    width: int,
    height: int,
    tile_w: int = 16,
    tile_h: int = 8,
    interpret: bool = False,
    use_early_z: bool = True,
    sub: int = 32,
    n_sides: int = 8,
):
    """N-gon prism raster pass ->
    (z_ndc, seg_id, [attr, nx, ny, nz, tx, ty, tz, coverage]).

    Same output contract as `rasterize_capsules_pallas`; payload must
    carry the 12 frame rows at ROW_FRAME0 (see
    `render/tube_raster.py:prepare_prism_frame`)."""
    n_tiles = csr.tile_start.shape[0]
    C = csr.chunk
    R = csr.payload.shape[0]
    P = tile_w * tile_h
    n_pad = -(-n_tiles // TILE_GROUP) * TILE_GROUP
    counts = jnp.pad(csr.tile_count, (0, n_pad - n_tiles))
    starts = jnp.pad(csr.tile_start, (0, n_pad - n_tiles))
    if R < ROW_FRAME0 + 12:
        raise ValueError(
            f"prism payload needs frame rows {ROW_FRAME0}..{ROW_FRAME0+11};"
            f" got R={R}"
        )
    if sub >= C:
        sub = C
    elif sub <= 0 or C % sub or sub % 8:
        raise ValueError(
            f"sub={sub} must be a multiple-of-8 divisor of chunk={C}"
        )

    kernel = functools.partial(
        _prism_kernel,
        tile_w=tile_w,
        tile_h=tile_h,
        tiles_x=csr.tiles_x,
        chunk=C,
        width=width,
        height=height,
        use_early_z=use_early_z,
        sub=sub,
        n_sides=n_sides,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pad // TILE_GROUP,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(
                (TILE_GROUP, P), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        * 10,
        scratch_shapes=[
            pltpu.VMEM((TILE_GROUP + 2, C, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((TILE_GROUP + 2,)),
        ],
    )
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
