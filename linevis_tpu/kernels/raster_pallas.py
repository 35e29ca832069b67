"""Pallas TPU tile rasterizer with per-tile dynamic triangle counts.

The XLA-scan z-pass (`raster_xla.py`) must pad every tile to the worst-case
triangle count; real scenes are heavy-tailed (max/mean per-tile count is
4-10x on Tornado), so a static bound wastes most of the machine. This
kernel consumes a **CSR chunk layout**: the (tile, triangle) pairs produced
by binning are sorted by (tile, conservative triangle depth), each tile's
run padded up to a multiple of the chunk size C, and all runs concatenated
into one [total_chunks, R, C] payload buffer in HBM. Each grid step (a
group of 8 tiles — TPU sublane rule for output blocks) reads each tile's
chunk count + base offset from prefetched scalars and loops over exactly
its own chunks with double-buffered DMA — and, because chunks arrive
front-to-back, stops as soon as the next chunk's minimum depth is behind
every pixel already shaded (hierarchical-Z style occlusion culling, the
TPU answer to GPU early-z).

Coverage/depth/attribute evaluation for a chunk is a handful of
[3, C] x [3, P] dots (transposed matmul on the MXU): every per-fragment
quantity — edges, depth, triangle id, and the interpolated G-buffer
attributes — is an affine plane in screen space (see
`render/pipeline.py:build_payload`), so the whole rasterizer is "evaluate
planes, select the nearest". Shading then needs no per-pixel gathers.

The payload capacity mirrors the reference's fragment-buffer sizing policy
(expected average x size with clamp + overflow warning,
`src/Renderers/OIT/PerPixelLinkedListLineRenderer.cpp:257-313`).

Payload rows (R = 16 for depth-only, 40 with G-buffer planes):
  0-8:   edge functional coefficients (a,b,c) x 3 (orientation-normalized)
  9-11:  affine depth plane (a,b,c)
  12-14: "id plane" (0, 0, id) — ids exact below 2^24 in f32
  15:    conservative min NDC depth of the triangle (sort key within tile)
  16+3j: attribute plane j (inv_w, attr/w, normal/w xyz, tangent/w xyz)
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "CsrBinning",
    "build_csr_binning",
    "rasterize_depth_pallas",
    "rasterize_gbuffer_pallas",
]

TILE_GROUP = 8  # tiles per grid step; output blocks are [8, P] (sublane rule)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["payload", "tile_start", "tile_count"],
    meta_fields=["tiles_x", "tiles_y", "chunk"],
)
@dataclasses.dataclass
class SortedBinning:
    """Sort-carried tile binning (no slot gather, no capacity clamp).

    The (tile, primitive) pairs are sorted by a packed (tile, depth-bucket)
    key with ALL payload rows carried as extra sort operands — on TPU,
    `lax.sort` cost is nearly independent of operand count, while per-element
    gathers cost ~10ns each, so carrying the payload through the sort is ~16x
    cheaper than permuting it afterwards. Each tile's run is then addressed
    at PAIR granularity: the kernel DMAs chunks from unaligned offsets and
    masks the tail, so no chunk padding or capacity truncation exists at all.

    payload:    [R, Np + chunk] float32 — tile-sorted pair payload (invalid
                pairs sort to the end; an extra chunk of padding columns
                keeps the last tile's DMA in bounds)
    tile_start: [n_tiles] int32 — first pair of each tile's run
    tile_count: [n_tiles] int32 — pairs in each tile's run
    """

    payload: jnp.ndarray
    tile_start: jnp.ndarray
    tile_count: jnp.ndarray
    tiles_x: int
    tiles_y: int
    chunk: int


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile_w", "tile_h", "chunk", "span_x", "span_y",
    ),
)
def build_sorted_binning(
    xmin: jnp.ndarray,  # [T] screen-space bbox per primitive
    xmax: jnp.ndarray,
    ymin: jnp.ndarray,
    ymax: jnp.ndarray,
    payload_rows: jnp.ndarray,  # [R, T], row 15 = bucket-floored zmin
    valid: jnp.ndarray,  # [T]
    width: int,
    height: int,
    tile_w: int = 32,
    tile_h: int = 16,
    chunk: int = 128,
    span_x: int = 2,
    span_y: int = 2,
    seg2d: tuple = None,  # (sxa, sya, sxb, syb, sr): exact 2D capsule cull
) -> SortedBinning:
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    num_tiles = tiles_x * tiles_y
    T = xmin.shape[0]
    C = chunk

    on_screen = (xmax >= 0) & (ymax >= 0) & (xmin < width) & (ymin < height)
    covers_x = jnp.floor(xmax - 0.5) >= jnp.ceil(xmin - 0.5)
    covers_y = jnp.floor(ymax - 0.5) >= jnp.ceil(ymin - 0.5)
    valid = valid & on_screen & covers_x & covers_y

    tx0 = jnp.clip(jnp.floor(xmin / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(xmax / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(ymin / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(ymax / tile_h).astype(jnp.int32), 0, tiles_y - 1)

    dx = jnp.arange(span_x, dtype=jnp.int32)
    dy = jnp.arange(span_y, dtype=jnp.int32)
    cand_tx = tx0[None, None, :] + dx[None, :, None]
    cand_ty = ty0[None, None, :] + dy[:, None, None]
    in_range = (
        (cand_tx <= tx1[None, None, :])
        & (cand_ty <= ty1[None, None, :])
        & valid[None, None, :]
    )
    if seg2d is not None:
        # Exact 2D test: does the screen-space capsule (segment dilated by
        # sr) overlap this tile's rect?  The bbox window keeps all
        # span_x*span_y tiles of a diagonal segment's bounding box; a
        # Liang-Barsky clip against the sr-expanded rect drops the corner
        # tiles the tube never touches — which the kernel would otherwise
        # discover one analytic intersection at a time.
        sxa, sya, sxb, syb, sr = seg2d

        def expand(v):
            return v[None, None, :]

        rx0 = cand_tx.astype(jnp.float32) * tile_w - expand(sr)
        rx1 = (cand_tx + 1).astype(jnp.float32) * tile_w + expand(sr)
        ry0 = cand_ty.astype(jnp.float32) * tile_h - expand(sr)
        ry1 = (cand_ty + 1).astype(jnp.float32) * tile_h + expand(sr)
        ax = expand(sxa)
        ay = expand(sya)
        dxs = expand(sxb - sxa)
        dys = expand(syb - sya)

        def axis_range(a0, r0, r1, d):
            small = jnp.abs(d) < 1e-6
            inv = 1.0 / jnp.where(small, 1.0, d)
            t0 = (r0 - a0) * inv
            t1 = (r1 - a0) * inv
            lo = jnp.minimum(t0, t1)
            hi = jnp.maximum(t0, t1)
            inside = (a0 >= r0) & (a0 <= r1)
            lo = jnp.where(small, jnp.where(inside, -1e9, 1e9), lo)
            hi = jnp.where(small, jnp.where(inside, 1e9, -1e9), hi)
            return lo, hi

        lox, hix = axis_range(ax, rx0, rx1, dxs)
        loy, hiy = axis_range(ay, ry0, ry1, dys)
        t_lo = jnp.maximum(jnp.maximum(lox, loy), 0.0)
        t_hi = jnp.minimum(jnp.minimum(hix, hiy), 1.0)
        in_range = in_range & (t_hi >= t_lo)
    tile_id = jnp.where(in_range, cand_ty * tiles_x + cand_tx, num_tiles)

    zq = jnp.clip(payload_rows[15] * 1023.0, 0.0, 1023.0).astype(jnp.int32)
    zq = jnp.broadcast_to(zq[None, None, :], tile_id.shape)
    key = (tile_id * 1024 + zq).reshape(-1)

    R = payload_rows.shape[0]
    span = span_x * span_y
    Np = span * T
    rows = jnp.broadcast_to(
        payload_rows[:, None, :], (R, span, T)
    ).reshape(R, Np)
    ops = (key,) + tuple(rows[i] for i in range(R))
    # Unstable sort: XLA's network is deterministic per XLA version either
    # way. Bucket keys are QUANTIZED depth (1/1024 buckets), so fragments
    # with different true depths can share a key; exact ties (coincident
    # caps) are handled order-independently by the kernels' depth-tie
    # windows, but the MLAB overflow merge of beyond-K fragments IS
    # order-dependent within a bucket — images can shift by at most the
    # merged fragments' contribution within one z-bucket, and golden
    # regeneration churn across XLA releases is expected at that bound.
    sorted_ops = jax.lax.sort(ops, dimension=-1, is_stable=False, num_keys=1)
    sorted_keys = sorted_ops[0]
    payload = jnp.stack(sorted_ops[1:], axis=0)  # [R, Np]
    payload = jnp.pad(payload, ((0, 0), (0, C)))

    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(
        sorted_keys, tile_range * 1024, side="left"
    ).astype(jnp.int32)
    ends = jnp.searchsorted(
        sorted_keys, (tile_range + 1) * 1024, side="left"
    ).astype(jnp.int32)

    return SortedBinning(
        payload=payload,
        tile_start=starts,
        tile_count=ends - starts,
        tiles_x=tiles_x,
        tiles_y=tiles_y,
        chunk=C,
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["payload", "tile_chunk_base", "tile_num_chunks", "overflow"],
    meta_fields=["tiles_x", "tiles_y", "chunk"],
)
@dataclasses.dataclass
class CsrBinning:
    """Chunk-padded CSR triangle lists for the Pallas rasterizer.

    payload:         [R, total_chunks, chunk] float32 (see module docstring)
    tile_chunk_base: [n_tiles] int32 — first chunk index of each tile
    tile_num_chunks: [n_tiles] int32 — chunks owned by each tile
    overflow:        [] int32 — (tile, tri) pairs dropped due to capacity
    """

    payload: jnp.ndarray
    tile_chunk_base: jnp.ndarray
    tile_num_chunks: jnp.ndarray
    overflow: jnp.ndarray
    tiles_x: int
    tiles_y: int
    chunk: int


def build_csr_binning(
    tri_x: jnp.ndarray,  # [3, T]
    tri_y: jnp.ndarray,  # [3, T]
    payload_rows: jnp.ndarray,  # [R, T] per-triangle payload (row 15 = zmin)
    valid: jnp.ndarray,  # [T]
    width: int,
    height: int,
    tile_w: int = 16,
    tile_h: int = 8,
    chunk: int = 128,
    span_x: int = 2,
    span_y: int = 2,
    pairs_capacity: int = 0,
    depth_sort: bool = True,
) -> CsrBinning:
    """Triangle front end for `build_csr_binning_bbox` (bbox from corners)."""
    xmin = jnp.min(tri_x, axis=0)
    xmax = jnp.max(tri_x, axis=0)
    ymin = jnp.min(tri_y, axis=0)
    ymax = jnp.max(tri_y, axis=0)
    return build_csr_binning_bbox(
        xmin, xmax, ymin, ymax, payload_rows, valid, width, height,
        tile_w, tile_h, chunk, span_x, span_y, pairs_capacity, depth_sort,
        reject_rows=((2, -1.0), (5, -1.0), (8, -1.0), (15, 3.0)),
    )


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile_w", "tile_h", "chunk", "span_x", "span_y",
        "pairs_capacity", "depth_sort", "reject_rows", "slot_major",
    ),
)
def build_csr_binning_bbox(
    xmin: jnp.ndarray,  # [T] screen-space bbox
    xmax: jnp.ndarray,
    ymin: jnp.ndarray,
    ymax: jnp.ndarray,
    payload_rows: jnp.ndarray,  # [R, T] per-primitive payload (row 15 = zmin)
    valid: jnp.ndarray,  # [T]
    width: int,
    height: int,
    tile_w: int = 16,
    tile_h: int = 8,
    chunk: int = 128,
    span_x: int = 2,
    span_y: int = 2,
    pairs_capacity: int = 0,
    depth_sort: bool = True,  # front-to-back within tiles (occlusion culling)
    reject_rows: tuple = ((2, -1.0), (5, -1.0), (8, -1.0), (15, 3.0)),
    slot_major: bool = False,  # payload [cap_slots, R] instead of [R, chunks, C]
) -> CsrBinning:
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    num_tiles = tiles_x * tiles_y
    T = xmin.shape[0]
    if pairs_capacity <= 0:
        # Default capacity policy: ~2 tiles per primitive on average, like the
        # reference's expected-depth-complexity fragment buffer sizing
        # (PerPixelLinkedListLineRenderer.hpp:44-48). Overflow is counted.
        pairs_capacity = min(span_x * span_y * T, 2 * T + 65536)
    cap_chunks = -(-pairs_capacity // chunk) + num_tiles  # worst-case padding
    C = chunk

    on_screen = (xmax >= 0) & (ymax >= 0) & (xmin < width) & (ymin < height)
    # Sub-pixel cull: a primitive whose bbox straddles no pixel center can
    # never produce coverage (pixel centers at integer+0.5).
    covers_x = jnp.floor(xmax - 0.5) >= jnp.ceil(xmin - 0.5)
    covers_y = jnp.floor(ymax - 0.5) >= jnp.ceil(ymin - 0.5)
    valid = valid & on_screen & covers_x & covers_y

    tx0 = jnp.clip(jnp.floor(xmin / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(xmax / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(ymin / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(ymax / tile_h).astype(jnp.int32), 0, tiles_y - 1)

    dx = jnp.arange(span_x, dtype=jnp.int32)
    dy = jnp.arange(span_y, dtype=jnp.int32)
    cand_tx = tx0[None, None, :] + dx[None, :, None]
    cand_ty = ty0[None, None, :] + dy[:, None, None]
    in_range = (
        (cand_tx <= tx1[None, None, :])
        & (cand_ty <= ty1[None, None, :])
        & valid[None, None, :]
    )
    tile_id = jnp.where(in_range, cand_ty * tiles_x + cand_tx, num_tiles)

    tri_ids = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[None, None, :], tile_id.shape
    ).reshape(-1)
    # Single packed sort key: tile * 1024 + quantized depth bucket. The
    # payload's row 15 holds the bucket LOWER edge (build_payload quantizes
    # it the same way), so chunk order and the early-exit key agree exactly.
    if depth_sort:
        zq = jnp.broadcast_to(
            payload_rows[15][None, None, :], tile_id.shape
        ).reshape(-1)
        zq = jnp.clip((zq * 1023.0), 0.0, 1023.0).astype(jnp.int32)
    else:
        zq = jnp.zeros(tile_id.size, jnp.int32)
    key = tile_id.reshape(-1) * 1024 + zq
    sorted_keys, sorted_tris = jax.lax.sort(
        (key, tri_ids), dimension=-1, is_stable=True, num_keys=1
    )

    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_keys, tile_range * 1024, side="left").astype(
        jnp.int32
    )
    ends = jnp.searchsorted(
        sorted_keys, (tile_range + 1) * 1024, side="left"
    ).astype(jnp.int32)
    raw_counts = ends - starts

    # Chunk-pad each tile's run; truncate tiles that exceed the capacity
    # (deterministic, with an overflow count surfaced to the host).
    nchunks_raw = -(-raw_counts // C)
    base_raw = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nchunks_raw).astype(jnp.int32)]
    )
    fit = base_raw[1:] <= cap_chunks
    nchunks = jnp.where(fit, nchunks_raw, jnp.maximum(cap_chunks - base_raw[:-1], 0))
    counts = jnp.minimum(raw_counts, nchunks * C)
    overflow = jnp.sum(raw_counts - counts)
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nchunks).astype(jnp.int32)]
    )[:-1]

    # Gather-form CSR fill: slot s belongs to tile t(s); its rank within the
    # tile maps back into the sorted pair array. tile-of-chunk is a step
    # function of the chunk index: scatter tile starts + cumsum (XLA lowers
    # searchsorted over millions of queries to a slow while loop; this is a
    # 2-pass O(cap) computation instead).
    slot = jnp.arange(cap_chunks * C, dtype=jnp.int32)
    slot_chunk = slot // C
    chunk_marks = jnp.zeros((cap_chunks + 1,), jnp.int32).at[base].add(
        1, mode="drop"
    )
    tile_of_chunk = jnp.cumsum(chunk_marks[: cap_chunks]) - 1
    tile_of_slot = jnp.clip(tile_of_chunk[slot_chunk], 0, num_tiles - 1)
    rank = slot - base[tile_of_slot] * C
    slot_valid = (rank >= 0) & (rank < counts[tile_of_slot]) & (
        slot_chunk < base[tile_of_slot] + nchunks[tile_of_slot]
    )
    j = jnp.where(slot_valid, starts[tile_of_slot] + rank, 0)
    tri = jnp.where(slot_valid, sorted_tris[j], 0)
    # Materialize the index chain once: without a barrier XLA fuses the whole
    # slot->tri computation (including its gathers) into the payload gather
    # consumer and recomputes it per payload row.
    tri, slot_valid = jax.lax.optimization_barrier((tri, slot_valid))

    R = payload_rows.shape[0]
    assert R % 8 == 0, "payload rows must be a multiple of 8 (f32 sublanes)"
    # Invalid slots get primitive-specific rejecting values (e.g. edge c
    # coefficients = -1 for triangles) and a far zmin (padded slots sit at
    # the END of a front-to-back run, so a large finite value keeps the
    # early-exit key monotone).
    reject = jnp.zeros((R,), jnp.float32)
    for row, val in reject_rows:
        if row < R:
            reject = reject.at[row].set(val)
    if slot_major:
        # [cap_slots, R]: one contiguous record per slot (row-gather form —
        # measurably faster than the axis-1 gather on TPU).
        recs = payload_rows.T[tri]  # [cap_slots, R]
        payload = jnp.where(slot_valid[:, None], recs, reject[None, :])
    else:
        rows = payload_rows[:, tri]  # [R, cap_chunks*C]
        rows = jnp.where(slot_valid[None, :], rows, reject[:, None])
        # Row-major [R, cap_chunks, C] — the kernel DMAs strided row slices,
        # so no 400MB transpose is needed here.
        payload = rows.reshape(R, cap_chunks, C)

    return CsrBinning(
        payload=payload,
        tile_chunk_base=base,
        tile_num_chunks=nchunks,
        overflow=overflow,
        tiles_x=tiles_x,
        tiles_y=tiles_y,
        chunk=C,
    )


def _raster_kernel(
    # scalar prefetch
    num_chunks_ref,  # [n_tiles_pad] SMEM
    chunk_base_ref,  # [n_tiles_pad] SMEM
    # inputs
    payload_hbm,  # [R, total_chunks, C] in HBM/ANY
    # outputs: depth, idf, then num_attr_planes buffers, each [TILE_GROUP, P]
    *refs,
    tile_w: int,
    tile_h: int,
    tiles_x: int,
    chunk: int,
    payload_rows: int,
    num_attr_planes: int,
    use_early_z: bool,
):
    n_out = 2 + num_attr_planes
    out_refs = refs[:n_out]
    coef_scr, sem = refs[n_out], refs[n_out + 1]
    depth_ref, id_ref = out_refs[0], out_refs[1]
    attr_refs = out_refs[2:]

    gi = pl.program_id(0)
    C = chunk
    P = tile_w * tile_h

    lin = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    ly = (lin // tile_w).astype(jnp.float32)
    lx = (lin % tile_w).astype(jnp.float32)
    ones = jnp.ones((1, P), jnp.float32)

    depth_ref[:] = jnp.full(depth_ref.shape, 2.0, jnp.float32)
    id_ref[:] = jnp.full(id_ref.shape, -1.0, jnp.float32)
    for r in attr_refs:
        r[:] = jnp.zeros(r.shape, jnp.float32)

    for k in range(TILE_GROUP):  # static unroll over the tile group
        t = gi * TILE_GROUP + k
        nch = num_chunks_ref[t]
        base = chunk_base_ref[t]
        ty = (t // tiles_x).astype(jnp.float32)
        tx = (t % tiles_x).astype(jnp.float32)
        gx = tx * tile_w + lx + 0.5  # [1, P]
        gy = ty * tile_h + ly + 0.5
        A = jnp.concatenate([gx, gy, ones], axis=0)  # [3, P]

        def get_dma(slot, c, base=base):
            return pltpu.make_async_copy(
                payload_hbm.at[:, base + c, :], coef_scr.at[slot], sem.at[slot]
            )

        @pl.when(nch > 0)
        def _(nch=nch, A=A, k=k, get_dma=get_dma):
            get_dma(0, 0).start()

            def cond(state):
                c, _zfar = state
                return c < nch

            def body(state):
                c, zfar_prev = state
                slot = jax.lax.rem(c, 2)

                get_dma(slot, c).wait()
                coef = coef_scr[slot]  # [R, C]
                chunk_zmin = coef[15, 0]
                exit_now = (
                    (chunk_zmin > zfar_prev) if use_early_z else jnp.bool_(False)
                )

                @pl.when(jnp.logical_not(exit_now))
                def _():
                    @pl.when(c + 1 < nch)
                    def _():
                        get_dma(1 - slot, c + 1).start()

                    def functional(r):
                        # [3, C] x [3, P] -> [C, P] (contraction over dim 0).
                        return jax.lax.dot_general(
                            coef[r : r + 3, :],
                            A,
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )

                    e0 = functional(0)
                    e1 = functional(3)
                    e2 = functional(6)
                    z = functional(9)
                    inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                    inside &= (z >= 0.0) & (z <= 1.0)
                    zm = jnp.where(inside, z, jnp.inf)  # [C, P]
                    bz = jnp.min(zm, axis=0, keepdims=True)  # [1, P]
                    row = depth_ref[k : k + 1, :]
                    take = bz < row

                    @pl.when(jnp.any(take))
                    def _():
                        ids = functional(12)
                        bid = jnp.min(
                            jnp.where(zm <= bz, ids, jnp.inf),
                            axis=0,
                            keepdims=True,
                        )
                        depth_ref[k : k + 1, :] = jnp.where(take, bz, row)
                        id_ref[k : k + 1, :] = jnp.where(
                            take, bid, id_ref[k : k + 1, :]
                        )
                        if num_attr_planes:
                            # Winner mask: exactly the (tri, pixel) pairs that
                            # won the depth test in this chunk.
                            win = (zm <= bz) & (ids == bid)
                            for jdx in range(num_attr_planes):
                                val = functional(16 + 3 * jdx)
                                v = jnp.sum(
                                    jnp.where(win, val, 0.0),
                                    axis=0,
                                    keepdims=True,
                                )
                                prev = attr_refs[jdx][k : k + 1, :]
                                attr_refs[jdx][k : k + 1, :] = jnp.where(
                                    take, v, prev
                                )

                zfar = jnp.max(depth_ref[k : k + 1, :])
                c_next = jnp.where(exit_now, nch, c + 1)
                return (c_next, zfar)

            jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(2.0)))


@partial(
    jax.jit,
    static_argnames=("tile_w", "tile_h", "num_attr_planes", "interpret", "use_early_z"),
)
def _rasterize_pallas(
    csr: CsrBinning,
    tile_w: int,
    tile_h: int,
    num_attr_planes: int,
    interpret: bool,
    use_early_z: bool,
):
    n_tiles = csr.tile_chunk_base.shape[0]
    C = csr.chunk
    R = csr.payload.shape[0]
    P = tile_w * tile_h
    n_pad = -(-n_tiles // TILE_GROUP) * TILE_GROUP
    nch = jnp.pad(csr.tile_num_chunks, (0, n_pad - n_tiles))
    base = jnp.pad(csr.tile_chunk_base, (0, n_pad - n_tiles))
    n_out = 2 + num_attr_planes

    kernel = functools.partial(
        _raster_kernel,
        tile_w=tile_w,
        tile_h=tile_h,
        tiles_x=csr.tiles_x,
        chunk=C,
        payload_rows=R,
        num_attr_planes=num_attr_planes,
        use_early_z=use_early_z,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // TILE_GROUP,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(
                (TILE_GROUP, P), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            )
        ]
        * n_out,
        scratch_shapes=[
            pltpu.VMEM((2, R, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad, P), jnp.float32)] * n_out,
        interpret=interpret,
    )(nch, base, csr.payload)
    outs = [o[:n_tiles] for o in outs]
    depth, fid = outs[0], outs[1]
    tri_id = jnp.where(fid < 0, -1, fid.astype(jnp.int32))
    return depth, tri_id, outs[2:]


def rasterize_depth_pallas(
    csr: CsrBinning,
    tile_w: int = 16,
    tile_h: int = 8,
    interpret: bool = False,
    use_early_z: bool = True,
):
    """Z-buffer pass. Returns (depth [n_tiles, P], tri_id [n_tiles, P]).

    Depth is NDC z in [0, 1]; background pixels have depth 2.0 and id -1.
    Depth ties resolve to the lowest triangle id (deterministic).
    """
    depth, tri_id, _ = _rasterize_pallas(
        csr, tile_w, tile_h, 0, interpret, use_early_z
    )
    return depth, tri_id


def rasterize_gbuffer_pallas(
    csr: CsrBinning,
    num_attr_planes: int,
    tile_w: int = 16,
    tile_h: int = 8,
    interpret: bool = False,
    use_early_z: bool = True,
):
    """Full G-buffer pass. Returns (depth, tri_id, [attr planes...])."""
    return _rasterize_pallas(
        csr, tile_w, tile_h, num_attr_planes, interpret, use_early_z
    )
