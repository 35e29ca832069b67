"""Ray-traced ambient occlusion over a uniform segment grid.

Reference: screen-space RTAO (`src/Renderers/AmbientOcclusion/
VulkanRayTracedAmbientOcclusion.cpp`, shader `AO/RTAO/
VulkanRayTracedAmbientOcclusion.glsl:28-115`): cosine-hemisphere occlusion
rays from the visible surface, accumulated over frames. The reference
traces a hardware BVH; the TPU-native accelerator is a uniform grid
(the structure the reference itself uses for its voxel ray caster,
`src/Renderers/VRC/*`) with **sort-carried CSR runs** per cell — the same
machinery as the screen-space tile binning, in 3-D.

Tracing avoids per-ray traversal divergence entirely: each AO ray is
radius-limited, so the cells it can cross are enumerated UP FRONT
(a static MAX_RAY_CELLS window), expanded into (cell, ray) pairs, and
sorted by cell. A Pallas kernel then walks pair chunks; because both pairs
and the scene grid are sorted by cell id, each pair chunk's candidate
segments form ONE contiguous slot range — a dense [segments x rays]
intersection block with no gathers. Testing a neighboring cell's segments
is conservatively harmless (any in-range hit is a true occlusion), so
chunk-level range merging costs only compute, never correctness.

Segment record rows (camera-independent; built once per scene):
  0-2: a, 3-5: ba, 6: r, 7: baba, 8-15: zero padding.
Ray record rows: 0-2: origin, 3-5: direction (unit), 6: t_max, 7: pad.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["SegmentGrid", "build_segment_grid", "trace_ao_occlusion"]

_BIG = 1e30
TILE_GROUP = 8


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["records", "cell_start", "cell_count", "origin", "inv_cell"],
    meta_fields=["resolution", "chunk"],
)
@dataclasses.dataclass
class SegmentGrid:
    """Uniform grid CSR over capsule segments (camera-independent).

    records:    [8, Ns + chunk] float32 — cell-sorted segment records
    cell_start: [G^3] int32; cell_count: [G^3] int32
    origin:     [3] grid minimum corner; inv_cell: [3] 1 / cell size
    """

    records: jnp.ndarray
    cell_start: jnp.ndarray
    cell_count: jnp.ndarray
    origin: jnp.ndarray
    inv_cell: jnp.ndarray
    resolution: int
    chunk: int


def auto_grid_span(a, ba, radius, resolution: int) -> int:
    """Cells per axis a segment's AABB may span at `resolution` (host-side;
    use as the static `span` for `build_segment_grid`)."""
    a = np.asarray(a)
    b = a + np.asarray(ba)
    lo = np.minimum(a, b).min(axis=1) - radius
    hi = np.maximum(a, b).max(axis=1) + radius
    cell = np.maximum(hi - lo, 1e-6) / resolution
    ext = (np.abs(np.asarray(ba)) + 2.0 * radius).max(axis=1)
    return int(np.ceil((ext / cell).max())) + 1


@partial(jax.jit, static_argnames=("resolution", "chunk", "span"))
def build_segment_grid(
    a: jnp.ndarray,  # [3, S]
    ba: jnp.ndarray,  # [3, S]
    radius: float,
    mask: jnp.ndarray,  # [S]
    resolution: int = 64,
    chunk: int = 128,
    span: int = 2,
) -> SegmentGrid:
    S = a.shape[1]
    G = resolution
    b = a + ba
    big = jnp.float32(3e38)
    lo_all = jnp.min(jnp.where(mask[None], jnp.minimum(a, b), big), axis=1) - radius
    hi_all = jnp.max(jnp.where(mask[None], jnp.maximum(a, b), -big), axis=1) + radius
    extent = jnp.maximum(hi_all - lo_all, 1e-6)
    cell = extent / G
    inv_cell = 1.0 / cell

    lo = (jnp.minimum(a, b) - radius - lo_all[:, None]) * inv_cell[:, None]
    hi = (jnp.maximum(a, b) + radius - lo_all[:, None]) * inv_cell[:, None]
    c0 = jnp.clip(jnp.floor(lo).astype(jnp.int32), 0, G - 1)
    c1 = jnp.clip(jnp.floor(hi).astype(jnp.int32), 0, G - 1)
    # Static span^3 cell window per segment: covers floor(lo)..floor(hi)
    # when each segment's AABB spans < `span` cells per axis. Longer
    # segments get silently clamped coverage — size `span` with
    # `auto_grid_span` (or lower `resolution`) for sparse/long-segment
    # scenes.
    d = jnp.arange(span, dtype=jnp.int32)
    cx = c0[0][None, None, None, :] + d[None, None, :, None]
    cy = c0[1][None, None, None, :] + d[None, :, None, None]
    cz = c0[2][None, None, None, :] + d[:, None, None, None]
    ok = (
        (cx <= c1[0][None, None, None, :])
        & (cy <= c1[1][None, None, None, :])
        & (cz <= c1[2][None, None, None, :])
        & mask[None, None, None, :]
    )
    cell_id = jnp.where(ok, (cz * G + cy) * G + cx, G * G * G)

    rows = jnp.stack(
        [a[0], a[1], a[2], ba[0], ba[1], ba[2],
         jnp.full((S,), radius, jnp.float32), jnp.sum(ba * ba, axis=0)],
        axis=0,
    )
    n_pairs = span**3 * S
    key = cell_id.reshape(-1)
    rows_b = jnp.broadcast_to(rows[:, None, :], (8, span**3, S)).reshape(8, n_pairs)
    # Poison invalid pairs: chunk-range merging in the tracer may touch the
    # sorted tail, so sentinel records must be unhittable (far away).
    okf = ok.reshape(-1)
    poison = jnp.where(okf[None, :], rows_b[0:3], 1e10)
    rows_b = jnp.concatenate([poison, rows_b[3:]], axis=0)
    ops = (key,) + tuple(rows_b[i] for i in range(8))
    # Unstable: within-cell order is irrelevant (occlusion is a max
    # over pairs; segment order within a cell does not matter).
    sorted_ops = jax.lax.sort(ops, dimension=-1, is_stable=False, num_keys=1)
    skeys = sorted_ops[0]
    records = jnp.stack(sorted_ops[1:], axis=0)
    records = jnp.pad(records, ((0, 0), (0, chunk)))
    records = records.at[0:3, n_pairs:].set(1e10)

    crange = jnp.arange(G * G * G, dtype=jnp.int32)
    starts = jnp.searchsorted(skeys, crange, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(skeys, crange + 1, side="left").astype(jnp.int32)
    return SegmentGrid(
        records=records,
        cell_start=starts,
        cell_count=ends - starts,
        origin=lo_all,
        inv_cell=inv_cell,
        resolution=G,
        chunk=chunk,
    )


def _ao_kernel(
    # scalar prefetch: per pair-chunk segment range (in slots)
    seg_begin_ref,  # [n_chunks_pad]
    seg_chunks_ref,  # [n_chunks_pad] — number of segment chunks to test
    # inputs
    rays_vmem,  # [8, TILE_GROUP*C] this group's rays (Mosaic-pipelined)
    segs_hbm,  # [8, Ns + C] cell-sorted segment records
    # outputs
    occ_ref,  # [TILE_GROUP, C] occlusion flag per pair slot
    # scratch
    seg_scr,  # [TILE_GROUP + 2, 8, C]
    sems,  # DMA (TILE_GROUP + 2,)
    *,
    chunk: int,
):
    gi = pl.program_id(0)
    C = chunk

    occ_ref[:] = jnp.zeros(occ_ref.shape, jnp.float32)

    # Group prologue: start the FIRST segment chunk's DMA for every
    # pair-chunk in the group (slot k) so it lands while earlier chunks
    # compute; chunks >= 1 double-buffer through the two extra slots.
    # The ray records arrive through the Mosaic input pipeline (the pair
    # blocks are contiguous per grid step), so no manual ray DMA at all.
    for k in range(TILE_GROUP):
        pc = gi * TILE_GROUP + k
        nsc_k = seg_chunks_ref[pc]
        sb_k = seg_begin_ref[pc]

        @pl.when(nsc_k > 0)
        def _(sb_k=sb_k, k=k):
            pltpu.make_async_copy(
                segs_hbm.at[:, pl.ds(pl.multiple_of((sb_k // C) * C, C), C)],
                seg_scr.at[k],
                sems.at[k],
            ).start()

    for k in range(TILE_GROUP):
        pc = gi * TILE_GROUP + k  # pair-chunk index
        seg_begin = seg_begin_ref[pc]
        n_seg_chunks = seg_chunks_ref[pc]

        rays = rays_vmem[:, k * C : (k + 1) * C]  # [8, C]: rays are LANES
        ox, oy, oz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
        dxr, dyr, dzr = rays[3:4, :], rays[4:5, :], rays[5:6, :]
        tmax = rays[6:7, :]

        def slot_of(c, k=k):
            return jnp.where(c == 0, k, TILE_GROUP + jax.lax.rem(c, 2))

        def get_dma(slot, c, seg_begin=seg_begin):
            start = pl.multiple_of((seg_begin // C + c) * C, C)
            return pltpu.make_async_copy(
                segs_hbm.at[:, pl.ds(start, C)], seg_scr.at[slot], sems.at[slot]
            )

        @pl.when(n_seg_chunks > 0)
        def _(n_seg_chunks=n_seg_chunks, k=k, get_dma=get_dma,
              slot_of=slot_of,
              ox=ox, oy=oy, oz=oz, dxr=dxr, dyr=dyr, dzr=dzr, tmax=tmax):

            def cond(state):
                c, _occ = state
                return c < n_seg_chunks

            def body(state):
                c, occ = state
                slot = slot_of(c)
                get_dma(slot, c).wait()

                # Early out once every ray in the chunk is occluded —
                # binary occlusion can only grow, so remaining segment
                # chunks cannot change the result (the AO analogue of the
                # raster's saturation exit). The check runs HERE, after
                # waiting chunk c's DMA and BEFORE starting chunk c+1's:
                # exiting from `cond` with an un-waited in-flight DMA
                # would leave a stale semaphore signal that the NEXT
                # pair-chunk's wait on the same slot consumes while its
                # own copy is still in flight (data race on hardware).
                sat = jnp.min(occ) >= 1.0

                @pl.when((c + 1 < n_seg_chunks) & jnp.logical_not(sat))
                def _():
                    get_dma(slot_of(c + 1), c + 1).start()

                seg = seg_scr[slot]  # [8, C]

                def scal(r):
                    return seg[r : r + 1, :].T  # [C, 1] segments as SUBLANES

                # oa = o - a per (segment, ray): [C, C]
                oax = ox - scal(0)
                oay = oy - scal(1)
                oaz = oz - scal(2)
                bard = scal(3) * dxr + scal(4) * dyr + scal(5) * dzr
                rdoa = oax * dxr + oay * dyr + oaz * dzr
                baba = jnp.maximum(scal(7), 1e-20)
                rr = scal(6) * scal(6)
                # Re-origin at closest approach to the midpoint (precision).
                t0 = -(rdoa + 0.5 * bard)
                pax = oax + t0 * dxr
                pay = oay + t0 * dyr
                paz = oaz + t0 * dzr
                baoa = scal(3) * pax + scal(4) * pay + scal(5) * paz
                oaoa = pax * pax + pay * pay + paz * paz
                rd = rdoa + t0
                k2 = jnp.maximum(baba - bard * bard, 1e-20)
                k1 = baba * rd - baoa * bard
                k0 = baba * oaoa - baoa * baoa - rr * baba
                h = k1 * k1 - k2 * k0
                tb = (-k1 - jnp.sqrt(jnp.maximum(h, 0.0))) / k2
                yb = baoa + tb * bard
                okb = (h >= 0.0) & (yb > 0.0) & (yb < baba)
                ha = rd * rd - (oaoa - rr)
                ta = -rd - jnp.sqrt(jnp.maximum(ha, 0.0))
                ya = baoa + ta * bard
                oka = (ha >= 0.0) & (ya <= 0.0)
                b1b = rd - bard
                obob = oaoa - 2.0 * baoa + baba
                hb = b1b * b1b - (obob - rr)
                tbb = -b1b - jnp.sqrt(jnp.maximum(hb, 0.0))
                yb2 = baoa + tbb * bard
                okb2 = (hb >= 0.0) & (yb2 >= baba)

                def twv(tp, ok):
                    t_world = t0 + tp
                    ok = ok & (t_world > 1e-4) & (t_world < tmax)
                    return jnp.where(ok, 1.0, 0.0)

                hit = jnp.maximum(
                    twv(tb, okb), jnp.maximum(twv(ta, oka), twv(tbb, okb2))
                )
                occ = jnp.maximum(occ, jnp.max(hit, axis=0, keepdims=True))
                # Saturated at entry: chunk c's (already-waited) compute is
                # a no-op (occ is all ones) and no further DMA was started,
                # so jumping to n_seg_chunks leaves no in-flight copies.
                c_next = jnp.where(sat, n_seg_chunks, c + 1)
                return (c_next, occ)

            _, occ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.zeros((1, C), jnp.float32))
            )
            occ_ref[k : k + 1, :] = occ


@partial(jax.jit, static_argnames=("chunk", "interpret"))
def _trace_pairs(
    rays_sorted: jnp.ndarray,  # [8, n_pairs_pad + C]
    seg_begin: jnp.ndarray,  # [n_chunks] slot begin (C-aligned floor)
    seg_chunks: jnp.ndarray,  # [n_chunks]
    grid_records: jnp.ndarray,
    chunk: int,
    interpret: bool,
):
    n_chunks = seg_begin.shape[0]
    C = chunk
    n_pad = -(-n_chunks // TILE_GROUP) * TILE_GROUP
    seg_begin = jnp.pad(seg_begin, (0, n_pad - n_chunks))
    seg_chunks = jnp.pad(seg_chunks, (0, n_pad - n_chunks))
    kernel = functools.partial(_ao_kernel, chunk=C)
    # Rays are pair-contiguous per grid step: feed them through the Mosaic
    # input pipeline (auto double-buffered across steps) instead of manual
    # DMA. Re-pad the column count to exactly n_pad * C blocks.
    cols = rays_sorted.shape[1]
    if cols < n_pad * C:
        rays_blocked = jnp.pad(rays_sorted, ((0, 0), (0, n_pad * C - cols)))
    else:
        rays_blocked = rays_sorted[:, : n_pad * C]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // TILE_GROUP,),
        in_specs=[
            pl.BlockSpec(
                (8, TILE_GROUP * C), lambda i, *_: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (TILE_GROUP, C), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        scratch_shapes=[
            # TILE_GROUP first-chunk prefetch slots + 2 double-buffer slots.
            pltpu.VMEM((TILE_GROUP + 2, 8, C), jnp.float32),
            pltpu.SemaphoreType.DMA((TILE_GROUP + 2,)),
        ],
    )
    (occ,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad, C), jnp.float32)],
        interpret=interpret,
    )(seg_begin, seg_chunks, rays_blocked, grid_records)
    return occ[:n_chunks].reshape(-1)


@partial(jax.jit, static_argnames=("max_ray_cells", "interpret"))
def trace_ao_occlusion(
    origins: jnp.ndarray,  # [3, R]
    dirs: jnp.ndarray,  # [3, R] unit
    t_max: jnp.ndarray,  # [R]
    valid: jnp.ndarray,  # [R]
    grid: SegmentGrid,
    max_ray_cells: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns occluded [R] in {0, 1}. Exact within t_max (conservative
    cell coverage; over-merged chunk ranges only add true-positive tests).
    """
    R = origins.shape[1]
    G = grid.resolution
    C = grid.chunk

    # Cells crossed by each ray: uniform parameter sampling is sufficient
    # and branch-free because rays are short (t_max ~ a few cells); sample
    # max_ray_cells points along the ray and take their cells, plus dedup
    # via sentinel when equal to the previous sample's cell.
    ts = jnp.linspace(0.0, 1.0, max_ray_cells, dtype=jnp.float32)
    p = origins[:, None, :] + dirs[:, None, :] * (
        ts[None, :, None] * t_max[None, None, :]
    )  # [3, M, R]
    cc = jnp.clip(
        jnp.floor((p - grid.origin[:, None, None]) * grid.inv_cell[:, None, None])
        .astype(jnp.int32),
        0,
        G - 1,
    )
    cell = (cc[2] * G + cc[1]) * G + cc[0]  # [M, R]
    prev = jnp.concatenate([jnp.full((1, R), -1, jnp.int32), cell[:-1]], axis=0)
    dup = cell == prev
    cell = jnp.where(dup | ~valid[None, :], G * G * G, cell)
    # Drop pairs whose cell holds no segments (the vast majority).
    counts_of = grid.cell_count[jnp.clip(cell, 0, G * G * G - 1)]
    cell = jnp.where((cell < G * G * G) & (counts_of > 0), cell, G * G * G)

    n_pairs = max_ray_cells * R
    key = cell.reshape(-1)
    # Sort-carry only the 7 live record rows (o, d, t_max); the 8th row is
    # sublane padding, reattached as zeros after the sort.
    ray_rows = jnp.concatenate([origins, dirs, t_max[None]], axis=0)
    rows_b = jnp.broadcast_to(
        ray_rows[:, None, :], (7, max_ray_cells, R)
    ).reshape(7, n_pairs)
    ray_ids = jnp.broadcast_to(
        jnp.arange(R, dtype=jnp.int32)[None, :], (max_ray_cells, R)
    ).reshape(-1)
    ops = (key, ray_ids) + tuple(rows_b[i] for i in range(7))
    # Unstable: within-cell order is irrelevant (occlusion is a max
    # over pairs; segment order within a cell does not matter).
    sorted_ops = jax.lax.sort(ops, dimension=-1, is_stable=False, num_keys=1)
    skeys, sids = sorted_ops[0], sorted_ops[1]
    rays_sorted = jnp.concatenate(
        [jnp.stack(sorted_ops[2:], axis=0),
         jnp.zeros((1, n_pairs), jnp.float32)],
        axis=0,
    )
    # Pad to chunk multiple (+ one extra chunk for the DMA window).
    n_pairs_pad = -(-n_pairs // C) * C
    pad = n_pairs_pad + C - n_pairs
    rays_sorted = jnp.pad(rays_sorted, ((0, 0), (0, pad)))
    skeys_p = jnp.pad(skeys, (0, pad), constant_values=G * G * G)

    # Per pair-chunk: cells range [first, last] -> contiguous segment slots.
    n_chunks = n_pairs_pad // C
    first_cell = skeys_p.reshape(-1, C)[:n_chunks, 0]
    last_cell = skeys_p.reshape(-1, C)[:n_chunks, C - 1]
    first_cell = jnp.clip(first_cell, 0, G * G * G - 1)
    last_cell = jnp.clip(last_cell, 0, G * G * G - 1)
    s_begin = grid.cell_start[first_cell]
    s_end = grid.cell_start[last_cell] + grid.cell_count[last_cell]
    begin_floor = (s_begin // C) * C
    seg_chunks = jnp.where(
        s_end > s_begin, (s_end - begin_floor + C - 1) // C, 0
    )

    occ_pairs = _trace_pairs(
        rays_sorted, begin_floor, seg_chunks, grid.records, C, interpret
    )
    sids_t = jnp.pad(sids, (0, pad))[:n_pairs_pad]
    skeys_t = skeys_p[:n_pairs_pad]
    occluded = jnp.zeros((R,), jnp.float32).at[sids_t].max(
        jnp.where(skeys_t < G * G * G, occ_pairs, 0.0), mode="drop"
    )
    return occluded
