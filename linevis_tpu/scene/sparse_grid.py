"""Block-sparse density grids — the NanoVDB role for VPT clouds.

The reference vendors NanoVDB (`src/Renderers/Scattering/nanovdb/*`,
~12 kLoC headers; GLSL mirror `PNanoVDB.glsl`) so the volumetric path
tracer can sample sparse VDB cloud files without densifying.  The TPU
rebuild keeps the capability — memory proportional to OCCUPIED space,
identical trilinear samples — with a structure XLA can gather from:

* the volume is tiled into `block`^3 bricks; empty bricks (all zero)
  store nothing,
* active bricks are packed into one dense `[n_active, b+1, b+1, b+1]`
  array WITH a +1 apron on the high side, so any trilinear stencil
  that starts inside a brick is fully contained in it — one gather
  per sample, no neighbor-brick fix-up,
* a dense `[Zb, Yb, Xb]` int table maps brick coords -> packed index,
  with index 0 reserved for the shared all-zero brick (NanoVDB's
  background value).

`sample()` matches `sample_grid_trilinear` on the equivalent dense
grid bit-for-bit wherever both are defined (tests/test_sparse_grid.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SparseGrid"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseGrid:
    """Block-sparse [Z, Y, X] scalar grid (see module docstring)."""

    bricks: jnp.ndarray  # [n_active + 1, b+1, b+1, b+1]; bricks[0] == 0
    table: jnp.ndarray  # [Zb, Yb, Xb] int32 -> brick index
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    block: int = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def from_dense(cls, grid, block: int = 8) -> "SparseGrid":
        g = np.asarray(grid, np.float32)
        sz, sy, sx = g.shape
        b = int(block)
        nz, ny, nx = (-(-sz // b), -(-sy // b), -(-sx // b))
        # Pad to brick multiples + 1 apron voxel (edge values, matching
        # the dense sampler's boundary clamp).
        gp = np.pad(
            g,
            ((0, nz * b - sz + 1), (0, ny * b - sy + 1), (0, nx * b - sx + 1)),
            mode="edge",
        )
        table = np.zeros((nz, ny, nx), np.int32)
        bricks = [np.zeros((b + 1, b + 1, b + 1), np.float32)]
        for bz in range(nz):
            for by in range(ny):
                for bx in range(nx):
                    br = gp[bz * b:bz * b + b + 1,
                            by * b:by * b + b + 1,
                            bx * b:bx * b + b + 1]
                    if np.any(br != 0.0):
                        table[bz, by, bx] = len(bricks)
                        bricks.append(br)
        return cls(
            bricks=jnp.asarray(np.stack(bricks)),
            table=jnp.asarray(table),
            shape=(sz, sy, sx),
            block=b,
        )

    @property
    def n_active(self) -> int:
        return int(self.bricks.shape[0]) - 1

    def memory_ratio(self) -> float:
        """Sparse voxel count / dense voxel count."""
        dense = float(np.prod(self.shape))
        b1 = self.block + 1
        return self.bricks.shape[0] * (b1 ** 3) / dense

    def sample(self, p: jnp.ndarray) -> jnp.ndarray:
        """Trilinear sample at p in [0,1]^3 ([..., 3], xyz order) —
        same convention as `sample_grid_trilinear` on the dense grid."""
        sz, sy, sx = self.shape
        b = self.block
        fx = jnp.clip(p[..., 0], 0.0, 1.0) * (sx - 1)
        fy = jnp.clip(p[..., 1], 0.0, 1.0) * (sy - 1)
        fz = jnp.clip(p[..., 2], 0.0, 1.0) * (sz - 1)
        x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, sx - 2)
        y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, sy - 2)
        z0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, sz - 2)
        tx = fx - x0
        ty = fy - y0
        tz = fz - z0
        bi = self.table[z0 // b, y0 // b, x0 // b]
        lz, ly, lx = z0 % b, y0 % b, x0 % b

        def g(dz, dy, dx):
            return self.bricks[bi, lz + dz, ly + dy, lx + dx]

        c00 = g(0, 0, 0) * (1 - tx) + g(0, 0, 1) * tx
        c01 = g(0, 1, 0) * (1 - tx) + g(0, 1, 1) * tx
        c10 = g(1, 0, 0) * (1 - tx) + g(1, 0, 1) * tx
        c11 = g(1, 1, 0) * (1 - tx) + g(1, 1, 1) * tx
        c0 = c00 * (1 - ty) + c01 * ty
        c1 = c10 * (1 - ty) + c11 * ty
        return c0 * (1 - tz) + c1 * tz
