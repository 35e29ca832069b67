"""Image denoisers: EAW (à-trous) and SVGF-style variance-guided filtering.

Port of the reference denoiser family (`src/Renderers/Scattering/Denoiser/
{EAWDenoiser,SVGF}.{hpp,cpp}`, `Data/Shaders/Denoiser/{EAWDenoise,SVGF}.glsl`;
pluggable enum `Denoiser.hpp:62-99`): edge-avoiding à-trous wavelet
filtering (Dammertz et al. 2010) with a 5x5 Gaussian kernel and
edge-stopping weights on color / position / normal feature maps
(defaults phiColor=5.0, phiPosition=0.1, phiNormal=0.1,
EAWDenoiser.hpp:85-87), iterated with stepWidth *= 2 per pass.

The SVGF variant (Schied et al. 2017) adds per-pixel luminance variance
estimation that scales the color edge-stopping weight and is filtered
along with the color.  The reference's temporal reprojection needs
motion vectors from the previous frame; this implementation is the
spatial SVGF core — temporal accumulation composes with it through the
renderers' frame accumulators (e.g. RTAO / VPT), which play the history
buffer's role for static cameras.

Everything is plain vectorized JAX — 25-tap gathers become 25 shifted
adds, which XLA fuses into a single pass over HBM.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "eaw_denoise",
    "svgf_denoise",
    "svgf_temporal_denoise",
    "SvgfTemporalState",
    "spatial_hash_denoise",
]


def _shift2d(img, dy, dx):
    """Shift [..., H, W] by (dy, dx) with edge clamp."""
    H, W = img.shape[-2], img.shape[-1]
    ys = jnp.clip(jnp.arange(H) + dy, 0, H - 1)
    xs = jnp.clip(jnp.arange(W) + dx, 0, W - 1)
    return img[..., ys, :][..., :, xs]


def _eaw_pass(
    color, position, normal, step: int,
    phi_color: float, phi_position: float, phi_normal: float,
):
    """One à-trous pass (EAWDenoise.glsl main loop)."""
    acc = jnp.zeros_like(color)
    acc_w = jnp.zeros(color.shape[-2:], color.dtype)
    for i in range(25):
        x = (i % 5) - 2
        y = (i // 5) - 2
        kv = jnp.exp(-(x * x + y * y) / 2.0)
        oc = _shift2d(color, y * step, x * step)
        dc = color - oc
        w = jnp.minimum(
            jnp.exp(-jnp.sum(dc * dc, axis=0) / phi_color), 1.0
        )
        if position is not None:
            op = _shift2d(position, y * step, x * step)
            dp = position - op
            w = w * jnp.minimum(
                jnp.exp(-jnp.sum(dp * dp, axis=0) / phi_position), 1.0
            )
        if normal is not None:
            on = _shift2d(normal, y * step, x * step)
            dn = normal - on
            w = w * jnp.minimum(
                jnp.exp(-jnp.sum(dn * dn, axis=0) / phi_normal), 1.0
            )
        acc = acc + kv * w[None] * oc
        acc_w = acc_w + kv * w
    return acc / jnp.maximum(acc_w, 1e-8)[None]


@partial(
    jax.jit,
    static_argnames=("num_iterations", "phi_color", "phi_position",
                     "phi_normal"),
)
def eaw_denoise(
    color: jnp.ndarray,  # [C, H, W]
    position: jnp.ndarray = None,  # [3, H, W]
    normal: jnp.ndarray = None,  # [3, H, W]
    num_iterations: int = 3,
    phi_color: float = 5.0,
    phi_position: float = 0.1,
    phi_normal: float = 0.1,
) -> jnp.ndarray:
    """Edge-avoiding à-trous wavelet denoise (EAWDenoiser.cpp:316-320:
    stepWidth doubles each iteration)."""
    out = color
    step = 1
    for _ in range(num_iterations):
        out = _eaw_pass(
            out, position, normal, step, phi_color, phi_position, phi_normal
        )
        step *= 2
    return out


def _luminance(c):
    return 0.2126 * c[0] + 0.7152 * c[1] + 0.0722 * c[2]


def _spatial_variance(color):
    """3x3 luminance moment variance estimate (spatial fallback)."""
    lum = _luminance(color)
    m1 = jnp.zeros_like(lum)
    m2 = jnp.zeros_like(lum)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            v = _shift2d(lum, dy, dx)
            m1 = m1 + v
            m2 = m2 + v * v
    m1 = m1 / 9.0
    m2 = m2 / 9.0
    return jnp.maximum(m2 - m1 * m1, 0.0)


@partial(
    jax.jit,
    static_argnames=("num_iterations", "phi_color", "phi_normal"),
)
def svgf_denoise(
    color: jnp.ndarray,  # [3, H, W]
    position: jnp.ndarray = None,
    normal: jnp.ndarray = None,
    num_iterations: int = 4,
    phi_color: float = 10.0,
    phi_normal: float = 128.0,
    variance: jnp.ndarray = None,  # [H, W] temporally integrated variance
) -> jnp.ndarray:
    """Spatial SVGF: luminance-variance-normalized color edge-stopping
    weight (Schied et al. 2017 eq. 4), filtered with the à-trous
    schedule.  `variance` (from svgf_temporal_denoise's reprojected
    moments) replaces the spatial 3x3 estimate when given."""
    var = _spatial_variance(color) if variance is None else variance

    out = color
    step = 1
    for _ in range(num_iterations):
        sigma = jnp.sqrt(var) + 1e-4
        acc = jnp.zeros_like(out)
        acc_v = jnp.zeros_like(var)
        lum_c = _luminance(out)
        acc_w = jnp.zeros_like(lum_c)
        for i in range(25):
            x = (i % 5) - 2
            y = (i // 5) - 2
            kv = jnp.exp(-(x * x + y * y) / 2.0)
            oc = _shift2d(out, y * step, x * step)
            dl = jnp.abs(lum_c - _luminance(oc))
            w = jnp.exp(-dl / (phi_color * sigma))
            if normal is not None:
                on = _shift2d(normal, y * step, x * step)
                ndot = jnp.clip(jnp.sum(normal * on, axis=0), 0.0, 1.0)
                w = w * ndot ** phi_normal
            if position is not None:
                op = _shift2d(position, y * step, x * step)
                dp = position - op
                w = w * jnp.exp(-jnp.sum(dp * dp, axis=0) / 0.1)
            acc = acc + kv * w[None] * oc
            acc_v = acc_v + (kv * w) ** 2 * _shift2d(var, y * step, x * step)
            acc_w = acc_w + kv * w
        out = acc / jnp.maximum(acc_w, 1e-8)[None]
        var = acc_v / jnp.maximum(acc_w, 1e-8) ** 2
        step *= 2
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SvgfTemporalState:
    """Per-pixel history carried between frames (SVGF.hpp:46,92: color +
    moments history textures, history length, and the previous frame's
    geometry for the reprojection validity test)."""

    color: jnp.ndarray  # [3, H, W] temporally integrated color
    moments: jnp.ndarray  # [2, H, W] integrated luminance moments
    length: jnp.ndarray  # [H, W] history length
    position: jnp.ndarray  # [3, H, W] world positions of the prev frame


def _bilinear(img, ys, xs):
    """Sample [C, H, W] at float (ys, xs) with edge clamp."""
    H, W = img.shape[-2], img.shape[-1]
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1)
    fy = jnp.clip(ys - y0, 0.0, 1.0)
    fx = jnp.clip(xs - x0, 0.0, 1.0)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    return (
        img[..., y0i, x0i] * ((1 - fy) * (1 - fx))
        + img[..., y0i, x1i] * ((1 - fy) * fx)
        + img[..., y1i, x0i] * (fy * (1 - fx))
        + img[..., y1i, x1i] * (fy * fx)
    )


@partial(
    jax.jit,
    static_argnames=("num_iterations", "phi_color", "phi_normal",
                     "alpha", "moments_alpha", "position_tolerance"),
)
def svgf_temporal_denoise(
    color: jnp.ndarray,  # [3, H, W] THIS frame's noisy color
    motion: jnp.ndarray,  # [2, H, W] screen motion in px (+x right/+y down)
    position: jnp.ndarray,  # [3, H, W] world positions (validity + filter)
    state: SvgfTemporalState = None,  # None on the first frame / reset
    normal: jnp.ndarray = None,
    num_iterations: int = 4,
    phi_color: float = 10.0,
    phi_normal: float = 128.0,
    alpha: float = 0.2,
    moments_alpha: float = 0.2,
    position_tolerance: float = 0.01,
):
    """Full SVGF (Schied et al. 2017; reference SVGF.hpp:46,92 — the
    always-temporal variant with motion textures):

    1. reproject the history color/moments at (pixel - motion) with
       bilinear taps;
    2. validate by world-position consistency (the reference tests
       depth + normal; positions subsume depth for our G-buffers) —
       disoccluded pixels restart at history length 1;
    3. exponentially integrate color and luminance moments
       (alpha floor 0.2, or 1/len while the history is shorter than 5);
    4. variance = integrated m2 - m1^2, with the spatial 3x3 fallback
       for short histories (< 4 frames, as in the paper);
    5. à-trous filter the integrated color with the variance-scaled
       edge-stopping weights (svgf_denoise).

    Returns (filtered [3, H, W], new_state).  Pass the returned state to
    the next frame; on camera cuts pass state=None.
    """
    H, W = color.shape[-2], color.shape[-1]
    lum = _luminance(color)
    cur_moments = jnp.stack([lum, lum * lum], axis=0)

    if state is None:
        new_state = SvgfTemporalState(
            color=color, moments=cur_moments,
            length=jnp.ones((H, W), jnp.float32), position=position,
        )
        out = svgf_denoise(
            color, position=position, normal=normal,
            num_iterations=num_iterations, phi_color=phi_color,
            phi_normal=phi_normal,
        )
        return out, new_state

    ys = jnp.arange(H, dtype=jnp.float32)[:, None] - motion[1]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] - motion[0]
    in_bounds = (ys >= 0) & (ys <= H - 1) & (xs >= 0) & (xs <= W - 1)
    hist_color = _bilinear(state.color, ys, xs)
    hist_moments = _bilinear(state.moments, ys, xs)
    hist_length = _bilinear(state.length[None], ys, xs)[0]
    hist_pos = _bilinear(state.position, ys, xs)

    # Geometry consistency: the reprojected history must belong to the
    # same surface (disocclusion test, SVGF sec. 4.1; absolute world
    # distance — scenes are normalized to the unit box).
    dpos = jnp.linalg.norm(hist_pos - position, axis=0)
    valid = in_bounds & (dpos < position_tolerance)

    length = jnp.where(valid, hist_length + 1.0, 1.0)
    a_c = jnp.maximum(alpha, 1.0 / length)
    a_m = jnp.maximum(moments_alpha, 1.0 / length)
    integrated = jnp.where(
        valid[None], hist_color * (1 - a_c)[None] + color * a_c[None], color
    )
    moments = jnp.where(
        valid[None],
        hist_moments * (1 - a_m)[None] + cur_moments * a_m[None],
        cur_moments,
    )
    var_t = jnp.maximum(moments[1] - moments[0] * moments[0], 0.0)
    # Short history -> spatial variance estimate (paper sec. 4.2).
    var = jnp.where(length < 4.0, _spatial_variance(integrated), var_t)

    out = svgf_denoise(
        integrated, position=position, normal=normal,
        num_iterations=num_iterations, phi_color=phi_color,
        phi_normal=phi_normal, variance=var,
    )
    new_state = SvgfTemporalState(
        color=integrated, moments=moments, length=length, position=position
    )
    return out, new_state


def _wang_hash(x):
    """wang_hash (SH_Denoise.glsl:58-66) on uint32 lanes."""
    x = (x ^ jnp.uint32(61)) ^ (x >> 16)
    x = x * jnp.uint32(9)
    x = x ^ (x >> 4)
    x = x * jnp.uint32(0x27D4EB2D)
    x = x ^ (x >> 15)
    return x


def _f2u(f):
    return jax.lax.bitcast_convert_type(f.astype(jnp.float32), jnp.uint32)


@partial(jax.jit, static_argnames=("table_size",))
def spatial_hash_denoise(
    values: jnp.ndarray,  # [H, W] noisy scalar (AO)
    position: jnp.ndarray,  # [3, H, W] world positions
    normal: jnp.ndarray,  # [3, H, W]
    cam_pos: jnp.ndarray,  # [3]
    s_p: float = 4.0,  # coarseness in pixels
    s_min: float = 1e-3,  # smallest cell size
    s_nd: float = 2.0,  # normal quantization
    table_size: int = 1 << 20,
) -> jnp.ndarray:
    """Spatial-hashing denoiser (reference SpatialHashingDenoiser.cpp,
    `Data/Shaders/Denoiser/SH_Denoise.glsl`): every pixel hashes its
    world position — quantized at a DISTANCE-ADAPTIVE power-of-two cell
    size (`s_wd_calc`, glsl:199-205) — plus its quantized normal
    (`H7D`, glsl:132-141) into a hash map; cells average all noisy
    contributions, and each pixel reads back its cell mean.

    TPU-native: the atomic write pass becomes a `scatter-add` into the
    (sum, count) table and the read pass a gather — one pass, no
    atomics, no probing loop (hash collisions average instead of being
    evicted by checksum; at the default table size they are rare)."""
    H, W = values.shape
    dis = jnp.linalg.norm(position - cam_pos[:, None, None], axis=0)
    s_w = dis * jnp.tan(jnp.float32(s_p) / jnp.float32(H))
    log_step = jnp.floor(jnp.log2(jnp.maximum(s_w / s_min, 1.0)))
    s_wd = jnp.exp2(log_step) * s_min

    cell = jnp.floor(position / s_wd[None])
    nq = jnp.trunc(
        normal
        / jnp.maximum(jnp.linalg.norm(normal, axis=0, keepdims=True), 1e-9)
        * s_nd
    )
    h = _wang_hash(
        _f2u(cell[0])
        + _wang_hash(_f2u(cell[1]) + _wang_hash(_f2u(cell[2])
                                                + _f2u(s_wd)))
    )
    for c in range(3):
        h = _wang_hash(_f2u(nq[c]) + h)
    idx = (h % jnp.uint32(table_size)).astype(jnp.int32).reshape(-1)

    sums = jnp.zeros((table_size,), jnp.float32).at[idx].add(
        values.reshape(-1)
    )
    counts = jnp.zeros((table_size,), jnp.float32).at[idx].add(1.0)
    return (sums[idx] / jnp.maximum(counts[idx], 1.0)).reshape(H, W)
