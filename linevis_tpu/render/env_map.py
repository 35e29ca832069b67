"""Environment-map lighting for the volumetric path tracer.

Reference: `VolumetricPathTracingPass.hpp:169-174` (environment map +
intensity factor) and the lat-long lookup in `Data/Shaders/Scattering/
Clouds/VptUtils.glsl:129-148`:

    texcoord = (atan(dir.z, dir.x) / TWO_PI + 0.5, -asin(dir.y) / PI + 0.5)

The reference loads OpenEXR; this environment has no OpenEXR, so the
loader reads Radiance RGBE (.hdr, decoded here — the format is 4 bytes
per pixel, shared-exponent) and LDR images via PIL (sRGB -> linear).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["load_environment_map", "sample_env_map"]


def _srgb_to_linear(c: np.ndarray) -> np.ndarray:
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _load_radiance_hdr(path: str) -> np.ndarray:
    """Minimal Radiance RGBE reader (flat or adaptive-RLE scanlines)."""
    with open(path, "rb") as f:
        raw = f.read()
    if not (raw.startswith(b"#?RADIANCE") or raw.startswith(b"#?RGBE")):
        raise ValueError(f"{path}: not a Radiance HDR file")
    pos = raw.find(b"\n\n")
    if pos < 0:
        raise ValueError(f"{path}: missing HDR header terminator")
    dims = raw[pos + 2 : raw.find(b"\n", pos + 2)].split()
    if len(dims) != 4 or dims[0] != b"-Y" or dims[2] != b"+X":
        raise ValueError(f"{path}: unsupported HDR orientation {dims}")
    h, w = int(dims[1]), int(dims[3])
    data = raw[raw.find(b"\n", pos + 2) + 1 :]
    rgbe = np.zeros((h, w, 4), np.uint8)
    off = 0
    for y in range(h):
        if (
            len(data) - off >= 4
            and data[off] == 2
            and data[off + 1] == 2
            and ((data[off + 2] << 8) | data[off + 3]) == w
        ):
            off += 4  # adaptive RLE scanline
            for c in range(4):
                x = 0
                while x < w:
                    count = data[off]
                    off += 1
                    if count > 128:  # run
                        rgbe[y, x : x + count - 128, c] = data[off]
                        off += 1
                        x += count - 128
                    else:  # literal
                        rgbe[y, x : x + count, c] = np.frombuffer(
                            data, np.uint8, count, off
                        )
                        off += count
                        x += count
        else:  # flat scanline
            row = np.frombuffer(data, np.uint8, w * 4, off)
            rgbe[y] = row.reshape(w, 4)
            off += w * 4
    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp == 0, 0.0, np.ldexp(1.0, exp - 136))
    return (rgbe[..., :3].astype(np.float32) + 0.5) * scale[..., None]


def load_environment_map(path: str) -> np.ndarray:
    """-> [H, W, 3] float32 LINEAR radiance, equirectangular."""
    if path.lower().endswith(".hdr"):
        return _load_radiance_hdr(path).astype(np.float32)
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return _srgb_to_linear(img).astype(np.float32)


def sample_env_map(env: jnp.ndarray, w: jnp.ndarray,
                   intensity) -> jnp.ndarray:
    """Bilinear lat-long lookup (VptUtils.glsl:136 convention).
    env: [H, W, 3]; w: [..., 3] unit directions."""
    H, W = env.shape[0], env.shape[1]
    u = jnp.arctan2(w[..., 2], w[..., 0]) / (2.0 * jnp.pi) + 0.5
    v = -jnp.arcsin(jnp.clip(w[..., 1], -1.0, 1.0)) / jnp.pi + 0.5
    fx = u * W - 0.5
    fy = v * H - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), W)  # wrap in longitude
    x1i = jnp.mod(x0i + 1, W)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)  # clamp at the poles
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    c00 = env[y0i, x0i]
    c01 = env[y0i, x1i]
    c10 = env[y1i, x0i]
    c11 = env[y1i, x1i]
    col = (
        (c00 * (1 - tx) + c01 * tx) * (1 - ty)
        + (c10 * (1 - tx) + c11 * tx) * ty
    )
    return intensity * col
