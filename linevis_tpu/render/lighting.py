"""Shading math: Blinn-Phong tube shading, depth cues, channels-first.

Direct behavioral port of `Data/Shaders/Utils/Lighting.glsl`
(`blinnPhongShadingTube`): headlight at the camera, tube-aware diffuse term
mixing the plain N.L with the cylinder-averaged N.L' (L' = L projected
orthogonal to the tangent), constants kA=0.1 kD=0.9 kS=0.3 s=30,
exponent 1.7 (tubes) / 1.0 (bands); depth-cue darkening toward gray 0.5
(same formula as `Lighting.glsl:85-87`).

All vector arrays are channels-first: shape [3, ...] with the component
axis leading, so image-sized operands keep the long pixel axes on TPU
lanes (see `linevis_tpu/geometry/tubes.py` for the layout rationale).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["dot3", "normalize3", "cross3", "blinn_phong_shade_tube", "apply_depth_cue"]

_EPS = 1e-8


def dot3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=0)


def normalize3(v: jnp.ndarray) -> jnp.ndarray:
    return v / jnp.maximum(jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True)), _EPS)


def cross3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ],
        axis=0,
    )


def blinn_phong_shade_tube(
    base_color: jnp.ndarray,  # [3, ...] linear RGB
    position: jnp.ndarray,  # [3, ...] world
    normal: jnp.ndarray,  # [3, ...]
    tangent: jnp.ndarray,  # [3, ...]
    camera_position: jnp.ndarray,  # [3]
    use_bands: bool = False,
) -> jnp.ndarray:
    k_a, k_d, k_s, s = 0.1, 0.9, 0.3, 30.0
    exponent = 1.0 if use_bands else 1.7

    extra = (1,) * (position.ndim - 1)
    cam = camera_position.reshape((3,) + extra)
    n = normalize3(normal)
    v = normalize3(cam - position)
    light = v  # headlight
    h = normalize3(v + light)
    t = normalize3(tangent)

    helper = normalize3(cross3(t, light))
    new_l = normalize3(cross3(helper, t))

    cos1 = jnp.clip(jnp.abs(dot3(n, light)), 0.0, 1.0) ** exponent
    cos2 = jnp.clip(jnp.abs(dot3(n, new_l)), 0.0, 1.0) ** exponent
    cos_combined = 0.3 * cos1 + 0.7 * cos2

    i_a = k_a * base_color
    i_d = k_d * cos_combined[None] * base_color
    i_s = k_s * jnp.clip(jnp.abs(dot3(n, h)), 0.0, 1.0)[None] ** s
    return i_a + i_d + i_s


def blinn_phong_shade_surface(
    base_color: jnp.ndarray,  # [3, ...] linear RGB
    position: jnp.ndarray,  # [3, ...] world
    normal: jnp.ndarray,  # [3, ...]
    camera_position: jnp.ndarray,  # [3]
) -> jnp.ndarray:
    """General (non-tube) Blinn-Phong with the reference's surface
    constants kA=0.1, kD=1.0, kS=0.3, s=50 (Lighting.glsl:66-72),
    headlight l = v, used for triangle-mesh datasets and hulls."""
    k_a, k_d, k_s, s = 0.1, 1.0, 0.3, 50.0
    extra = (1,) * (position.ndim - 1)
    cam = camera_position.reshape((3,) + extra)
    n = normalize3(normal)
    v = normalize3(cam - position)
    h = v  # headlight: h = normalize(v + l) = v
    i_a = k_a * base_color
    i_d = k_d * jnp.clip(jnp.abs(dot3(n, v)), 0.0, 1.0)[None] * base_color
    i_s = k_s * jnp.clip(jnp.abs(dot3(n, h)), 0.0, 1.0)[None] ** s
    return i_a + i_d + i_s


def apply_depth_cue(
    color: jnp.ndarray,  # [3, ...]
    view_z: jnp.ndarray,  # [...] positive distance along view dir
    min_depth: jnp.ndarray,
    max_depth: jnp.ndarray,
    strength: float = 0.8,
) -> jnp.ndarray:
    """Darken toward gray with squared normalized view depth.

    Reference: `Lighting.glsl` depth-cue block; default depthCueStrength 0.8
    (`src/Renderers/LineRenderer.hpp`).
    """
    f = jnp.clip(
        (view_z - min_depth) / jnp.maximum(max_depth - min_depth, 1e-6), 0.0, 1.0
    )
    f = (f * f * strength)[None]
    return color * (1.0 - f) + 0.5 * f
