"""Device-side point rasterizer — the headless replacement for the
reference's OpenGL pipeline (``simulation_visualization.cpp``).

The reference renders bodies as GL_POINTS through a CUDA<->GL interop VBO so
positions never leave the device (``simulation_visualization.cpp:172-223``);
its vertex shader maps positions into NDC by dividing by +/-MAX_VIEW* and
mass into a [0,1] weight (``.cpp:27-37``), and its fragment shader colors
each point by lerping green->red with that weight (``.cpp:46-56``).

The TPU-native equivalent keeps the same zero-copy spirit: a jitted
scatter-based point splat runs *on device* over the simulation's own arrays
(no host round-trip of the body set), producing a small RGB frame that is the
only thing streamed to the host.  Orthographic projection drops the axis
``view_axis`` (default z, matching the reference's fixed unrotated camera —
its model/view matrices are commented out, ``.cpp:196-214``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Defaults matching simulation_visualization.h:8-9 and constants.h:15-23
DEFAULT_WIDTH = 800
DEFAULT_HEIGHT = 600


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "view_axis", "background"))
def render_frame(pos: jax.Array, mass: jax.Array,
                 min_mass: float, max_mass: float, max_view: float,
                 width: int = DEFAULT_WIDTH, height: int = DEFAULT_HEIGHT,
                 view_axis: int = 2, background: float = 0.0) -> jax.Array:
    """Rasterize bodies to an (H, W, 3) uint8 RGB frame on device.

    Color: green->red lerp by normalized mass weight, exactly the fragment
    shader's ``mix(green, red, weight)`` (simulation_visualization.cpp:46-56).
    Bodies outside the +/-max_view box clip out (NDC clip behavior).
    Where several bodies land on one pixel the max weight wins (a depth-less
    brightest-point rule standing in for GL's last-write; deterministic,
    unlike the reference).  Zero-mass ghosts never draw (their weight is
    below any real body's and the background is reserved).
    """
    axes = [a for a in range(3) if a != view_axis]
    u = pos[:, axes[0]] / max_view          # NDC x in [-1, 1]
    v = pos[:, axes[1]] / max_view          # NDC y
    # Weight in [0,1] like the vertex shader (simulation_visualization.cpp:33)
    weight = jnp.clip((mass - min_mass) / (max_mass - min_mass), 0.0, 1.0)

    px = ((u + 1.0) * 0.5 * (width - 1)).astype(jnp.int32)
    py = ((1.0 - (v + 1.0) * 0.5) * (height - 1)).astype(jnp.int32)
    inside = ((u >= -1.0) & (u <= 1.0) & (v >= -1.0) & (v <= 1.0)
              & (mass > 0.0))

    flat_idx = jnp.where(inside, py * width + px, width * height)
    # weight+1 keeps any real body above the 0.0 background sentinel.
    splat = jnp.zeros((width * height + 1,), jnp.float32).at[flat_idx].max(
        jnp.where(inside, weight + 1.0, 0.0))
    splat = splat[:-1].reshape(height, width)

    hit = splat > 0.0
    w = jnp.clip(splat - 1.0, 0.0, 1.0)
    # mix(green, red, w): r = w, g = 1-w, b = 0 (fragment shader :51-55)
    r = jnp.where(hit, w, background)
    g = jnp.where(hit, 1.0 - w, background)
    b = jnp.where(hit, 0.0, background)
    frame = jnp.stack([r, g, b], axis=-1)
    return (frame * 255.0 + 0.5).astype(jnp.uint8)
