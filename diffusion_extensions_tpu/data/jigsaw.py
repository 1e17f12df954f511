"""Jigsaw translation toy: square + circle image rendering, on-device.

The reference renders each batch element with PIL in a host Python loop
(``jigsaw_translate.py:14-55``) — the slowest possible data path.  Here the
square/circle raster is pure jnp over coordinate grids, vectorised over the
batch and fused into the training step (the projection runs *inside* jit on
the TPU), so the "data pipeline" costs one elementwise pass over
B x 128 x 128 pixels.

Geometry matches the reference: a red square and a blue circle at random
positions (circle within +-circle_size/2 of the square's centre), the
circle's true position cut out (white), the diffusion state mapped to pixel
space via ``pixels = size * x / 8 + size / 2`` (the image is treated as 8
standard deviations wide, ``jigsaw_translate.py:38``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["JigsawPuzzle", "render_jigsaw"]

_RED = (1.0, 0.0, 0.0)
_BLUE = (0.0, 0.0, 1.0)
_WHITE = (1.0, 1.0, 1.0)


def render_jigsaw(
    circ_positions: jax.Array,
    square_pos: jax.Array,
    circle_true: jax.Array,
    size: int = 128,
    square_size: int = 32,
    circle_size: int = 32,
) -> jax.Array:
    """(..., 2) diffusion state -> (..., size, size, 3) NHWC images.

    Pure function of the state and the puzzle's two scalar positions, so a
    fresh puzzle per training step reuses the same compiled program.
    """
    pix = size * circ_positions / 8.0 + size / 2.0  # state -> pixel space
    batch_shape = pix.shape[:-1]
    flat = pix.reshape(-1, 2)

    gx = jnp.arange(size, dtype=jnp.float32)[:, None]
    gy = jnp.arange(size, dtype=jnp.float32)[None, :]
    half_sq = square_size / 2.0
    half_c = circle_size / 2.0

    in_square = (jnp.abs(gx - square_pos[0]) <= half_sq) & (
        jnp.abs(gy - square_pos[1]) <= half_sq
    )
    d_true = jnp.hypot(gx - circle_true[0], gy - circle_true[1])
    base = jnp.where(
        in_square[..., None], jnp.asarray(_RED), jnp.asarray(_WHITE)
    )
    base = jnp.where((d_true <= half_c)[..., None], jnp.asarray(_WHITE), base)

    # batched moving circle: (B, size, size)
    d_circ = jnp.hypot(
        gx[None] - flat[:, 0, None, None], gy[None] - flat[:, 1, None, None]
    )
    imgs = jnp.where(
        (d_circ <= half_c)[..., None], jnp.asarray(_BLUE), base[None]
    )
    return imgs.reshape(*batch_shape, size, size, 3)


class JigsawPuzzle:
    """One puzzle instance (a fixed square + true circle position), callable
    as a process ``projection``: (B, 2) -> (B, size, size, 3)."""

    def __init__(self, size=128, square_size=32, circle_size=32, seed=None):
        self.size = size
        self.circle_size = circle_size
        self.square_size = square_size
        rng = np.random.default_rng(seed=seed)
        lo = (circle_size + square_size) // 2
        hi = size - lo
        self.square_pos = rng.integers(lo, hi, size=2)
        self.circle_pos = (
            rng.integers(-circle_size // 2, circle_size // 2, size=2)
            + self.square_pos
        )
        # state-space ground truth (reference: jigsaw_translate.py:28)
        self.x_0 = jnp.asarray(
            (self.circle_pos - size / 2) * 8.0 / size, dtype=jnp.float32
        )

    def draw_true(self) -> jax.Array:
        """The solved puzzle image (reference: ``draw_true``)."""
        return render_jigsaw(
            self.x_0[None],
            jnp.asarray(self.square_pos, jnp.float32),
            # true circle drawn blue at its own spot: pass it as the moving
            # circle and put the cut-out far off-screen
            jnp.asarray([-1e6, -1e6], jnp.float32),
            self.size,
            self.square_size,
            self.circle_size,
        )[0]

    def __call__(self, circ_positions: jax.Array) -> jax.Array:
        return render_jigsaw(
            circ_positions,
            jnp.asarray(self.square_pos, jnp.float32),
            jnp.asarray(self.circle_pos, jnp.float32),
            self.size,
            self.square_size,
            self.circle_size,
        )
