"""Morton (Z-order) pixel indexing, vectorized.

The reference renders pixels in Morton order for intra-warp ray coherence and
de-swizzles when writing the PPM (reference: camera.h:57-75, kernel.cu:771).
We keep the same pixel ordering: on TPU it groups spatially-coherent rays into
the same vector tiles, which reduces per-tile BVH traversal divergence (the
while-loop runs until the *slowest lane* in a batch finishes, so coherent
batches finish sooner).

The bit-interleave is implemented with the standard parallel-prefix spread
instead of the reference's 16-iteration loop — identical results for 16-bit
coordinates, O(log n) ops, fully vectorized.
"""

from __future__ import annotations

import jax.numpy as jnp


def _part1by1(v):
    """Spread the low 16 bits of v so there is a 0 bit between each."""
    v = v & jnp.uint32(0x0000FFFF)
    v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
    v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
    v = (v | (v << 2)) & jnp.uint32(0x33333333)
    v = (v | (v << 1)) & jnp.uint32(0x55555555)
    return v


def _compact1by1(v):
    """Inverse of _part1by1: take every other bit and pack."""
    v = v & jnp.uint32(0x55555555)
    v = (v | (v >> 1)) & jnp.uint32(0x33333333)
    v = (v | (v >> 2)) & jnp.uint32(0x0F0F0F0F)
    v = (v | (v >> 4)) & jnp.uint32(0x00FF00FF)
    v = (v | (v >> 8)) & jnp.uint32(0x0000FFFF)
    return v


def morton_encode(x, y):
    """(x, y) pixel coords -> Morton index (camera.h:66-75 semantics)."""
    x = jnp.asarray(x).astype(jnp.uint32)
    y = jnp.asarray(y).astype(jnp.uint32)
    return (_part1by1(x) | (_part1by1(y) << 1)).astype(jnp.uint32)


def morton_decode(index):
    """Morton index -> (x, y) pixel coords (camera.h:57-65 semantics)."""
    index = jnp.asarray(index).astype(jnp.uint32)
    return _compact1by1(index), _compact1by1(index >> 1)


def scanline_decode(index, width):
    index = jnp.asarray(index)
    return index % width, index // width


def scanline_encode(x, y, width):
    return y * width + x


def morton_to_scanline_perm(width, height):
    """Permutation p such that image_scanline[y*W+x] = image_morton[p[y*W+x]].

    Used when finalizing a Morton-ordered accumulation buffer into a
    row-major image (the reference does this pixel-by-pixel in its PPM
    writer, kernel.cu:766-777).
    """
    ys, xs = jnp.mgrid[0:height, 0:width]
    return morton_encode(xs.reshape(-1), ys.reshape(-1))
