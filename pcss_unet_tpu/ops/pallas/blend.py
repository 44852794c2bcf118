"""Device-side feathered tile blending for halo-tiled inference.

The decomposition side of tiled inference is a static slice pattern; the
blend side is an overlapping scatter-accumulate.  Overlapping writes across
Pallas grid steps have no defined read-back semantics for output blocks, so
the accumulation itself is expressed as a ``lax.scan`` of
``dynamic_update_slice`` adds — fully on-device, static shapes, one compiled
program — rather than a host loop (infer/tiled.py's numpy fallback) or an
unsound Pallas scatter.  The per-tile weighted multiply (the bandwidth-bound
elementwise part) still fuses into the scan body.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_hw",))
def blend_tiles_device(tiles: jax.Array, weights: jax.Array,
                       offsets: jax.Array, out_hw: tuple[int, int],
                       norm: jax.Array | None = None) -> jax.Array:
    """tiles [T, t, t, 1] · weights [t, t, 1] scattered at offsets [T, 2]
    (y, x) into a [H, W, 1] frame, normalized by the accumulated weights.

    ``norm``: optional precomputed [H, W, 1] weight field (it depends only
    on host-known geometry — infer_tiled builds it once); when omitted it
    accumulates in the scan, doubling the slice/update traffic."""
    h, w = out_hw
    t = tiles.shape[1]
    acc0 = jnp.zeros((h, w, 1), jnp.float32)
    wtile = weights.astype(jnp.float32)
    build_norm = norm is None

    def body(carry, tile_and_off):
        acc, nrm = carry
        tile, off = tile_and_off
        y, x = off[0], off[1]
        weighted = tile.astype(jnp.float32) * wtile
        patch = jax.lax.dynamic_slice(acc, (y, x, 0), (t, t, 1))
        acc = jax.lax.dynamic_update_slice(acc, patch + weighted, (y, x, 0))
        if build_norm:
            npatch = jax.lax.dynamic_slice(nrm, (y, x, 0), (t, t, 1))
            nrm = jax.lax.dynamic_update_slice(nrm, npatch + wtile,
                                               (y, x, 0))
        return (acc, nrm), None

    norm0 = (jnp.zeros((h, w, 1), jnp.float32) if build_norm
             else norm.astype(jnp.float32))
    (acc, norm), _ = jax.lax.scan(body, (acc0, norm0), (tiles, offsets))
    return acc / jnp.maximum(norm, 1e-8)
