"""Pallas kernel tests (interpreter mode on CPU) — each kernel is pinned to
its XLA-composition reference implementation."""

import numpy as np
import pytest
import jax.numpy as jnp

from pcss_unet_tpu.ops.pallas import (
    blend_tiles_device, fused_mask_to_u8, fused_scrub_standardize,
)


def test_fused_mask_to_u8(rng):
    x = rng.random((2, 8, 32, 1)).astype(np.float32)
    x[0, 0, 0, 0] = 1.7   # out-of-range → clip
    x[0, 0, 1, 0] = -0.3
    got = np.asarray(fused_mask_to_u8(jnp.asarray(x), interpret=True))
    ref = np.round(np.clip(x, 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(got, ref)


def test_fused_scrub_standardize(rng):
    x = rng.standard_normal((2, 16, 64, 4)).astype(np.float32)
    x[0, 0, 0, 0] = np.nan
    x[0, 0, 1, 1] = np.inf
    x[1, 2, 3, 2] = -np.inf
    means = np.array([0.5, -0.5, 1.0, 0.0], np.float32)
    stds = np.array([2.0, 1.0, 0.5, 3.0], np.float32)
    got = np.asarray(fused_scrub_standardize(
        jnp.asarray(x), jnp.asarray(means), jnp.asarray(stds),
        out_dtype=jnp.float32, interpret=True))
    ref_x = np.nan_to_num(x, nan=0.0, posinf=1.0, neginf=0.0)
    ref = (ref_x - means) / (stds + 1e-8)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_fused_scrub_standardize_bf16(rng):
    x = rng.standard_normal((1, 8, 32, 4)).astype(np.float32)
    means = np.zeros(4, np.float32)
    stds = np.ones(4, np.float32)
    got = fused_scrub_standardize(jnp.asarray(x), jnp.asarray(means),
                                  jnp.asarray(stds), out_dtype=jnp.bfloat16,
                                  interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), x,
                               rtol=1e-2, atol=1e-2)


def test_blend_tiles_device_matches_host(rng):
    from pcss_unet_tpu.infer.tiled import _feather_weights, plan_tiles

    tile, halo = 16, 4
    fh, fw = 32, 48
    ys = plan_tiles(fh, tile, 2 * halo)
    xs = plan_tiles(fw, tile, 2 * halo)
    offsets = np.array([(y, x) for y in ys for x in xs], np.int32)
    tiles = rng.random((len(offsets), tile, tile, 1)).astype(np.float32)
    w2d = np.outer(_feather_weights(tile, halo),
                   _feather_weights(tile, halo)).astype(np.float32)[..., None]
    got = np.asarray(blend_tiles_device(jnp.asarray(tiles), jnp.asarray(w2d),
                                        jnp.asarray(offsets), (fh, fw)))
    acc = np.zeros((fh, fw, 1), np.float32)
    norm = np.zeros((fh, fw, 1), np.float32)
    for t, (y, x) in enumerate(offsets):
        acc[y:y + tile, x:x + tile] += tiles[t] * w2d
        norm[y:y + tile, x:x + tile] += w2d
    ref = acc / np.maximum(norm, 1e-8)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_blend_interior_weights_sum_to_one():
    from pcss_unet_tpu.infer.tiled import _feather_weights

    w = _feather_weights(32, 8)
    # adjacent tiles overlap by 2*halo = 16: rising ramp of the right tile
    # plus the falling tail of the left tile must sum to 1 across the strip
    overlap = w[:16] + w[-16:]
    np.testing.assert_allclose(overlap, np.ones(16), rtol=1e-6)
