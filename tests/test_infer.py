"""Inference layer tests: engine padding/scrub semantics, spatial-sharded
full frames, halo-tiled decomposition parity, consistency harness."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pcss_unet_tpu.infer import InferenceEngine, infer_sharded, infer_tiled
from pcss_unet_tpu.infer.tiled import plan_tiles
from pcss_unet_tpu.models import UNet
from pcss_unet_tpu.parallel import make_mesh
from pcss_unet_tpu.parity import compare_outputs, validate_train_infer_consistency


@pytest.fixture(scope="module")
def model_and_vars():
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32, dropout_rate=0.0)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros((1, 32, 32, 4)), True)
    return model, {"params": variables["params"],
                   "batch_stats": variables["batch_stats"]}


def test_engine_odd_sizes(model_and_vars, rng):
    """Arbitrary frame sizes: pad-to-16 then crop (inference.py:154-163)."""
    model, variables = model_and_vars
    engine = InferenceEngine(model, variables, dtype=jnp.float32)
    frame = rng.standard_normal((37, 51, 4)).astype(np.float32)
    out = engine(frame)
    assert out.shape == (37, 51, 1)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_engine_scrubs_nan(model_and_vars, rng):
    model, variables = model_and_vars
    engine = InferenceEngine(model, variables, dtype=jnp.float32)
    frame = rng.standard_normal((32, 32, 4)).astype(np.float32)
    frame[0, 0, 0] = np.nan
    frame[1, 1, 1] = np.inf
    out = engine(frame)
    assert np.isfinite(out).all()


def test_engine_standardization(model_and_vars, rng):
    model, variables = model_and_vars
    means = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    stds = np.array([0.5, 1.0, 1.5, 2.0], np.float32)
    engine = InferenceEngine(model, variables, means=means, stds=stds,
                             dtype=jnp.float32)
    plain = InferenceEngine(model, variables, dtype=jnp.float32)
    frame = rng.standard_normal((32, 32, 4)).astype(np.float32)
    standardized_input = (frame - means) / (stds + 1e-8)
    np.testing.assert_allclose(engine(frame), plain(standardized_input),
                               rtol=1e-5, atol=1e-6)


def test_sharded_matches_plain(model_and_vars, cpus, rng):
    model, variables = model_and_vars
    engine = InferenceEngine(model, variables, dtype=jnp.float32)
    frames = rng.standard_normal((2, 64, 64, 4)).astype(np.float32)
    plain = engine(frames)
    mesh = make_mesh(2, 4, devices=cpus)
    sharded = infer_sharded(engine, frames, mesh)
    np.testing.assert_allclose(sharded, plain, rtol=1e-5, atol=1e-6)


def test_plan_tiles_covers():
    starts = plan_tiles(100, 40, 8)
    covered = np.zeros(100, bool)
    for s in starts:
        covered[s:s + 40] = True
    assert covered.all()
    assert plan_tiles(30, 40, 8) == [0]


def test_tiled_close_to_full(model_and_vars, rng):
    """Halo-tiled output must be visually identical to the full-frame pass
    (interior deviations only from receptive-field truncation at halos)."""
    model, variables = model_and_vars
    engine = InferenceEngine(model, variables, dtype=jnp.float32,
                             pad_multiple=16)
    frame = rng.standard_normal((96, 128, 4)).astype(np.float32)
    full = engine(frame)
    tiled = infer_tiled(engine, frame, tile=64, halo=16)
    assert tiled.shape == full.shape
    res = compare_outputs(tiled, full, psnr_pass=35.0)
    assert res["verdict"] in ("exact", "pass"), res


def test_infer_tiled_input_guards(model_and_vars, rng):
    """Misconfigurations fail loudly: tile <= 2*halo previously crashed in
    range() or — with a negative stride — silently planned ONLY the last
    tile (everything else blending to zero); an unaligned tile came back
    resized from run_padded and broke the blend shapes."""
    model, variables = model_and_vars
    engine = InferenceEngine(model, variables, dtype=jnp.float32)
    frame = rng.standard_normal((96, 100, 4)).astype(np.float32)
    with pytest.raises(ValueError, match="2\\*halo"):
        infer_tiled(engine, frame, tile=64, halo=32)
    with pytest.raises(ValueError, match="2\\*halo"):
        infer_tiled(engine, frame, tile=64, halo=40)
    with pytest.raises(ValueError, match="pad_multiple"):
        infer_tiled(engine, frame, tile=40, halo=4)
    with pytest.raises(ValueError, match="blend"):
        infer_tiled(engine, frame, tile=64, halo=8, blend="hots")


def test_infer_tiled_chunked_matches_unchunked(model_and_vars, rng):
    """tile_batch bounds peak memory without changing the result: chunked
    forwards (incl. a padded final chunk) equal the all-at-once batch."""
    model, variables = model_and_vars
    engine = InferenceEngine(model, variables, dtype=jnp.float32)
    frame = rng.standard_normal((96, 160, 4)).astype(np.float32)
    all_at_once = infer_tiled(engine, frame, tile=64, halo=8, tile_batch=0)
    chunked = infer_tiled(engine, frame, tile=64, halo=8, tile_batch=2)
    np.testing.assert_allclose(chunked, all_at_once, rtol=0, atol=2e-6)


def test_tiled_last_tile_over_overlap(model_and_vars, rng):
    """Non-divisible frames: the right-aligned last tile overlaps its
    neighbour by MORE than 2·halo (tiled.py plan_tiles right-alignment) —
    feather weights no longer sum to 1 there and the norm division must
    renormalize.  Assert parity specifically on the seam strip, both blend
    paths (VERDICT r1 next-step #10)."""
    model, variables = model_and_vars
    engine = InferenceEngine(model, variables, dtype=jnp.float32,
                             pad_multiple=16)
    # W=100, tile=64, halo=8: xs=[0, 36] → overlap 28 > 2·halo=16
    frame = rng.standard_normal((96, 100, 4)).astype(np.float32)
    assert plan_tiles(100, 64, 16) == [0, 36]
    full = engine(frame)
    for blend in ("host", "auto"):
        tiled = infer_tiled(engine, frame, tile=64, halo=8, blend=blend)
        assert tiled.shape == full.shape
        # the contested strip: the [36, 64) x-range both tiles cover
        seam_t = tiled[:, 30:70]
        seam_f = full[:, 30:70]
        res = compare_outputs(seam_t, seam_f, psnr_pass=35.0)
        assert res["verdict"] in ("exact", "pass"), (blend, res)
    # Weights renormalize exactly where the last tile overlaps beyond
    # 2·halo: blending constant TILE OUTPUTS must reproduce the constant
    # everywhere (any weight-sum defect would ripple).  Tested on the blend
    # machinery directly — through the model, receptive-field truncation at
    # tile edges exceeds the 8-px halo and legitimately perturbs the seam.
    from pcss_unet_tpu.infer.tiled import _feather_weights
    from pcss_unet_tpu.ops.pallas.blend import blend_tiles_device

    tile, halo = 64, 8
    fh, fw = 96, 100
    ys, xs = plan_tiles(fh, tile, 2 * halo), plan_tiles(fw, tile, 2 * halo)
    assert xs == [0, 36]  # overlap 28 > 2·halo
    offsets = np.array([(y, x) for y in ys for x in xs], np.int32)
    outs = np.full((len(offsets), tile, tile, 1), 0.25, np.float32)
    w1d = _feather_weights(tile, halo)
    w2d = np.outer(w1d, w1d).astype(np.float32)[..., None]
    acc = np.zeros((fh, fw, 1), np.float32)
    norm = np.zeros((fh, fw, 1), np.float32)
    for t, (y, x) in enumerate(offsets):
        acc[y:y + tile, x:x + tile] += outs[t] * w2d
        norm[y:y + tile, x:x + tile] += w2d
    host = acc / np.maximum(norm, 1e-8)
    np.testing.assert_allclose(host, 0.25, rtol=0, atol=1e-6)
    dev = np.asarray(blend_tiles_device(jnp.asarray(outs), jnp.asarray(w2d),
                                        jnp.asarray(offsets), (fh, fw)))
    np.testing.assert_allclose(dev, 0.25, rtol=0, atol=1e-6)


def test_train_infer_consistency(model_and_vars, rng):
    """validate_consistency.py role: both pathways agree (MSE<1e-6 or
    PSNR>50, validate_consistency.py:186-191)."""
    model, variables = model_and_vars
    frame = rng.standard_normal((48, 64, 4)).astype(np.float32)
    res = validate_train_infer_consistency(model, variables, frame)
    assert res["verdict"] in ("exact", "pass"), (res["mse"], res["psnr"])


def test_train_infer_consistency_deployment_posture(model_and_vars, rng):
    """The harness gates the serving posture too: folded-BN bf16 inference
    pathway vs the fp32 training pathway still clears the reference's
    PSNR>50 bar (cli.validate --fold_bn --bf16)."""
    model, variables = model_and_vars
    frame = rng.standard_normal((48, 64, 4)).astype(np.float32)
    res = validate_train_infer_consistency(model, variables, frame,
                                           fold_bn=True,
                                           dtype=jnp.bfloat16)
    assert res["verdict"] in ("exact", "pass"), (res["mse"], res["psnr"])


def test_fold_bn_exact(model_and_vars, rng):
    """BN folding is mathematically exact at inference (fold_bn.py)."""
    model, variables = model_and_vars
    frame = rng.standard_normal((48, 48, 4)).astype(np.float32)
    plain = InferenceEngine(model, variables, dtype=jnp.float32)(frame)
    folded = InferenceEngine(model, variables, dtype=jnp.float32,
                             fold_bn=True)(frame)
    res = compare_outputs(folded, plain)
    assert res["verdict"] == "exact", res


def test_fold_bn_u8_render(model_and_vars, rng):
    model, variables = model_and_vars
    engine = InferenceEngine(model, variables, dtype=jnp.float32,
                             fold_bn=True)
    frames = jnp.asarray(rng.standard_normal((1, 32, 32, 4)).astype(np.float32))
    u8 = np.asarray(engine.render_u8(frames))
    assert u8.dtype == np.uint8 and u8.shape == (1, 32, 32, 1)
    ref = np.round(np.clip(np.asarray(engine.run_padded(frames)), 0, 1) * 255)
    np.testing.assert_array_equal(u8, ref.astype(np.uint8))


def test_bf16_engine_runs(model_and_vars, rng):
    model, variables = model_and_vars
    engine = InferenceEngine(model, variables, dtype=jnp.bfloat16)
    frame = rng.standard_normal((32, 32, 4)).astype(np.float32)
    out32 = InferenceEngine(model, variables, dtype=jnp.float32)(frame)
    out16 = engine(frame)
    res = compare_outputs(out16, out32, psnr_pass=30.0)
    assert res["verdict"] in ("exact", "pass"), res
