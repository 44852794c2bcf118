"""Multi-chip sharding tests on the 8-virtual-device CPU mesh — the
fake-backend pattern SURVEY.md §4 calls for (the reference has no
parallelism at all, §2.12).

Checks that the UNCHANGED train/eval steps jit over a (data × spatial) mesh
with XLA inserting gradient psums, sync-BN reductions, and conv halo
exchanges — and that sharded results numerically match single-device."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pcss_unet_tpu.config import Config
from pcss_unet_tpu.losses import LossBundle, PerceptualLoss
from pcss_unet_tpu.models import UNet
from pcss_unet_tpu.parallel import batch_sharding, make_mesh, replicate_sharding
from pcss_unet_tpu.train import build_eval_step, build_train_step, create_train_state


def _setup(cfg):
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32)
    state = create_train_state(model, cfg, 4, (8, 32, 32, 4))
    bundle = LossBundle(perceptual=PerceptualLoss(None, taps=(2,),
                                                  tap_weights=(1.0,)))
    means = np.zeros(4, np.float32)
    stds = np.ones(4, np.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 32, 32, 4)).astype(np.float32)
    y = rng.random((8, 32, 32, 1)).astype(np.float32)
    return model, state, bundle, means, stds, x, y


def test_make_mesh_shapes(cpus):
    mesh = make_mesh(-1, 2, devices=cpus)
    assert mesh.shape == {"data": 4, "spatial": 2}
    mesh1 = make_mesh(8, 1, devices=cpus)
    assert mesh1.shape == {"data": 8, "spatial": 1}
    with pytest.raises(ValueError):
        make_mesh(16, 1, devices=cpus)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_train_step_matches_single_device(cpus, mesh_shape):
    cfg = Config(batch_size=8, num_epochs=2, warmup_epochs=1,
                 loss_type="standard", dropout_rate=0.0)  # dropout off →
    # sharded RNG vs single-device RNG draws are identical under jit SPMD
    model, state, bundle, means, stds, x, y = _setup(cfg)
    step = build_train_step(cfg, bundle, means, stds, steps_per_epoch=4)
    key = jax.random.PRNGKey(0)

    # single device
    s1, m1 = jax.jit(step)(state, jnp.asarray(x), jnp.asarray(y), key)

    # sharded
    mesh = make_mesh(*mesh_shape, devices=cpus)
    shard = batch_sharding(mesh)
    repl = replicate_sharding(mesh)
    state_sh = jax.device_put(state, repl)
    xs = jax.device_put(x, shard)
    ys = jax.device_put(y, shard)
    s8, m8 = jax.jit(step)(state_sh, xs, ys, jax.device_put(key, repl))

    assert float(m8["total_loss"]) == pytest.approx(float(m1["total_loss"]),
                                                    rel=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.params)),
                    jax.tree.leaves(jax.device_get(s8.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    # BN batch stats must be the GLOBAL batch stats (sync-BN), not per-shard
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.batch_stats)),
                    jax.tree.leaves(jax.device_get(s8.batch_stats))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_sharded_grad_accum_matches_single_device(cpus):
    """grad_accum_steps=2 under jit SPMD on a pure-DP mesh reproduces the
    single-device accumulated update (the scan's microbatch reshape must
    stay consistent with the batch sharding)."""
    cfg = Config(batch_size=8, num_epochs=2, warmup_epochs=1,
                 loss_type="standard", dropout_rate=0.0, grad_accum_steps=2)
    model, state, bundle, means, stds, x, y = _setup(cfg)
    step = build_train_step(cfg, bundle, means, stds, steps_per_epoch=4)
    key = jax.random.PRNGKey(0)

    s1, m1 = jax.jit(step)(state, jnp.asarray(x), jnp.asarray(y), key)

    mesh = make_mesh(8, 1, devices=cpus)
    state_sh = jax.device_put(state, replicate_sharding(mesh))
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    s8, m8 = jax.jit(step)(state_sh, xs, ys,
                           jax.device_put(key, replicate_sharding(mesh)))

    assert float(m8["total_loss"]) == pytest.approx(float(m1["total_loss"]),
                                                    rel=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.params)),
                    jax.tree.leaves(jax.device_get(s8.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_sharded_eval_step(cpus):
    cfg = Config(batch_size=8, dropout_rate=0.0)
    model, state, bundle, means, stds, x, y = _setup(cfg)
    mesh = make_mesh(4, 2, devices=cpus)
    state_sh = jax.device_put(state, replicate_sharding(mesh))
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    eval_fn = jax.jit(build_eval_step(cfg, bundle, means, stds))
    terms, out = eval_fn(state_sh, xs, ys)
    ref_terms, ref_out = eval_fn(state, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-6)
    assert float(terms["total_loss"]) == pytest.approx(
        float(ref_terms["total_loss"]), rel=1e-5)


def test_spatial_only_sharding_full_frame(cpus):
    """Spatial partitioning of a single large frame across all 8 devices —
    the inference-scaling axis (SURVEY.md §2.12 SP row)."""
    cfg = Config(dropout_rate=0.0)
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32)
    state = create_train_state(model, cfg, 4, (1, 128, 128, 4))
    mesh = make_mesh(1, 8, devices=cpus)
    x = np.random.default_rng(0).standard_normal((1, 128, 128, 4)).astype(np.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "spatial")))
    state_sh = jax.device_put(state, replicate_sharding(mesh))

    def fwd(s, xx):
        return s.apply_fn({"params": s.params, "batch_stats": s.batch_stats},
                          xx, False)

    out = jax.jit(fwd)(state_sh, xs)
    ref = jax.jit(fwd)(state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Spatially-sharded inference that KEEPS the Pallas/int8 kernel posture
# (shard_map windows with global-coefficient resizes — VERDICT r2 next #3)
# ---------------------------------------------------------------------------

def _make_engine(**kw):
    from pcss_unet_tpu.infer.frame import InferenceEngine

    model = UNet(encoder_widths=(8, 16, 32), dtype=kw.pop("dtype", jnp.float32))
    x0 = jnp.zeros((1, 64, 64, 4), jnp.float32)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x0, False)
    return InferenceEngine(model, variables, means=np.zeros(4, np.float32),
                           stds=np.ones(4, np.float32), **kw)


@pytest.mark.parametrize("spatial", [2, 4, 8])
def test_halo_sharded_matches_single_device(cpus, spatial):
    """Window decomposition with global-coefficient resizes reproduces the
    single-device forward (fp32: to reduction-order noise, ≤2 ulp)."""
    from pcss_unet_tpu.infer.tiled import infer_sharded_halo

    eng = _make_engine(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((2, 256, 96, 4)).astype(np.float32)
    ref = np.asarray(eng.run_padded(jnp.asarray(frames)))
    mesh = make_mesh(8 // spatial, spatial, devices=cpus)
    out = infer_sharded_halo(eng, frames, mesh)
    np.testing.assert_allclose(out, ref, atol=5e-7, rtol=0)


def test_halo_sharded_fused_int8_bitexact(cpus):
    """The full kernel posture (folded BN + fused Pallas + int8, interpret
    mode on CPU) survives spatial sharding BIT-EXACTLY — the multi-chip
    low-latency path runs the same kernels as single-chip."""
    from pcss_unet_tpu.infer.tiled import infer_sharded_halo

    eng = _make_engine(dtype=jnp.bfloat16, use_pallas=False, fold_bn=True,
                      pallas_interpret=True, quantize="int8")
    rng = np.random.default_rng(1)
    frames = rng.standard_normal((2, 256, 96, 4)).astype(np.float32)
    ref = np.asarray(eng.run_padded(jnp.asarray(frames)))
    mesh = make_mesh(4, 2, devices=cpus)
    out = infer_sharded_halo(eng, frames, mesh)
    np.testing.assert_array_equal(out, ref)


def test_infer_sharded_dispatches_to_halo_path(cpus):
    """infer_sharded keeps kernels on when the posture has them: its output
    equals the single-device fused forward (not the plain graph's)."""
    from pcss_unet_tpu.infer.tiled import infer_sharded

    eng = _make_engine(dtype=jnp.bfloat16, use_pallas=False, fold_bn=True,
                      pallas_interpret=True)
    assert eng.model.fused_inference
    rng = np.random.default_rng(2)
    frames = rng.standard_normal((2, 128, 64, 4)).astype(np.float32)
    ref = np.asarray(eng.run_padded(jnp.asarray(frames)))
    mesh = make_mesh(4, 2, devices=cpus)
    out = infer_sharded(eng, frames, mesh)
    np.testing.assert_array_equal(out, ref)


def test_halo_sharded_odd_frame_pads(cpus):
    """Frames not divisible by the shard alignment are padded internally and
    cropped back.  The halo path pads H to a multiple of n_sp·16 (shard
    offsets must stay pooling-aligned) — more than the single-device path's
    16 — and align-corners coefficients depend on the global (padded) H, so
    the correct oracle is the single-device forward on the SAME padding."""
    from pcss_unet_tpu.infer.tiled import infer_sharded_halo

    eng = _make_engine(dtype=jnp.float32)
    rng = np.random.default_rng(3)
    frames = rng.standard_normal((1, 200, 70, 4)).astype(np.float32)
    mesh = make_mesh(4, 2, devices=cpus)
    out = infer_sharded_halo(eng, frames, mesh)
    assert out.shape == (1, 200, 70, 1)
    padded = np.pad(frames, ((0, 0), (0, 24), (0, 10), (0, 0)),
                    mode="reflect")        # same reflect pad the path applies
    ref = np.asarray(eng.run_padded(jnp.asarray(padded)))[:, :200, :70]
    np.testing.assert_allclose(out, ref, atol=5e-7, rtol=0)


def test_halo_sharded_fused_acc_shift_bitexact(cpus, monkeypatch):
    """The acc_shift tap strategy (PCSS_CONVBLOCK_TAPS) survives spatial
    sharding bit-exactly too — whichever strategy wins on hardware, the
    multi-chip path runs the same kernels as single-chip."""
    from pcss_unet_tpu.infer.tiled import infer_sharded_halo

    monkeypatch.setenv("PCSS_CONVBLOCK_TAPS", "acc_shift")
    eng = _make_engine(dtype=jnp.bfloat16, use_pallas=False, fold_bn=True,
                      pallas_interpret=True)
    rng = np.random.default_rng(2)
    frames = rng.standard_normal((1, 256, 96, 4)).astype(np.float32)
    ref = np.asarray(eng.run_padded(jnp.asarray(frames)))
    mesh = make_mesh(4, 2, devices=cpus)
    out = infer_sharded_halo(eng, frames, mesh)
    np.testing.assert_array_equal(out, ref)


def test_halo_sharded_depth5_alignment(cpus):
    """Deep models need coarser window alignment: a depth-5 net's window
    starts must be multiples of 2^5 (spatial_align) — the old fixed 16-row
    rounding put the global resize offsets at truncated rows and returned
    silently wrong pixels on shards whose start-halo was ≡16 (mod 32)."""
    from pcss_unet_tpu.infer.frame import InferenceEngine
    from pcss_unet_tpu.infer.tiled import infer_sharded_halo
    from pcss_unet_tpu.models.unet import spatial_align, spatial_halo

    model = UNet(encoder_widths=(8, 8, 16, 16, 32), dtype=jnp.float32)
    x0 = jnp.zeros((1, 64, 64, 4), jnp.float32)
    key = jax.random.PRNGKey(3)
    variables = model.init({"params": key, "dropout": key}, x0, False)
    eng = InferenceEngine(model, variables, means=np.zeros(4, np.float32),
                          stds=np.ones(4, np.float32), dtype=jnp.float32)
    assert spatial_align(model) == 32
    assert spatial_halo(model) % 32 == 0
    rng = np.random.default_rng(4)
    # H large enough that windows are PROPER subsets (ext < H) so the
    # offset math actually engages
    frames = rng.standard_normal((1, 1024, 64, 4)).astype(np.float32)
    ref = np.asarray(eng.run_padded(jnp.asarray(frames)))
    mesh = make_mesh(2, 4, devices=cpus)
    out = infer_sharded_halo(eng, frames, mesh)
    np.testing.assert_allclose(out, ref, atol=5e-7, rtol=0)
