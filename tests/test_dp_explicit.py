"""Explicit shard_map DP step ≡ automatic jit SPMD step — the two
formulations of data parallelism must agree numerically (regression net for
partitioner behavior)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from pcss_unet_tpu.config import Config
from pcss_unet_tpu.losses import LossBundle, PerceptualLoss
from pcss_unet_tpu.models import UNet
from pcss_unet_tpu.parallel.dp import build_explicit_dp_train_step
from pcss_unet_tpu.parallel.mesh import batch_sharding, make_mesh, replicate_sharding
from pcss_unet_tpu.train import build_train_step, create_train_state


def test_explicit_dp_matches_auto(cpus):
    cfg = Config(batch_size=8, num_epochs=2, warmup_epochs=1,
                 dropout_rate=0.0)
    bundle = LossBundle(perceptual=PerceptualLoss(None, taps=(2,),
                                                  tap_weights=(1.0,)))
    means = np.zeros(4, np.float32)
    stds = np.ones(4, np.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 32, 32, 4)).astype(np.float32)
    y = rng.random((8, 32, 32, 1)).astype(np.float32)
    key = jax.random.PRNGKey(7)

    # auto path (axis-name-free model)
    model_auto = UNet(encoder_widths=(8, 16), dtype=jnp.float32,
                      dropout_rate=0.0)
    state_auto = create_train_state(model_auto, cfg, 4, (8, 32, 32, 4))
    auto_step = jax.jit(build_train_step(cfg, bundle, means, stds, 4))
    s_a, m_a = auto_step(state_auto, jnp.asarray(x), jnp.asarray(y), key)

    # explicit path (bn_axis_name='data' model, same params)
    mesh = Mesh(np.array(cpus[:4]).reshape(4), ("data",))
    model_exp = UNet(encoder_widths=(8, 16), dtype=jnp.float32,
                     dropout_rate=0.0, bn_axis_name="data")
    state_exp = create_train_state(model_exp, cfg, 4, (8, 32, 32, 4))
    state_exp = state_exp.replace(params=state_auto.params,
                                  batch_stats=state_auto.batch_stats,
                                  opt_state=state_auto.opt_state)
    exp_step = build_explicit_dp_train_step(cfg, bundle, means, stds, 4,
                                            mesh, model_exp)
    xs = jax.device_put(x, batch_sharding_1d(mesh))
    ys = jax.device_put(y, batch_sharding_1d(mesh))
    se = jax.device_put(state_exp, replicate_sharding(mesh))
    s_e, m_e = exp_step(se, xs, ys, jax.device_put(key, replicate_sharding(mesh)))

    assert float(m_e["total_loss"]) == pytest.approx(float(m_a["total_loss"]),
                                                     rel=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(s_a.params)),
                    jax.tree.leaves(jax.device_get(s_e.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(s_a.batch_stats)),
                    jax.tree.leaves(jax.device_get(s_e.batch_stats))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def batch_sharding_1d(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P("data"))


def test_zero1_matches_replicated_explicit(cpus):
    """ZeRO-1 sharded-optimizer step ≡ replicated explicit DP step: the
    moment partition is an HBM layout, not a numerics change.  Also pins
    that each device's optimizer chunk is 1/N of the flattened params."""
    from pcss_unet_tpu.parallel.dp import (
        Zero1State, build_zero1_dp_train_step, create_zero1_state,
    )

    cfg = Config(batch_size=8, num_epochs=2, warmup_epochs=1,
                 dropout_rate=0.0)
    bundle = LossBundle(perceptual=PerceptualLoss(None, taps=(2,),
                                                  tap_weights=(1.0,)))
    means = np.zeros(4, np.float32)
    stds = np.ones(4, np.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 32, 32, 4)).astype(np.float32)
    y = rng.random((8, 32, 32, 1)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    mesh = Mesh(np.array(cpus[:4]).reshape(4), ("data",))
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32,
                 dropout_rate=0.0, bn_axis_name="data")

    # replicated explicit baseline
    state_rep = create_train_state(model, cfg, 4, (8, 32, 32, 4))
    rep_step = build_explicit_dp_train_step(cfg, bundle, means, stds, 4,
                                            mesh, model)
    xs = jax.device_put(x, batch_sharding_1d(mesh))
    ys = jax.device_put(y, batch_sharding_1d(mesh))
    krep = jax.device_put(key, replicate_sharding(mesh))
    s_rep = jax.device_put(state_rep, replicate_sharding(mesh))

    # zero-1 path, same params
    z = create_zero1_state(model, cfg, 4, (8, 32, 32, 4), mesh)
    assert isinstance(z, Zero1State)
    n_flat = z.n_flat
    chunk = -(-n_flat // 4)
    # mu/nu (adam moments) are globally [4*chunk] = params padded to 4 chunks
    big_leaves = [l for l in jax.tree.leaves(z.opt_state)
                  if getattr(l, "ndim", 0) == 1]
    assert big_leaves and all(l.shape == (4 * chunk,) for l in big_leaves)
    # z's params/batch_stats are bit-identical to state_rep's (same model,
    # same cfg.seed init) but DISTINCT buffers — donation in one step must
    # not delete the other state's arrays (device_put of the same source
    # with the same sharding would alias).
    z = z.replace(params=jax.device_put(z.params, replicate_sharding(mesh)),
                  batch_stats=jax.device_put(z.batch_stats,
                                             replicate_sharding(mesh)))
    z_step = build_zero1_dp_train_step(cfg, bundle, means, stds, 4, mesh,
                                       model, z)

    for i in range(3):   # a few steps so the moments actually matter
        k = jax.random.fold_in(krep, i)
        s_rep, m_rep = rep_step(s_rep, xs, ys, k)
        z, m_z = z_step(z, xs, ys, k)

    assert float(m_z["total_loss"]) == pytest.approx(
        float(m_rep["total_loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(s_rep.params)),
                    jax.tree.leaves(jax.device_get(z.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_explicit_dp_group_norm_model_runs(cpus):
    """Non-BN models have no batch_stats collection to mutate; the step
    must keep the empty stats tree instead of KeyError'ing at trace."""
    cfg = Config(batch_size=4, num_epochs=2, warmup_epochs=1,
                 dropout_rate=0.0, normalization="group_norm")
    bundle = LossBundle(perceptual=PerceptualLoss(None, taps=(2,),
                                                  tap_weights=(1.0,)))
    mesh = Mesh(np.array(cpus[:4]).reshape(4), ("data",))
    model = UNet(encoder_widths=(16, 32), dtype=jnp.float32,
                 dropout_rate=0.0, normalization="group_norm")
    state = create_train_state(model, cfg, 4, (4, 32, 32, 4))
    step = build_explicit_dp_train_step(cfg, bundle,
                                        np.zeros(4, np.float32),
                                        np.ones(4, np.float32), 4,
                                        mesh, model)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((4, 32, 32, 4)).astype(np.float32),
                       batch_sharding_1d(mesh))
    y = jax.device_put(rng.random((4, 32, 32, 1)).astype(np.float32),
                       batch_sharding_1d(mesh))
    s2, m = step(jax.device_put(state, replicate_sharding(mesh)), x, y,
                 jax.device_put(jax.random.PRNGKey(0),
                                replicate_sharding(mesh)))
    assert np.isfinite(float(m["total_loss"]))
    assert int(jax.device_get(s2.step)) == 1


def test_explicit_dp_maintains_ema(cpus):
    """ema_decay > 0 updates state.ema_params in the explicit step too
    (previously it silently checkpointed the init-valued EMA)."""
    d = 0.9
    cfg = Config(batch_size=4, num_epochs=2, warmup_epochs=1,
                 dropout_rate=0.0, ema_decay=d)
    bundle = LossBundle(perceptual=PerceptualLoss(None, taps=(2,),
                                                  tap_weights=(1.0,)))
    mesh = Mesh(np.array(cpus[:4]).reshape(4), ("data",))
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32,
                 dropout_rate=0.0, bn_axis_name="data")
    state = create_train_state(model, cfg, 4, (4, 32, 32, 4))
    p0 = jax.device_get(state.params)
    step = build_explicit_dp_train_step(cfg, bundle,
                                        np.zeros(4, np.float32),
                                        np.ones(4, np.float32), 4,
                                        mesh, model)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((4, 32, 32, 4)).astype(np.float32),
                       batch_sharding_1d(mesh))
    y = jax.device_put(rng.random((4, 32, 32, 1)).astype(np.float32),
                       batch_sharding_1d(mesh))
    s2, _ = step(jax.device_put(state, replicate_sharding(mesh)), x, y,
                 jax.device_put(jax.random.PRNGKey(0),
                                replicate_sharding(mesh)))
    jax.tree.map(
        lambda e, a, b: np.testing.assert_allclose(
            e, d * a + (1 - d) * b, rtol=1e-5, atol=1e-7),
        jax.device_get(s2.ema_params), p0, jax.device_get(s2.params))


def test_explicit_builders_reject_unsupported(cpus):
    """Features only the auto-SPMD step composes fail loudly here instead
    of silently training something else."""
    from pcss_unet_tpu.parallel.dp import build_zero1_dp_train_step

    bundle = LossBundle(perceptual=PerceptualLoss(None, taps=(2,),
                                                  tap_weights=(1.0,)))
    mesh = Mesh(np.array(cpus[:4]).reshape(4), ("data",))
    model = UNet(encoder_widths=(8, 16), dtype=jnp.float32,
                 bn_axis_name="data")
    args = (bundle, np.zeros(4, np.float32), np.ones(4, np.float32), 4,
            mesh, model)
    with pytest.raises(ValueError, match="standard loss"):
        build_explicit_dp_train_step(
            Config(loss_type="perturb"), *args)
    with pytest.raises(ValueError, match="accumulation"):
        build_explicit_dp_train_step(
            Config(grad_accum_steps=2), *args)
    with pytest.raises(ValueError, match="EMA"):
        build_zero1_dp_train_step(
            Config(ema_decay=0.9), *args, state=None)
