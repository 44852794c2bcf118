"""Distillation training (paper.md:143 deployment trimming: the trimmed
student learns the trained full net's soft masks alongside the labels)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pcss_unet_tpu.config import Config
from pcss_unet_tpu.losses import LossBundle, PerceptualLoss
from pcss_unet_tpu.models import UNet
from pcss_unet_tpu.train import build_train_step, create_train_state


@pytest.fixture(scope="module")
def bundle():
    return LossBundle(perceptual=PerceptualLoss(None, taps=(2,),
                                                tap_weights=(1.0,)))


def _setup(bundle, distill_weight):
    cfg = Config(batch_size=2, num_epochs=4, warmup_epochs=1,
                 learning_rate=1e-3, loss_type="standard",
                 data_parallel=1, spatial_parallel=1,
                 distill_weight=distill_weight)
    student = UNet(encoder_widths=(8, 16), dtype=jnp.float32)
    state = create_train_state(student, cfg, steps_per_epoch=4,
                               sample_shape=(2, 16, 16, 4))
    teacher_model = UNet(encoder_widths=(16, 32), dtype=jnp.float32)
    key = jax.random.PRNGKey(7)
    t_vars = teacher_model.init({"params": key, "dropout": key},
                                jnp.zeros((1, 16, 16, 4)), True)
    teacher = (teacher_model, {"params": t_vars["params"],
                               "batch_stats": t_vars["batch_stats"]})
    means = np.zeros(4, np.float32)
    stds = np.ones(4, np.float32)
    step = jax.jit(build_train_step(cfg, bundle, means, stds, 4,
                                    teacher=teacher),
                   donate_argnums=(0,))
    return cfg, state, teacher, step


def test_distill_term_in_loss_and_metrics(bundle):
    """total = base + w·mean((out − teacher)²); metric reported; the same
    batch with w=0 must yield exactly the base total."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))
    y = jnp.asarray(rng.random((2, 16, 16, 1)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    _, state_w, _, step_w = _setup(bundle, distill_weight=0.7)
    _, metrics_w = step_w(state_w, x, y, key)
    _, state_0, _, step_0 = _setup(bundle, distill_weight=0.0)
    _, metrics_0 = step_0(state_0, x, y, key)

    d = float(metrics_w["distill_loss"])
    assert d > 0
    base_total = float(metrics_0["total_loss"])
    np.testing.assert_allclose(float(metrics_w["total_loss"]),
                               base_total + 0.7 * d, rtol=1e-5)


def test_distill_pulls_student_toward_teacher(bundle):
    """With only the distill gradient active (labels ignored via w≫1), the
    student output must move toward the teacher's soft mask."""
    cfg, state, (t_model, t_vars), step = _setup(bundle, distill_weight=50.0)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)).astype(np.float32))
    y = jnp.asarray(rng.random((2, 16, 16, 1)).astype(np.float32))
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(12):
        state, metrics = step(state, x, y, jax.random.fold_in(key, i))
        if first is None:
            first = float(metrics["distill_loss"])
    assert float(metrics["distill_loss"]) < first
    # teacher variables remain untouched constants of the step
    soft = t_model.apply(t_vars, x, False)
    assert np.isfinite(np.asarray(soft)).all()
