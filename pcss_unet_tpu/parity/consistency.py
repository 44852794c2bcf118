"""Output-consistency and parity harness.

Plays the role of the reference's validate_consistency.py: run the same
checkpoint through two pathways and verify they agree.  Verdict thresholds
match validate_consistency.py:186-191: MSE < 1e-6 → "exact", PSNR > 50 dB →
"pass", else "fail".

Pathways compared here:
- training-visualization pathway: eval-mode apply exactly as the train loop
  logs images (validate_consistency.py:40-59's role)
- inference pathway: the InferenceEngine with padding/scrub/clip
  (validate_consistency.py:61-70's role)

``compare_outputs`` is also the primitive used for torch-reference PSNR
parity (tests/test_model_parity.py) and bf16-vs-fp32 checks.
"""

from __future__ import annotations

import numpy as np


def compare_outputs(a: np.ndarray, b: np.ndarray,
                    mse_exact: float = 1e-6, psnr_pass: float = 50.0) -> dict:
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    mse = float(np.mean((a - b) ** 2))
    psnr = float(10.0 * np.log10(1.0 / mse)) if mse > 0 else float("inf")
    verdict = "exact" if mse < mse_exact else ("pass" if psnr > psnr_pass
                                               else "fail")
    return {"mse": mse, "psnr": psnr, "max_abs": float(np.max(np.abs(a - b))),
            "verdict": verdict}


def validate_train_infer_consistency(model, variables: dict,
                                     frame: np.ndarray, *, means=None,
                                     stds=None, pad_multiple: int = 16,
                                     **engine_kwargs) -> dict:
    """Run ``frame`` [H, W, 4] through the training-visualization pathway and
    the inference pathway; → comparison dict + both outputs.

    ``engine_kwargs`` (e.g. ``fold_bn=True``, ``quantize='int8'``,
    ``dtype=jnp.bfloat16``) select the inference pathway's deployment
    posture, so the harness can gate the exact serving configuration
    against the training pathway (int8/bf16 postures won't be EXACT; the
    reference's PSNR>50 threshold is the pass bar,
    validate_consistency.py:186-191)."""
    import jax.numpy as jnp

    from pcss_unet_tpu.infer.frame import InferenceEngine, pad_to_multiple
    from pcss_unet_tpu.train.step import standardize

    frame = np.asarray(frame, np.float32)

    # pathway A: as the train loop's validation logs it (fp32, no scrub)
    x = frame[None]
    padded, (h, w) = pad_to_multiple(x, pad_multiple)
    xs = jnp.asarray(padded)
    if means is not None:
        xs = standardize(xs, jnp.asarray(means, jnp.float32),
                         jnp.asarray(stds, jnp.float32))
    out_a = np.asarray(model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        xs, False))[:, :h, :w, :][0]

    # pathway B: the inference engine (fp32 unless the posture overrides)
    engine_kwargs.setdefault("dtype", jnp.float32)
    engine = InferenceEngine(model, variables, means=means, stds=stds,
                             pad_multiple=pad_multiple, **engine_kwargs)
    out_b = engine(frame)

    result = compare_outputs(out_a, out_b)
    result["train_pathway"] = out_a
    result["infer_pathway"] = out_b
    return result
