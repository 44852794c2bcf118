#!/usr/bin/env python
"""Isolate the w64 chw wedge: compile each suspect unit of the w64
channels-major forward separately with staged prints, so the hanging unit
is identified by the last line printed.  SIGALRM can't interrupt a blocked
C++ compile, so each unit runs in a killable child.

    python scripts/diag_chw_w64.py             # orchestrator (bounded)
    python scripts/diag_chw_w64.py --stage blk:enc_0   # one unit
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# chw-fusable ConvBlock shapes (cin, cmid, cout, h, wp) the w64 net at a
# 64x128 frame produces (entry = [N,16,32,256]; use128=True gate)
BLOCKS = {
    "enc_0": (16, 64, 64, 32, 256),
    "enc_1": (64, 128, 128, 16, 256),
    "dec_2": (128, 128, 64, 16, 256),
    "dec_final": (64, 64, 64, 32, 256),
}
FULLS = {  # full chw_forward: net widths + frame
    "w16_full": ((16, 32, 128, 256), 64, 128, False),
    "w64_full": ((64, 128, 512, 1024), 64, 128, False),
    "w64_full_int8": ((64, 128, 512, 1024), 64, 128, True),
}


def run_block(name: str) -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from pcss_unet_tpu.ops.pallas.convblock import fused_conv_block_chw

    cin, cmid, cout, h, wp = BLOCKS[name]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, cin, h, wp)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((9, cmid, cin)).astype(
        np.float32)) * 0.1
    b1 = jnp.zeros((cmid, 1), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((cout, cmid)).astype(
        np.float32)) * 0.1
    b2 = jnp.zeros((cout, 1), jnp.float32)
    # Pass weights as jit ARGUMENTS, never closures: a closed-over device
    # array gets embedded as an MLIR constant at lower() time, which calls
    # `array._value` — a device→host fetch through the axon tunnel that
    # took >300 s for enc_1's 295 KB weight and looked exactly like a
    # Mosaic compile wedge (root-caused round 4 via faulthandler: the
    # "hang" stack was mlir.ir_constant → array._value).
    print(f"[{name}] tracing...", flush=True)
    fn = jax.jit(lambda xx, a1, c1, a2, c2: fused_conv_block_chw(
        xx, a1, c1, a2, c2, stack_taps=True))
    lowered = fn.lower(x, w1, b1, w2, b2)
    print(f"[{name}] lowered; compiling...", flush=True)
    compiled = lowered.compile()
    print(f"[{name}] compiled; running...", flush=True)
    out = compiled(x, w1, b1, w2, b2)
    out.block_until_ready()
    print(f"[{name}] OK out={out.shape}", flush=True)


def run_full(name: str) -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from pcss_unet_tpu.infer.chw_engine import chw_forward
    from pcss_unet_tpu.models import UNet
    from pcss_unet_tpu.models.fold_bn import fold_batchnorm

    widths, h, w, int8 = FULLS[name]
    model = UNet(encoder_widths=widths, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    v = fold_batchnorm(dict(model.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, 64, 64, 4), jnp.float32), False)))
    os.environ["PCSS_CONVBLOCK_TAPS"] = "stack"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, h, w, 4)).astype(np.float32))
    print(f"[{name}] tracing...", flush=True)
    # Variables passed as a jit ARGUMENT (see run_block's note): closing
    # over device params embeds them as constants and stalls lower() on a
    # tunnel device→host fetch of the whole parameter set.
    vv = {"params": v["params"], "batch_stats": v["batch_stats"]}
    fn = jax.jit(lambda vvv, xx: chw_forward(vvv, xx, int8=int8))
    lowered = fn.lower(vv, x)
    print(f"[{name}] lowered; compiling...", flush=True)
    compiled = lowered.compile()
    print(f"[{name}] compiled; running...", flush=True)
    out = compiled(vv, x)
    out.block_until_ready()
    print(f"[{name}] OK out={out.shape}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="")
    ap.add_argument("--timeout", type=int, default=240)
    args = ap.parse_args()
    if args.stage:
        kind, _, name = args.stage.partition(":")
        (run_block if kind == "blk" else run_full)(name)
        return
    stages = [f"blk:{n}" for n in BLOCKS] + [f"full:{n}" for n in FULLS]
    for s in stages:
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--stage", s],
                capture_output=True, text=True, timeout=args.timeout)
            tail = (p.stdout or "").strip().splitlines()
            print(f"{s}: exit {p.returncode}; "
                  f"last: {tail[-1] if tail else '(no output)'}", flush=True)
            if p.returncode != 0:
                print((p.stderr or "")[-400:], flush=True)
        except subprocess.TimeoutExpired as e:
            tail = (e.stdout or b"")
            if isinstance(tail, bytes):
                tail = tail.decode(errors="replace")
            tail = (tail or "").strip().splitlines()
            print(f"{s}: TIMEOUT {args.timeout}s; progress: "
                  f"{tail[-1] if tail else '(none)'}", flush=True)


if __name__ == "__main__":
    main()
