"""Model inspection CLI — the reference's debug dump (inference.py:285-297
model-info print) + visualize.py graph rendering + the paper's per-layer
timing analysis (paper.md:139-147), all runnable:

    python -m pcss_unet_tpu.cli.inspect --config config.ini \
        [--hlo out.hlo] [--dot graph.dot] [--latency] [--memory]
"""

import argparse

from pcss_unet_tpu.config import load_config
from pcss_unet_tpu.utils.logging import setup_logger


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Inspect the configured model")
    p.add_argument("--config", default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--hlo", default=None, help="write optimized HLO here")
    p.add_argument("--dot", default=None, help="write jaxpr DOT graph here")
    p.add_argument("--latency", action="store_true",
                   help="per-block latency report")
    p.add_argument("--memory", action="store_true",
                   help="HBM estimate for training at config batch size")
    args = p.parse_args(argv)
    setup_logger()

    import jax
    import jax.numpy as jnp

    from pcss_unet_tpu.models import unet_from_config
    from pcss_unet_tpu.utils.memory import estimate_memory_usage, param_count
    from pcss_unet_tpu.utils.profiling import layer_latency_report
    from pcss_unet_tpu.utils.visualize import jaxpr_dot, optimized_hlo_text

    cfg = load_config(args.config)
    h = args.height or cfg.image_height
    w = args.width or cfg.image_width
    model = unet_from_config(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, cfg.input_channels), jnp.float32)
    variables = model.init({"params": key, "dropout": key}, x, True)
    n = param_count(variables["params"])
    print(f"model: depth={cfg.model_depth} widths={model.encoder_widths}")
    print(f"parameters: {n:,} ({n * 4 / 2**20:.1f} MB fp32, "
          f"{n * 2 / 2**20:.1f} MB bf16)")
    print(f"configured frame: {w}x{h}  compute dtype: {cfg.compute_dtype}")

    if args.memory:
        est = estimate_memory_usage(n, cfg.batch_size, h, w,
                                    optimizer=cfg.optimizer_type)
        for k, v in est.items():
            print(f"  HBM {k}: {v / 2**30:.2f} GiB")

    def fwd(v, xx):
        return model.apply(v, xx, False)

    frame = jnp.zeros((1, h - h % 16, w - w % 16, cfg.input_channels),
                      jnp.float32)
    if args.hlo:
        with open(args.hlo, "w") as f:
            f.write(optimized_hlo_text(fwd, variables, frame))
        print(f"wrote optimized HLO to {args.hlo}")
    if args.dot:
        with open(args.dot, "w") as f:
            f.write(jaxpr_dot(fwd, variables, frame))
        print(f"wrote jaxpr DOT graph to {args.dot}")
    if args.latency:
        report = layer_latency_report(model, variables,
                                      (1, h - h % 16, w - w % 16,
                                       cfg.input_channels))
        for row in report:
            extra = (f"  flops={row['flops']:.3g}"
                     if row.get("flops") else "")
            print(f"  {row['stage']:<12} {row['seconds'] * 1e3:8.2f} ms"
                  f"{extra}")


if __name__ == "__main__":
    main()
