"""Channel-statistics CLI (reference calculate_dataset_stats.py role;
its ``--dataset_path`` flag name is preserved,
calculate_dataset_stats.py:111-115)."""

import argparse

from pcss_unet_tpu.data.stats import compute_channel_stats
from pcss_unet_tpu.utils.logging import setup_logger


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Per-channel mean/std of a "
                                            "packed dataset")
    p.add_argument("--dataset_path", required=True,
                   help="directory containing {split}_inputs.npy")
    p.add_argument("--split", default="train")
    p.add_argument("--chunk", type=int, default=64)
    args = p.parse_args(argv)
    setup_logger()
    stats = compute_channel_stats(args.dataset_path, args.split,
                                  chunk=args.chunk)
    for i, (m, s) in enumerate(zip(stats["means"], stats["stds"])):
        print(f"channel {i}: mean {m:+.6f}  std {s:.6f}")


if __name__ == "__main__":
    main()
