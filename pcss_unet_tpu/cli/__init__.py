"""Command-line entry points mirroring the reference's script UX
(SURVEY.md §1 L1/L4/L5/L6 CLIs):

    python -m pcss_unet_tpu.cli.organize   ≙ organize_data.py
    python -m pcss_unet_tpu.cli.prepare    ≙ prepare_dataset.py
    python -m pcss_unet_tpu.cli.stats      ≙ calculate_dataset_stats.py
    python -m pcss_unet_tpu.cli.train      ≙ main.py
    python -m pcss_unet_tpu.cli.infer      ≙ infer.py / inference.py
    python -m pcss_unet_tpu.cli.validate   ≙ validate_consistency.py
    python -m pcss_unet_tpu.cli.check      ≙ check.py / check_channel_stats.py / test.py
"""
