"""Top-level dispatcher: ``python -m pcss_unet_tpu <command> [args...]``.

Commands map to the cli submodules (SURVEY.md §1 entry points):
organize, prepare, stats, train, infer, serve, validate, temporal,
check, inspect.
"""

import sys

COMMANDS = ("organize", "prepare", "stats", "train", "infer", "serve",
            "validate", "temporal", "check", "inspect")


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help") or \
            sys.argv[1] not in COMMANDS:
        print("usage: python -m pcss_unet_tpu <command> [args...]")
        print(f"commands: {', '.join(COMMANDS)}")
        raise SystemExit(0 if len(sys.argv) >= 2 and
                         sys.argv[1] in ("-h", "--help") else 2)
    import importlib

    module = importlib.import_module(f"pcss_unet_tpu.cli.{sys.argv[1]}")
    module.main(sys.argv[2:])


if __name__ == "__main__":
    main()
