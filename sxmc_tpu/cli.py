"""Command-line interface.

``python -m sxmc_tpu.cli fit_configuration.json output_path``
mirrors the reference binary's usage (reference: src/sxmc.cpp:181-187),
with extra flags for resume and data-path resolution.
"""

from __future__ import annotations

import argparse
import sys

from sxmc_tpu.ensemble import main_fit


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="sxmc_tpu",
        description="TPU-native signal extraction with MCMC")
    parser.add_argument("config", help="fit configuration JSON file")
    parser.add_argument("output_path", help="output directory")
    parser.add_argument("--resume", action="store_true",
                        help="skip experiments with existing outputs")
    parser.add_argument("--data-root", default=None,
                        help="base directory for relative data filenames")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    main_fit(args.config, args.output_path, resume=args.resume,
             data_root=args.data_root)
    return 0


if __name__ == "__main__":
    sys.exit(main())
