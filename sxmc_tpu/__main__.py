"""``python -m sxmc_tpu`` entry point."""

import sys

from sxmc_tpu.cli import main

sys.exit(main())
