"""Small helpers (reference: src/utils.{h,cpp}) and typed errors.

The reference validates user input with bare ``assert``
(config.cpp:43-49) — which crashes without a message and vanishes
under ``python -O``.  Here user-facing validation raises these typed
exceptions with actionable messages instead.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


class ConfigError(ValueError):
    """Invalid fit configuration (bad JSON values, conflicting keys)."""


class FitError(RuntimeError):
    """A fit or statistics operation cannot proceed (degenerate
    likelihood space, malformed sample files, empty contours)."""


def nint(x: float) -> int:
    """Nearest integer, half away from zero (utils.h:33-38)."""
    return int(np.floor(x + 0.5)) if x >= 0 else int(np.ceil(x - 0.5))


def median(values: Sequence[float]) -> float:
    """Median (utils.h:76-90)."""
    return float(np.median(np.asarray(values)))
