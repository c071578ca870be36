"""Small helpers (reference: src/utils.{h,cpp})."""

from __future__ import annotations

from typing import Sequence

import numpy as np


def nint(x: float) -> int:
    """Nearest integer, half away from zero (utils.h:33-38)."""
    return int(np.floor(x + 0.5)) if x >= 0 else int(np.ceil(x - 0.5))


def median(values: Sequence[float]) -> float:
    """Median (utils.h:76-90)."""
    return float(np.median(np.asarray(values)))
