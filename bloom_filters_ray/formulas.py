"""Bloom filter sizing formulas (parity: reference ``src/formulas.ts:38-51``)."""

from __future__ import annotations

import math


def optimal_filter_size(length: int, error_rate: float) -> int:
    """m = ceil(-(n * ln(eps)) / ln(2)^2)."""
    return math.ceil(-((length * math.log(error_rate)) / math.log(2) ** 2))


def optimal_hashes(size: int, length: int) -> int:
    """k = ceil((m / n) * ln 2)."""
    return math.ceil((size / length) * math.log(2))
