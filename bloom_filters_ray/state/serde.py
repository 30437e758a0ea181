"""JSON serialization conventions shared by all sketches.

Parity with the reference's export format: bigints are wrapped as
``{"$bf$bigint": "<decimal>"}`` (``src/utils.ts:101-114``) and byte
arrays as base64 strings (``src/bloom/bit-set.ts:94-116``).
"""

from __future__ import annotations

import base64

import numpy as np


def export_bigint(value: int) -> dict:
    return {"$bf$bigint": str(value)}


def import_bigint(value: dict) -> int:
    return int(value["$bf$bigint"])


def export_bytes(arr: np.ndarray) -> str:
    return base64.b64encode(np.ascontiguousarray(arr, dtype=np.uint8).tobytes()).decode("ascii")


def import_bytes(s: str) -> np.ndarray:
    return np.frombuffer(base64.b64decode(s), dtype=np.uint8).copy()
