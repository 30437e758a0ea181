"""HyperLogLog (parity: reference ``src/sketch/hyperloglog.ts``).

m registers (power of two); per element the 64-bit hash is split as:
register index = the LOW b bits (the reference slices the last b chars
of the binary string — hyperloglog.ts:95-105), and the stored value is
the 0-based index of the leftmost 1-bit of the HIGH k = 64-b bits
(default k-1 when they are all zero). The estimator replicates the
reference's non-standard ``alpha * m^2 * 2 / Z`` (the extra *2
compensates the 0-based rank) with its small/large-range corrections.
``merge`` = elementwise register max.

Hash family: XXH3-64 with the filter seed, matching the reference
(hyperloglog.ts:4, 96-97) via the pure-numpy ``bloom_filters_ray.xxh3``
implementation (conformance-pinned in tests/test_hashing.py);
``hash_family="xxh64"`` keeps the round-1 XXH64 variant readable.
"""

from __future__ import annotations

import math

import numpy as np

from ..hashing import DEFAULT_SEED, xxh64, xxh64_arrow
from ..xxh3 import xxh3_64, xxh3_64_arrow
from .serde import export_bigint, import_bigint

_TWO_POW_32 = 2.0**32


def _alpha(m: int) -> float:
    if m < 16:
        return 1.0
    if m < 32:
        return 0.673
    if m < 64:
        return 0.697
    if m < 128:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 arrays (exact, no float)."""
    x = x.copy()
    out = np.zeros(x.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(shift))
        out[big] += shift
        x[big] >>= np.uint64(shift)
    out[x > 0] += 1
    return out


class HyperLogLog:
    HASH_SIZE = 64

    def __init__(self, nb_registers: int, seed: int = DEFAULT_SEED,
                 mode: str = "reference", hash_family: str = "xxh3",
                 hasher=None):
        """*mode*: "reference" replicates the reference estimator
        verbatim (0-based rank, ``alpha*m^2*2/Z``, ``V = #(reg==0)``) —
        accurate at reference load (n >> m) but biased in the sparse
        regime because rank-0 registers are indistinguishable from
        empty ones in linear counting. "standard" stores 1-based ranks
        and uses the textbook Flajolet estimator — use it for engine
        diagnostics where n may be << m. Sketches merge only within
        one mode."""
        if nb_registers & (nb_registers - 1) != 0:
            raise ValueError("The number of registers should be a power of 2")
        if mode not in ("reference", "standard"):
            raise ValueError(mode)
        if hash_family not in ("xxh3", "xxh64"):
            raise ValueError(hash_family)
        self._hash_family = hash_family
        # custom Hashing: serialize replaces the 64-bit element hash
        # (the engine seam for the README "Seeding and Hashing"
        # contract; the reference HLL hardcodes xxh3.xxh64). None
        # keeps the vectorized fast path.
        self._hasher = hasher
        self._m = nb_registers
        self._b = math.ceil(math.log2(nb_registers))
        self._correction_bias = _alpha(nb_registers)
        self._registers = np.zeros(nb_registers, dtype=np.int64)
        self._seed = seed
        self._mode = mode

    @property
    def nb_registers(self) -> int:
        return self._m

    def update(self, element) -> None:
        if getattr(self, "_hasher", None) is not None:
            x = self._hasher.serialize(element, self._seed)
        else:
            x = (xxh3_64(element, self._seed) if self._hash_family == "xxh3"
                 else xxh64(element, self._seed))
        k = self.HASH_SIZE - self._b
        register_index = x & (self._m - 1)  # low b bits
        top = x >> self._b  # high k bits
        leftmost_pos = k - 1 if top == 0 else k - top.bit_length()
        if self._mode == "standard":
            leftmost_pos = min(leftmost_pos + 1, k)  # 1-based rank
        self._registers[register_index] = max(self._registers[register_index], leftmost_pos)

    def update_many(self, elements) -> None:
        """Vectorized bulk update (engine extension; pyarrow/list input)."""
        if len(elements) == 0:
            return
        import pyarrow as pa

        if not isinstance(elements, (pa.Array, pa.ChunkedArray)):
            elements = pa.array([e.encode() if isinstance(e, str) else bytes(e)
                                 for e in elements], type=pa.binary())
        if getattr(self, "_hasher", None) is not None:
            x = np.array([self._hasher.serialize(v, self._seed)
                          for v in elements.to_pylist()], dtype=np.uint64)
        else:
            x = (xxh3_64_arrow(elements, self._seed)
                 if self._hash_family == "xxh3"
                 else xxh64_arrow(elements, self._seed))
        k = self.HASH_SIZE - self._b
        idx = (x & np.uint64(self._m - 1)).astype(np.int64)
        top = x >> np.uint64(self._b)
        lp = np.where(top == 0, k - 1, k - _bit_length_u64(top))
        if self._mode == "standard":
            lp = np.minimum(lp + 1, k)  # 1-based rank
        np.maximum.at(self._registers, idx, lp)

    def count(self, round_result: bool = False) -> float:
        Z = float(np.sum(np.power(2.0, -self._registers.astype(np.float64))))
        mult = 1 if self._mode == "standard" else 2
        raw = (self._correction_bias * self._m * self._m * mult) / Z
        if raw <= 2.5 * self._m:
            V = int(np.sum(self._registers == 0))
            est = self._m * math.log(self._m / V) if V > 0 else raw
        elif raw <= _TWO_POW_32 / 30:
            est = raw
        else:
            est = -_TWO_POW_32 * math.log(1 - raw / _TWO_POW_32)
        return round(est) if round_result else est

    def relative_error(self) -> float:
        return 1.04 / math.sqrt(self._m)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if self._m != other._m:
            raise ValueError("Two HyperLogLog must have the same number of registers to be merged")
        if self._mode != other._mode:
            raise ValueError("Cannot merge HyperLogLogs with different estimator modes")
        if self._hash_family != other._hash_family:
            raise ValueError("Cannot merge HyperLogLogs with different hash families")
        out = HyperLogLog(self._m, self._seed, self._mode, self._hash_family)
        out._registers = np.maximum(self._registers, other._registers)
        return out

    def equals(self, other: "HyperLogLog") -> bool:
        return (self._m == other._m and self._mode == other._mode
                and self._hash_family == other._hash_family
                and np.array_equal(self._registers, other._registers))

    def save_as_json(self) -> dict:
        out = {
            "_m": self._m,
            "_b": self._b,
            "_correctionBias": self._correction_bias,
            "_registers": self._registers.tolist(),
            "_seed": export_bigint(self._seed),
        }
        if self._mode != "reference":  # reference JSON layout has no mode
            out["_mode"] = self._mode
            # engine exports ALWAYS carry the family so a pre-xxh3
            # legacy file (which has _mode but no _hashFamily) is
            # distinguishable from a current export — from_json raises
            # on that ambiguous shape instead of guessing
            out["_hashFamily"] = self._hash_family
        elif self._hash_family != "xxh3":  # reference family is xxh3
            out["_hashFamily"] = self._hash_family
        return out

    @staticmethod
    def from_json(data: dict) -> "HyperLogLog":
        """Restore from JSON. A missing ``_hashFamily`` on a pure
        reference-layout file (no ``_mode`` either) means the reference
        family (xxh3). An ENGINE export (``_mode`` present) always
        carries ``_hashFamily``; one without it is a pre-xxh3 legacy
        file whose registers were XXH64-built — reloading it as xxh3
        would silently mix hash families in one register set, so it
        raises instead (re-export from source data)."""
        if "_mode" in data and "_hashFamily" not in data:
            raise ValueError(
                "ambiguous legacy HyperLogLog export: engine JSON "
                "without _hashFamily predates the xxh3 switch (its "
                "registers are XXH64-built); re-export from source "
                "data instead of mixing hash families")
        f = HyperLogLog(data["_m"], import_bigint(data["_seed"]),
                        data.get("_mode", "reference"),
                        data.get("_hashFamily", "xxh3"))
        f._b = data["_b"]
        f._correction_bias = data["_correctionBias"]
        f._registers = np.asarray(data["_registers"], dtype=np.int64)
        return f
