"""seedrandom-compatible ARC4 PRNG (parity: reference
``src/base-filter.ts:11-53``, which draws all filter randomness from
``seedrandom(`${seed}`)`` — David Bau's public seedrandom v3.0.5).

Port of the published algorithm:

- ``mixkey(seed_str)``: for seeds shorter than 256 chars this reduces
  to the seed's char codes masked to bytes (the ``smear`` accumulator
  only engages once indexes wrap); implemented generally anyway.
- ARC4 key scheduling + generation is standard RC4 (KSA/PRGA) — the
  core is conformance-tested against the published RC4 test vectors
  ("Key", "Wiki", "Secret") in tests/test_bloom_family.py.
- the constructor discards width=256 initial outputs (the
  ``(me.g = function...)(width)`` call in seedrandom).
- ``random()`` is seedrandom's double generation: a 48-bit chunk
  topped up bytewise to >= 2^52 then renormalized below 2^53 —
  every float op is exact in IEEE-754 doubles, so the Python floats
  reproduce the JS values bit-for-bit.
- ``int32()`` is ``arc4.g(4) | 0`` (signed).

Used for kick-order parity in ``CuckooFilter(mode="reference")`` and
the XorFilter construction-seed chain.
"""

from __future__ import annotations

_WIDTH = 256
_MASK = 255
_CHUNKS = 6
_SIGNIFICANCE = float(1 << 52)
_OVERFLOW = float(1 << 53)
_STARTDENOM = float(_WIDTH) ** _CHUNKS


def mixkey(seed: str) -> list[int]:
    """seedrandom's mixkey: seed string → key byte list (length
    min(len(seed), 256); JS array semantics with int32 xor smear)."""
    key: dict[int, int] = {}
    smear = 0
    for j, ch in enumerate(seed):
        prev = key.get(_MASK & j)
        # JS: smear ^= key[mask & j] * 19 (undefined*19 -> NaN -> 0)
        smear = _int32(smear ^ (0 if prev is None else _int32(prev * 19)))
        key[_MASK & j] = _MASK & (smear + ord(ch))
    return [key[i] for i in range(min(len(seed), _WIDTH))]


def _int32(x: int) -> int:
    x &= 0xFFFFFFFF
    return x - (1 << 32) if x >= (1 << 31) else x


class _ARC4:
    """Standard RC4 with seedrandom's multi-byte ``g(count)``."""

    def __init__(self, key: list[int], discard: bool = True):
        if not key:
            key = [0]
        keylen = len(key)
        s = list(range(_WIDTH))
        j = 0
        for i in range(_WIDTH):
            t = s[i]
            j = _MASK & (j + key[i % keylen] + t)
            s[i] = s[j]
            s[j] = t
        self.S = s
        self.i = 0
        self.j = 0
        if discard:  # seedrandom discards 256 initial outputs;
            self.g(_WIDTH)  # discard=False exposes raw RC4 (tests)

    def g(self, count: int) -> int:
        r = 0
        i, j, s = self.i, self.j, self.S
        for _ in range(count):
            i = _MASK & (i + 1)
            t = s[i]
            j = _MASK & (j + t)
            s[i] = s[j]
            s[j] = t
            r = r * _WIDTH + s[_MASK & (s[i] + t)]
        self.i, self.j = i, j
        return r


class SeedRandom:
    """``seedrandom(str(seed))`` twin: ``random()`` doubles and
    ``int32()`` draws, reproducing the JS sequence bit-for-bit."""

    def __init__(self, seed: str):
        self._arc4 = _ARC4(mixkey(seed))

    def random(self) -> float:
        g = self._arc4.g
        n = float(g(_CHUNKS))
        d = _STARTDENOM
        x = 0
        while n < _SIGNIFICANCE:
            n = (n + x) * _WIDTH
            d *= _WIDTH
            x = g(1)
        while n >= _OVERFLOW:
            n /= 2
            d /= 2
            x >>= 1
        return (n + x) / d

    def int32(self) -> int:
        return _int32(self._arc4.g(4))

    def randint_js(self, lo: int, hi: int) -> int:
        """The reference's ``randomInt(min, max, this.random)``
        (utils.ts:34-46): floor(rn * (max - min + 1)) + min."""
        import math

        return math.floor(self.random() * (hi - lo + 1)) + lo

    # drop-in for random.Random at the CuckooFilter kick site
    randint = randint_js
