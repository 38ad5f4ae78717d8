"""PCG32 random number generator (host + device).

Parity with the reference's `DqnRnd*` PCG helpers (SURVEY.md §2 #7). Two
implementations of the SAME stream:

- `Pcg32`: sequential host-side generator (the reference-shaped API).
- `pcg32_stream`: counter-based device evaluation — state_i is computed in closed
  form via LCG jumps (state_i = A^i * s0 + (sum_{j<i} A^j) * inc mod 2^64, with the
  jump coefficients precomputed host-side for a static stream length), so all n
  outputs evaluate in parallel on device with no sequential dependency. 64-bit
  arithmetic is emulated with uint32 limbs (jax_enable_x64 stays off). Host and
  device agree bit-for-bit (tests/test_platform.py).

For bulk device randomness prefer jax.random; this exists for reference-API parity
and deterministic demo content.
"""

from __future__ import annotations

import numpy as np

_MULT = 6364136223846793005
_INC_DEFAULT = 1442695040888963407
_M64 = (1 << 64) - 1


class Pcg32:
    """Host-side PCG32 (XSH-RR variant)."""

    def __init__(self, seed: int = 0x853C49E6748FEA9B, inc: int | None = None):
        self.inc = np.uint64((inc if inc is not None else _INC_DEFAULT) | 1)
        self.state = np.uint64(0)
        self.next_u32()
        self.state = np.uint64((int(self.state) + int(np.uint64(seed))) % (1 << 64))
        self.next_u32()

    def next_u32(self) -> int:
        old = self.state
        self.state = np.uint64(
            (int(old) * _MULT + int(self.inc)) % (1 << 64)
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


# ---------------------------------------------------------------------------
# Device-side: emulated-u64 limb arithmetic (all uint32; products use 16-bit
# limbs so nothing overflows 32 bits).
# ---------------------------------------------------------------------------

def _mul64(ah, al, bh, bl):
    """(ah:al) * (bh:bl) mod 2^64 -> (hi, lo). All operands uint32 arrays."""
    import jax.numpy as jnp

    u32 = jnp.uint32
    mask16 = u32(0xFFFF)
    a = [al & mask16, al >> 16, ah & mask16, ah >> 16]
    b = [bl & mask16, bl >> 16, bh & mask16, bh >> 16]
    # Column sums of 16-bit half-products: each column accumulates < 2^19.
    cols = [jnp.zeros_like(al)] * 5
    cols = list(cols)
    for i in range(4):
        for j in range(4 - i):
            p = a[i] * b[j]  # < 2^32, exact in uint32
            k = i + j
            cols[k] = cols[k] + (p & mask16)
            if k + 1 < 4:
                cols[k + 1] = cols[k + 1] + (p >> 16)
    out = []
    carry = jnp.zeros_like(al)
    for k in range(4):
        s = cols[k] + carry
        out.append(s & mask16)
        carry = s >> 16
    lo = out[0] | (out[1] << 16)
    hi = out[2] | (out[3] << 16)
    return hi, lo


def _add64(ah, al, bh, bl):
    """(ah:al) + (bh:bl) mod 2^64 -> (hi, lo)."""
    lo = al + bl  # uint32 wraps
    carry = (lo < al).astype(al.dtype)
    hi = ah + bh + carry
    return hi, lo


def _const64(x: int):
    import jax.numpy as jnp

    return jnp.uint32((x >> 32) & 0xFFFFFFFF), jnp.uint32(x & 0xFFFFFFFF)


def pcg32_stream(seed, n: int, inc: int | None = None):
    """First n PCG32 outputs for `seed`, evaluated in parallel on device.

    seed: python int (full 64-bit) or a traced uint32 scalar (low 32 bits).
    Returns uint32[n], bit-identical to [Pcg32(seed).next_u32() for _ in range(n)].
    Jittable with static n; the LCG jump coefficients A^i and sum_{j<i} A^j * inc
    are static data, so the per-element work is one emulated-u64 multiply-add plus
    the XSH-RR output permutation — no sequential chain.
    """
    import jax.numpy as jnp

    inc_v = ((inc if inc is not None else _INC_DEFAULT) | 1) & _M64
    # Host-precomputed jump tables (python ints — exact).
    a_pow = np.empty(n, dtype=object)
    c_inc = np.empty(n, dtype=object)
    ap, s = 1, 0
    for i in range(n):
        a_pow[i] = ap
        c_inc[i] = (s * inc_v) & _M64
        s = (s * _MULT + 1) & _M64
        ap = (ap * _MULT) & _M64
    ap_hi = jnp.asarray([(int(x) >> 32) & 0xFFFFFFFF for x in a_pow], jnp.uint32)
    ap_lo = jnp.asarray([int(x) & 0xFFFFFFFF for x in a_pow], jnp.uint32)
    ci_hi = jnp.asarray([(int(x) >> 32) & 0xFFFFFFFF for x in c_inc], jnp.uint32)
    ci_lo = jnp.asarray([int(x) & 0xFFFFFFFF for x in c_inc], jnp.uint32)

    if isinstance(seed, (int, np.integer)):
        sd_hi, sd_lo = _const64(int(seed) & _M64)
    else:
        sd_hi = jnp.uint32(0)
        sd_lo = jnp.asarray(seed, jnp.uint32)

    # Replicate Pcg32.__init__: state = A*(inc + seed) + inc  (mod 2^64).
    in_hi, in_lo = _const64(inc_v)
    a_hi, a_lo = _const64(_MULT)
    t_hi, t_lo = _add64(in_hi, in_lo, sd_hi, sd_lo)
    t_hi, t_lo = _mul64(a_hi, a_lo, t_hi, t_lo)
    s0_hi, s0_lo = _add64(t_hi, t_lo, in_hi, in_lo)

    # state_i = A^i * s0 + C_i   (vectorized over i)
    st_hi, st_lo = _mul64(ap_hi, ap_lo, jnp.broadcast_to(s0_hi, (n,)),
                          jnp.broadcast_to(s0_lo, (n,)))
    st_hi, st_lo = _add64(st_hi, st_lo, ci_hi, ci_lo)

    # XSH-RR output permutation: ((state ^ (state >> 18)) >> 27) rot (state >> 59)
    x_hi = st_hi ^ (st_hi >> 18)
    x_lo = st_lo ^ ((st_lo >> 18) | (st_hi << 14))
    xorshifted = (x_lo >> 27) | (x_hi << 5)
    rot = st_hi >> 27  # state >> 59
    return (xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))


def pcg32_f32_stream(seed, n: int, inc: int | None = None):
    """First n uniform [0,1) f32 draws (24-bit mantissa), device-parallel."""
    import jax.numpy as jnp

    u = pcg32_stream(seed, n, inc)
    return (u >> 8).astype(jnp.float32) * np.float32(1.0 / (1 << 24))
