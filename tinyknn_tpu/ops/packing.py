"""4-bit code packing.

The reference stores PQ codes in the Quick-ADC pshufb layout — 16-row
transposed chunks interleaved 2-by-2 into uint64 words (reference:
tinyknn/_transform.py:4-77). That layout is an x86 artifact; the MXU/VPU
want plain row-major tiles. The TPU-native format is simply:

    codes:  uint8[n, n_blocks], values 0..15      (compute format)
    packed: uint8[n, n_blocks // 2]               (HBM storage format)

with two 4-bit codes per byte (low nibble = even block). Pack/unpack are
exact inverses; the round-trip property test mirrors the reference's
transform/unpack tests (tests/test_transform.py:71-101).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def pack_codes(codes):
    """uint8[..., B] (values 0..15) -> uint8[..., B/2]; B must be even."""
    codes = jnp.asarray(codes, jnp.uint8)
    assert codes.shape[-1] % 2 == 0, "n_blocks must be even to nibble-pack"
    lo = codes[..., 0::2]
    hi = codes[..., 1::2]
    return (lo | (hi << 4)).astype(jnp.uint8)


@jax.jit
def unpack_codes(packed):
    """uint8[..., B/2] -> uint8[..., B] (values 0..15)."""
    packed = jnp.asarray(packed, jnp.uint8)
    lo = packed & 0xF
    hi = packed >> 4
    return jnp.stack([lo, hi], axis=-1).reshape(
        packed.shape[:-1] + (2 * packed.shape[-1],))
