"""Prime-field specifications for limb-based TPU arithmetic.

A field element of F_p is stored as ``L`` little-endian 16-bit limbs packed in
``uint32`` lanes, with the limb axis *leading*: an array of shape ``(L, *batch)``.
Keeping the limb axis outermost means every per-limb operation is a full-width
VPU op over the batch (which occupies the TPU sublane/lane dims), instead of
wasting lanes on a tiny L-sized trailing axis.

All multiplicative arithmetic happens in the Montgomery domain with
R = 2^(16*L).  The reference implementation (MyZKP) only uses Montgomery form
in its CUDA kernel (myzkp/src/modules/algebra/cuda/kernels/field.hpp:238-312,
4x64-bit limbs); its Rust side is arbitrary-precision BigInt with a `%` per
multiply (myzkp/src/modules/algebra/field.rs:167-174).  Here Montgomery limb
arithmetic is the *only* representation, shared by CPU golden tests and TPU
kernels.

This module is pure-Python configuration; the jnp kernels live in limb.py.
"""

from __future__ import annotations

import dataclasses
import functools

W = 16  # limb width in bits
BASE = 1 << W
MASK = BASE - 1


def _int_to_limbs(x: int, L: int) -> tuple:
    assert 0 <= x < (1 << (W * L)), (x, L)
    return tuple((x >> (W * i)) & MASK for i in range(L))


def _limbs_to_int(limbs) -> int:
    return sum(int(v) << (W * i) for i, v in enumerate(limbs))


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static (hashable) description of a prime field F_p in 16-bit limbs."""

    p: int
    L: int
    n0: int  # -p^{-1} mod 2^16 (Montgomery constant)
    p_limbs: tuple
    r2_limbs: tuple  # R^2 mod p       (to_mont multiplier)
    one_limbs: tuple  # R mod p        (Montgomery representation of 1)
    r_inv: int  # R^{-1} mod p (host-side only)

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def make(p: int, L: int | None = None) -> "FieldSpec":
        assert p % 2 == 1 and p > 2, "Montgomery arithmetic needs an odd modulus"
        if L is None:
            L = max(1, (p.bit_length() + W - 1) // W)
        R = 1 << (W * L)
        assert p < R
        n0 = (-pow(p, -1, BASE)) % BASE
        r2 = (R * R) % p
        one = R % p
        r_inv = pow(R, -1, p)
        return FieldSpec(
            p=p,
            L=L,
            n0=n0,
            p_limbs=_int_to_limbs(p, L),
            r2_limbs=_int_to_limbs(r2, L),
            one_limbs=_int_to_limbs(one, L),
            r_inv=r_inv,
        )

    # ---- host-side conversions -------------------------------------------------

    def to_limbs(self, x: int) -> tuple:
        return _int_to_limbs(x % self.p, self.L)

    def from_limbs(self, limbs) -> int:
        return _limbs_to_int(limbs) % self.p

    def to_mont_int(self, x: int) -> int:
        return (x % self.p) * ((1 << (W * self.L)) % self.p) % self.p

    def from_mont_int(self, x: int) -> int:
        return (x % self.p) * self.r_inv % self.p


# ---------------------------------------------------------------------------
# Moduli used across the library (reference: MyZKP).
# ---------------------------------------------------------------------------

# BN254 / alt_bn128 scalar field r (EIP-197), the SNARK field.
# reference: myzkp/src/modules/algebra/field.rs:428-431 (ModEIP197)
BN254_R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

# BN254 base field q. reference: myzkp/src/modules/algebra/curve/bn128.rs:19-22
BN254_Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583

# STARK 128-bit prime p = 1 + 407 * 2^119.
# reference: myzkp/src/modules/zkstark/fri.rs:408
M128 = 270497897142230380135924736767050121217

# Goldilocks p = 2^64 - 2^32 + 1. reference: myzkp/src/modules/zkstark/fri.rs:409
M64 = (1 << 64) - (1 << 32) + 1

# Tiny teaching primes used by the reference's unit tests
# (myzkp/src/modules/algebra/field.rs:434-497 uses mod 17 / mod 31, and the
#  toy pairing curve lives over F_631, curve.rs:429-497).
MOD17 = 17
MOD31 = 31
MOD631 = 631


def bn254_r_spec() -> FieldSpec:
    return FieldSpec.make(BN254_R)


def bn254_q_spec() -> FieldSpec:
    return FieldSpec.make(BN254_Q)


def m128_spec() -> FieldSpec:
    return FieldSpec.make(M128)


def m64_spec() -> FieldSpec:
    return FieldSpec.make(M64)
