"""BN254 field parameters and limb-decomposition constants.

The reference stack does all arithmetic over BN254 (gnark-crypto v0.14.0,
/root/reference/go.mod:9). We re-own that layer TPU-natively: field elements are
fixed-shape ``uint32`` limb arrays holding 16-bit digits, so that products of two
digits (16x16 -> 32) and column accumulations stay exactly representable in the
TPU's native 32-bit integer lanes (no 64-bit multiplier on TPU).

Two fields:
  * Fr -- the scalar field (circuit/witness/NTT domain).
  * Fp -- the base field (G1/G2 coordinates, MSM arithmetic).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

# BN254 (alt_bn128) curve seed x and derived primes.
BN254_X = 4965661367192848881
P_FP = 21888242871839275222246405745257275088696311157297823662689037894645226208583
P_FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617

assert P_FP == 36 * BN254_X**4 + 36 * BN254_X**3 + 24 * BN254_X**2 + 6 * BN254_X + 1
assert P_FR == 36 * BN254_X**4 + 36 * BN254_X**3 + 18 * BN254_X**2 + 6 * BN254_X + 1

LIMB_BITS = 16
NLIMBS = 16  # 16 x 16 = 256 bits >= 254
LIMB_MASK = (1 << LIMB_BITS) - 1
MONT_BITS = LIMB_BITS * NLIMBS  # 256
R_MONT = 1 << MONT_BITS

# Fr multiplicative-group facts (used by the NTT): r-1 = 2^28 * odd.
FR_TWO_ADICITY = 28
assert (P_FR - 1) % (1 << FR_TWO_ADICITY) == 0
assert (P_FR - 1) % (1 << (FR_TWO_ADICITY + 1)) != 0
# 5 generates a subgroup whose 2-part is full: verified below at import time.
FR_GENERATOR = 5
FR_ROOT_OF_UNITY = pow(FR_GENERATOR, (P_FR - 1) >> FR_TWO_ADICITY, P_FR)
assert pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - 1), P_FR) == P_FR - 1, (
    "root of unity must have exact order 2^28"
)


def int_to_limbs(x: int, nlimbs: int = NLIMBS) -> np.ndarray:
    """Little-endian 16-bit digits of ``x`` as uint32."""
    assert 0 <= x < (1 << (LIMB_BITS * nlimbs))
    return np.array(
        [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(nlimbs)], dtype=np.uint32
    )


def limbs_to_int(limbs) -> int:
    out = 0
    arr = np.asarray(limbs, dtype=np.uint64).reshape(-1)
    for i, v in enumerate(arr.tolist()):
        out += int(v) << (LIMB_BITS * i)
    return out


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """All derived constants a limb-arithmetic kernel needs, precomputed on host."""

    name: str
    modulus: int

    @functools.cached_property
    def r(self) -> int:  # Montgomery radix mod p
        return R_MONT % self.modulus

    @functools.cached_property
    def r2(self) -> int:  # R^2 mod p -- converts into Montgomery form
        return (R_MONT * R_MONT) % self.modulus

    @functools.cached_property
    def r3(self) -> int:
        return (self.r * self.r2) % self.modulus

    @functools.cached_property
    def mont_ninv(self) -> int:  # -p^{-1} mod 2^16 (per-limb REDC factor)
        return (-pow(self.modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

    @functools.cached_property
    def p_limbs(self) -> np.ndarray:
        return int_to_limbs(self.modulus)

    @functools.cached_property
    def r2_limbs(self) -> np.ndarray:
        return int_to_limbs(self.r2)

    @functools.cached_property
    def one_mont_limbs(self) -> np.ndarray:  # 1 in Montgomery form
        return int_to_limbs(self.r)

    @functools.cached_property
    def zero_limbs(self) -> np.ndarray:
        return np.zeros(NLIMBS, dtype=np.uint32)

    def to_mont(self, x: int) -> int:
        return (x * R_MONT) % self.modulus

    def from_mont(self, x: int) -> int:
        return (x * pow(R_MONT, -1, self.modulus)) % self.modulus


FP = FieldSpec("fp", P_FP)
FR = FieldSpec("fr", P_FR)
