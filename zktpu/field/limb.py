"""Host-side codecs between Python ints and limb arrays (numpy, not traced)."""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

from .params import LIMB_BITS, LIMB_MASK, NLIMBS, FieldSpec, int_to_limbs, limbs_to_int


def encode(values: Iterable[int], spec: FieldSpec, mont: bool = True) -> np.ndarray:
    """Python ints -> (N, 16) uint32 limb array (Montgomery form by default)."""
    vals = [
        spec.to_mont(v % spec.modulus) if mont else v % spec.modulus for v in values
    ]
    out = np.empty((len(vals), NLIMBS), dtype=np.uint32)
    for i, v in enumerate(vals):
        for k in range(NLIMBS):
            out[i, k] = (v >> (LIMB_BITS * k)) & LIMB_MASK
    return out


def encode_one(value: int, spec: FieldSpec, mont: bool = True) -> np.ndarray:
    return encode([value], spec, mont=mont)[0]


def decode(limbs: np.ndarray, spec: FieldSpec, mont: bool = True) -> list[int]:
    """(..., 16) limb array -> list of Python ints (converting out of Montgomery)."""
    arr = np.asarray(limbs, dtype=np.uint64).reshape(-1, NLIMBS)
    out = []
    for row in arr:
        v = 0
        for k in range(NLIMBS):
            v += int(row[k]) << (LIMB_BITS * k)
        out.append(spec.from_mont(v) if mont else v % spec.modulus)
    return out


def decode_one(limbs: np.ndarray, spec: FieldSpec, mont: bool = True) -> int:
    return decode(limbs, spec, mont=mont)[0]


__all__ = [
    "encode",
    "encode_one",
    "decode",
    "decode_one",
    "int_to_limbs",
    "limbs_to_int",
]
