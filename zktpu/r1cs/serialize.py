"""R1CS artifact (de)serialization.

Reference analog: gnark's r1cs.WriteTo/ReadFrom used by keygen.go:341-343 and
prove_impl.go:102-107.  Our format is a numpy .npz: COO triplets per matrix
with coefficients as 16-bit-limb arrays — directly memory-mappable into the
TPU prover's constant buffers (no parse step on the hot path).
"""

from __future__ import annotations

import io

import numpy as np

from ..field.params import NLIMBS, int_to_limbs, limbs_to_int
from .builder import CompiledR1CS


def _coeffs_to_limbs(coeffs) -> np.ndarray:
    out = np.empty((len(coeffs), NLIMBS), dtype=np.uint32)
    for i, c in enumerate(coeffs):
        out[i] = int_to_limbs(c)
    return out


def _limbs_to_coeffs(arr: np.ndarray) -> list:
    return [limbs_to_int(row) for row in arr]


def dumps(cs: CompiledR1CS) -> bytes:
    buf = io.BytesIO()
    np.savez_compressed(
        buf,
        meta=np.array([cs.num_constraints, cs.num_vars, cs.num_public], np.int64),
        a_rows=cs.a_rows, a_cols=cs.a_cols, a_coeffs=_coeffs_to_limbs(cs.a_coeffs),
        b_rows=cs.b_rows, b_cols=cs.b_cols, b_coeffs=_coeffs_to_limbs(cs.b_coeffs),
        c_rows=cs.c_rows, c_cols=cs.c_cols, c_coeffs=_coeffs_to_limbs(cs.c_coeffs),
        committed_vars=np.asarray(cs.committed_vars, np.int64),
        challenge_vars=np.asarray(cs.challenge_vars, np.int64),
    )
    return buf.getvalue()


def loads(data: bytes) -> CompiledR1CS:
    d = np.load(io.BytesIO(data))
    nc, nv, npub = d["meta"].tolist()
    empty = np.zeros(0, np.int64)
    return CompiledR1CS(
        num_constraints=nc,
        num_vars=nv,
        num_public=npub,
        a_rows=d["a_rows"], a_cols=d["a_cols"], a_coeffs=_limbs_to_coeffs(d["a_coeffs"]),
        b_rows=d["b_rows"], b_cols=d["b_cols"], b_coeffs=_limbs_to_coeffs(d["b_coeffs"]),
        c_rows=d["c_rows"], c_cols=d["c_cols"], c_coeffs=_limbs_to_coeffs(d["c_coeffs"]),
        committed_vars=d["committed_vars"] if "committed_vars" in d else empty,
        challenge_vars=d["challenge_vars"] if "challenge_vars" in d else empty,
    )


def save(cs: CompiledR1CS, path: str):
    with open(path, "wb") as f:
        f.write(dumps(cs))


def load(path: str) -> CompiledR1CS:
    with open(path, "rb") as f:
        return loads(f.read())
