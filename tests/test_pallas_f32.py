"""f32-digit Pallas kernel correctness (interpret mode on CPU).

The full point-add kernel is exercised on real TPU runs (bench.py and the
TPU e2e scripts); interpret mode is too slow for its ~44k-op body, so here we
check the field-arithmetic building blocks and the digit codecs, which carry
all the exactness risk (24-bit f32 mantissa bounds)."""

import random

import numpy as np
import jax.numpy as jnp

from zktpu.curve import pallas_f32 as pf
from zktpu.field import limb
from zktpu.field.params import FP, FR

random.seed(77)


def test_digit_codec_roundtrip():
    vals = [random.randrange(FP.modulus) for _ in range(128)]
    u = limb.encode(vals, FP)
    rows = pf.to_f32_digits(jnp.asarray(u))
    assert rows.shape == (32, 128)
    back = pf.from_f32_digits(rows, u.shape)
    assert np.array_equal(np.asarray(back), u)


def test_f32_mont_mul_interpret_fp():
    n = 128
    va = [random.randrange(FP.modulus) for _ in range(n)]
    vb = [random.randrange(FP.modulus) for _ in range(n)]
    # worst-case-ish operands too
    va[0] = FP.modulus - 1
    vb[0] = FP.modulus - 1
    va[1] = 0
    a = limb.encode(va, FP)
    b = limb.encode(vb, FP)
    r = pf.mont_mul(jnp.asarray(a), jnp.asarray(b), field="fp", interpret=True)
    got = limb.decode(np.asarray(r), FP)
    assert got == [x * y % FP.modulus for x, y in zip(va, vb)]


def test_f32_mont_mul_interpret_fr():
    n = 128
    va = [random.randrange(FR.modulus) for _ in range(n)]
    vb = [random.randrange(FR.modulus) for _ in range(n)]
    a = limb.encode(va, FR)
    b = limb.encode(vb, FR)
    r = pf.mont_mul(jnp.asarray(a), jnp.asarray(b), field="fr", interpret=True)
    got = limb.decode(np.asarray(r), FR)
    assert got == [x * y % FR.modulus for x, y in zip(va, vb)]
