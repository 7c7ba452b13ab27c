"""Field-arithmetic kernels vs. Python big-int oracle."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zktpu.field import limb
from zktpu.field.jnp_field import JnpField
from zktpu.field.params import FP, FR, NLIMBS

RNG = random.Random(1234)


def rand_elems(spec, n):
    return [RNG.randrange(spec.modulus) for _ in range(n)]


@pytest.mark.parametrize("spec", [FR, FP], ids=["fr", "fp"])
class TestFieldOps:
    N = 64

    def _pair(self, spec):
        a = rand_elems(spec, self.N)
        b = rand_elems(spec, self.N)
        # include edge cases
        a[0], b[0] = 0, 0
        a[1], b[1] = spec.modulus - 1, spec.modulus - 1
        a[2], b[2] = 1, spec.modulus - 1
        return a, b

    def test_mont_mul(self, spec):
        f = JnpField(spec)
        a, b = self._pair(spec)
        am = jnp.asarray(limb.encode(a, spec))
        bm = jnp.asarray(limb.encode(b, spec))
        got = limb.decode(np.asarray(jax.jit(f.mont_mul)(am, bm)), spec)
        want = [(x * y) % spec.modulus for x, y in zip(a, b)]
        assert got == want

    def test_add_sub_neg(self, spec):
        f = JnpField(spec)
        a, b = self._pair(spec)
        am = jnp.asarray(limb.encode(a, spec))
        bm = jnp.asarray(limb.encode(b, spec))
        assert limb.decode(np.asarray(jax.jit(f.add)(am, bm)), spec) == [
            (x + y) % spec.modulus for x, y in zip(a, b)
        ]
        assert limb.decode(np.asarray(jax.jit(f.sub)(am, bm)), spec) == [
            (x - y) % spec.modulus for x, y in zip(a, b)
        ]
        assert limb.decode(np.asarray(jax.jit(f.neg)(bm)), spec) == [
            (-y) % spec.modulus for y in b
        ]

    def test_mont_roundtrip(self, spec):
        f = JnpField(spec)
        a, _ = self._pair(spec)
        raw = jnp.asarray(limb.encode(a, spec, mont=False))
        m = jax.jit(f.to_mont)(raw)
        assert limb.decode(np.asarray(m), spec) == a
        back = jax.jit(f.from_mont)(m)
        assert limb.decode(np.asarray(back), spec, mont=False) == a

    def test_inv(self, spec):
        f = JnpField(spec)
        a = rand_elems(spec, 8)
        am = jnp.asarray(limb.encode(a, spec))
        inv = jax.jit(f.inv)(am)
        got = limb.decode(np.asarray(inv), spec)
        want = [pow(x, -1, spec.modulus) for x in a]
        assert got == want

    def test_pow_const(self, spec):
        f = JnpField(spec)
        a = rand_elems(spec, 4)
        am = jnp.asarray(limb.encode(a, spec))
        for e in [0, 1, 2, 3, 65537]:
            got = limb.decode(np.asarray(jax.jit(lambda x: f.pow_const(x, e))(am)), spec)
            assert got == [pow(x, e, spec.modulus) for x in a], f"exp {e}"

    def test_is_zero_select(self, spec):
        f = JnpField(spec)
        vals = [0, 1, spec.modulus - 1, 0]
        am = jnp.asarray(limb.encode(vals, spec))
        assert np.asarray(f.is_zero(am)).tolist() == [True, False, False, True]


def test_batch_shapes():
    f = JnpField(FR)
    a = jnp.asarray(limb.encode(rand_elems(FR, 12), FR)).reshape(3, 4, NLIMBS)
    b = jnp.asarray(limb.encode(rand_elems(FR, 12), FR)).reshape(3, 4, NLIMBS)
    out = jax.jit(f.mont_mul)(a, b)
    assert out.shape == (3, 4, NLIMBS)
