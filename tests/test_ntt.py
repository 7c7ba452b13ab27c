"""NTT tests against a naive DFT oracle (Python ints)."""

import random

import numpy as np

from zktpu.field import limb
from zktpu.field.params import FR, P_FR
from zktpu.ntt.ntt import Domain, coset_intt, coset_ntt, intt, ntt


def setup_module():
    random.seed(1234)


def _rand_vals(n):
    return [random.randrange(P_FR) for _ in range(n)]


def test_ntt_matches_naive_dft():
    n = 32
    d = Domain(n)
    vals = _rand_vals(n)
    x = limb.encode(vals, FR)
    got = limb.decode(np.asarray(ntt(x[None], d))[0], FR)
    expect = [
        sum(vals[k] * pow(d.omega, i * k, P_FR) for k in range(n)) % P_FR
        for i in range(n)
    ]
    assert got == expect


def test_intt_roundtrip():
    n = 128
    d = Domain(n)
    vals = _rand_vals(n)
    x = limb.encode(vals, FR)
    back = limb.decode(np.asarray(intt(ntt(x[None], d), d))[0], FR)
    assert back == vals


def test_coset_evaluation_and_roundtrip():
    n = 16
    d = Domain(n)
    vals = _rand_vals(n)
    x = limb.encode(vals, FR)
    got = limb.decode(np.asarray(coset_ntt(x[None], d))[0], FR)
    g = d.coset_gen
    expect = [
        sum(vals[k] * pow(g * pow(d.omega, i, P_FR) % P_FR, k, P_FR) for k in range(n))
        % P_FR
        for i in range(n)
    ]
    assert got == expect
    back = limb.decode(np.asarray(coset_intt(np.asarray(coset_ntt(x[None], d)), d))[0], FR)
    assert back == vals


def test_polynomial_division_property():
    """(A*B - C) built to vanish on H must yield exact quotient via coset."""
    n = 8
    d = Domain(n)
    # p(X) = Z_H(X) * q(X) with q of degree < n-1; recover q on the coset.
    q = _rand_vals(n - 1) + [0]
    # p = Z_H * q has degree 2n-1: compute p mod nothing but evaluate on coset of size 2n
    d2 = Domain(2 * n)
    # coefficients of Z_H = X^n - 1
    zq = [(-q[i]) % P_FR for i in range(n)] + q[: n]  # (X^n - 1) * q
    zq_pad = zq + [0] * (2 * n - len(zq))
    x = limb.encode(zq_pad, FR)
    evals = np.asarray(coset_ntt(x[None], d2))[0]
    vals = limb.decode(evals, FR)
    # divide by Z_H(coset point) pointwise — non-constant on the *larger* coset,
    # so compute it per-point here (the prover's N-sized shortcut is tested via
    # the constant-Z property below)
    g = d2.coset_gen
    out = []
    for i, v in enumerate(vals):
        pt = g * pow(d2.omega, i, P_FR) % P_FR
        z = (pow(pt, n, P_FR) - 1) % P_FR
        out.append(v * pow(z, -1, P_FR) % P_FR)
    back = limb.decode(
        np.asarray(coset_intt(limb.encode(out, FR)[None], d2))[0], FR
    )
    assert back[: n - 1] == q[: n - 1]
    assert all(c == 0 for c in back[n:])


def test_z_constant_on_same_size_coset():
    n = 16
    d = Domain(n)
    g = d.coset_gen
    z0 = (pow(g, n, P_FR) - 1) % P_FR
    for i in range(n):
        pt = g * pow(d.omega, i, P_FR) % P_FR
        assert (pow(pt, n, P_FR) - 1) % P_FR == z0
