"""gnark artifact -> zktpu runtime bridge.

Converts the reference's own generated artifacts (pk/r1cs/vk, loaded at
runtime by prove_impl.go:86-107) into the TPU prover's native structures,
so a proof produced by zktpu.groth16.Prover from /root/reference's
pk.chacha20 + r1cs.chacha20 verifies under the checked-in vk.chacha20
(SURVEY.md §7 Phase 5 acceptance).

Conventions pinned here (gnark v0.11 Groth16, [dep] go.mod:8; every one
empirically validated by the hypothesis sweep in
tests/test_gnark_artifact_e2e.py — a host-path proof from the reference's
own pk/r1cs verifies under the checked-in vk.chacha20 only with exactly
this combination):

  * NO public-input binding rows: gnark's QAP uses only the circuit's
    constraint rows (domain rows nbConstraints..n-1 are zero); the
    bellman-style L_{nbConstraints+i} public-binding trick is NOT used.
  * pk.Z is the monomial-basis H query [tau^k Z(tau)/delta] stored in
    BIT-REVERSED index order: Z_file[j] = [tau^bitrev(j) Z(tau)/delta]
    (gnark's computeH ends with a DIF inverse FFT and skips the
    bit-reversal permutation; len(z) == n-1 works because
    bitrev(n-1) == n-1 and the degree-(n-1) quotient slot is always 0).
    We un-permute at conversion time so the natural-monomial-order h from
    our NTT pipeline pairs with h_query[k] directly.
  * pk.K covers private wires only; our l_query spans the full witness
    index space with the instance head at infinity.
"""

from __future__ import annotations

import numpy as np

from ..field.params import FP, NLIMBS, int_to_limbs
from ..r1cs.builder import CompiledR1CS
from ..groth16.setup import ProvingKey, VerifyingKey
from .gnark import GnarkProvingKey, GnarkVerifyingKey
from .gnark_r1cs import CONST_WIRE, GnarkR1CS, R1CInst


def _next_pow2(n: int) -> int:
    m = 1
    while m < n:
        m <<= 1
    return m


def _bitrev(x: int, nbits: int) -> int:
    r = 0
    for _ in range(nbits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def commitment_wire_map(r1cs: GnarkR1CS):
    """Wire renumbering that moves gnark's BSB22 commitment-CHALLENGE wire
    into the instance block (the "instance remap" of our vk_x model).

    gnark keeps the challenge as a private wire solved by the Bsb22 hint,
    but serves it through the vk: vk.aes*'s IC has nbPublic+2 entries —
    IC_0, the publics, and one slot for the challenge — and the verifier
    folds proof.D into vk_x then derives the challenge by hashing
    (verify.go in gnark's backend/groth16 [dep]).  Our Builder allocates
    challenges as public wires from the start (builder.py challenge()), so
    converting a gnark committed circuit = renumber the commitment wire to
    position nb_public_wires and shift the private wires in between."""
    cw = r1cs.commitment_wire
    npw = r1cs.nb_public_wires
    if cw is None:
        return None

    def m(w):
        if w < npw or w > cw:
            return w
        if w == cw:
            return npw
        return w + 1

    return m


def compiled_from_gnark(
    r1cs: GnarkR1CS, remap_commitment: bool = False
) -> CompiledR1CS:
    """Decoded gnark constraint list -> flat COO CompiledR1CS.

    Terms with wire CONST_WIRE ride on wire 0 (the constant-1 public
    wire).  No extra rows: gnark's QAP has zeros past nbConstraints.

    remap_commitment: apply commitment_wire_map so the BSB22 challenge
    becomes a public wire and the committed wires are tagged — the result
    feeds OUR setup/prove/verify with the commitment extension (proofs
    under our own keys; the reference ships no pk.aes* to compare against,
    .MISSING_LARGE_BLOBS)."""
    coeffs = r1cs.coeffs
    nb_pub_wires = r1cs.nb_public_wires  # includes "1"
    wmap = commitment_wire_map(r1cs) if remap_commitment else None
    rows = {"a": [], "b": [], "c": []}
    cols = {"a": [], "b": [], "c": []}
    vals = {"a": [], "b": [], "c": []}

    def emit(mat, row, terms):
        for cid, wid in terms:
            c = coeffs[cid]
            if c == 0:
                continue
            w = 0 if wid == CONST_WIRE else wid
            if wmap is not None:
                w = wmap(w)
            rows[mat].append(row)
            cols[mat].append(w)
            vals[mat].append(c)

    row = 0
    for inst in r1cs.instructions:
        if isinstance(inst, R1CInst):
            emit("a", row, inst.l)
            emit("b", row, inst.r)
            emit("c", row, inst.o)
            row += 1
    assert row == r1cs.meta.nb_constraints
    committed = np.zeros(0, dtype=np.int64)
    challenge = np.zeros(0, dtype=np.int64)
    num_public = nb_pub_wires - 1
    if wmap is not None:
        committed = np.asarray(
            sorted(wmap(w) for w in r1cs.committed_wires), dtype=np.int64
        )
        challenge = np.asarray([nb_pub_wires], dtype=np.int64)
        num_public += 1
    return CompiledR1CS(
        num_constraints=row,
        num_vars=r1cs.nb_wires,
        num_public=num_public,
        a_rows=np.asarray(rows["a"], dtype=np.int64),
        a_cols=np.asarray(cols["a"], dtype=np.int64),
        a_coeffs=vals["a"],
        b_rows=np.asarray(rows["b"], dtype=np.int64),
        b_cols=np.asarray(cols["b"], dtype=np.int64),
        b_coeffs=vals["b"],
        c_rows=np.asarray(rows["c"], dtype=np.int64),
        c_cols=np.asarray(cols["c"], dtype=np.int64),
        c_coeffs=vals["c"],
        committed_vars=committed,
        challenge_vars=challenge,
    )


def remap_witness(r1cs: GnarkR1CS, z):
    """Apply commitment_wire_map to a solved gnark witness vector."""
    wmap = commitment_wire_map(r1cs)
    if wmap is None:
        return list(z)
    out = [0] * len(z)
    for w, v in enumerate(z):
        out[wmap(w)] = v
    return out


# ------------------------------------------------------- point conversion


def _g1_arr(points, total: int):
    """List of affine-int (x, y) | None -> ((total,2,16) mont limbs, inf)."""
    arr = np.zeros((total, 2, NLIMBS), dtype=np.uint32)
    inf = np.ones(total, dtype=bool)
    for i, p in enumerate(points):
        if p is None:
            continue
        inf[i] = False
        arr[i, 0] = int_to_limbs(FP.to_mont(p[0]))
        arr[i, 1] = int_to_limbs(FP.to_mont(p[1]))
    return arr, inf


def _g2_arr(points, total: int):
    arr = np.zeros((total, 2, 2, NLIMBS), dtype=np.uint32)
    inf = np.ones(total, dtype=bool)
    for i, p in enumerate(points):
        if p is None:
            continue
        inf[i] = False
        (x0, x1), (y0, y1) = p
        arr[i, 0, 0] = int_to_limbs(FP.to_mont(x0))
        arr[i, 0, 1] = int_to_limbs(FP.to_mont(x1))
        arr[i, 1, 0] = int_to_limbs(FP.to_mont(y0))
        arr[i, 1, 1] = int_to_limbs(FP.to_mont(y1))
    return arr, inf


def _g1_one(p):
    return _g1_arr([p], 1)[0][0]


def _g2_one(p):
    return _g2_arr([p], 1)[0][0]


def proving_key_from_gnark(
    gpk: GnarkProvingKey, num_instance: int
) -> ProvingKey:
    """GnarkProvingKey -> TPU-layout ProvingKey (HBM-ready limb arrays)."""
    nv = gpk.nb_wires
    nv_pad = _next_pow2(nv)
    n = gpk.domain_n
    assert len(gpk.k) == nv - num_instance, "pk.K must cover private wires"
    a_arr, a_inf = _g1_arr(gpk.a, nv_pad)
    b1_arr, b1_inf = _g1_arr(gpk.b1, nv_pad)
    b2_arr, b2_inf = _g2_arr(gpk.b2, nv_pad)
    l_arr, l_inf = _g1_arr([None] * num_instance + gpk.k, nv_pad)
    # un-bit-reverse the Z query (see module docstring): natural-order
    # h_query[bitrev(j)] = Z_file[j]; slot n-1 (== bitrev(n-1)) stays inf.
    logn = n.bit_length() - 1
    z_nat = [None] * n
    for j, p in enumerate(gpk.z):
        z_nat[_bitrev(j, logn)] = p
    h_arr, h_inf = _g1_arr(z_nat, n)
    return ProvingKey(
        n_domain=n,
        num_vars=nv,
        num_instance=num_instance,
        alpha_g1=_g1_one(gpk.alpha_g1),
        beta_g1=_g1_one(gpk.beta_g1),
        delta_g1=_g1_one(gpk.delta_g1),
        beta_g2=_g2_one(gpk.beta_g2),
        delta_g2=_g2_one(gpk.delta_g2),
        a_query=a_arr,
        a_inf=a_inf,
        b_g1_query=b1_arr,
        b_g1_inf=b1_inf,
        b_g2_query=b2_arr,
        b_g2_inf=b2_inf,
        l_query=l_arr,
        l_inf=l_inf,
        h_query=h_arr,
        h_inf=h_inf,
    )


def witness_ternary(z_ints) -> np.ndarray:
    """Solved gnark witness (ints in {0, 1, p-1}) -> (nv,) uint32 ternary
    code {0, 1, 2} for Prover.prove_tern."""
    from ..field.params import P_FR

    zt = np.empty(len(z_ints), dtype=np.uint32)
    for i, v in enumerate(z_ints):
        if v == 0:
            zt[i] = 0
        elif v == 1:
            zt[i] = 1
        elif v == P_FR - 1:
            zt[i] = 2
        else:
            raise ValueError(f"wire {i} is not ternary: {v}")
    return zt


def verifying_key_from_gnark(gvk: GnarkVerifyingKey) -> VerifyingKey:
    """GnarkVerifyingKey -> our pairing-side VerifyingKey.

    Lookup vks (the reference's binary vk.aes128/vk.aes256) carry gnark's
    pedersen PoK pair (G, GRootSigmaNeg) — stored as-is; groth16.verify
    runs the gnark-form check e(D, GRootSigmaNeg) * e(D_sigma, G) == 1.
    gnark appends the commitment wires AFTER the regular publics, so the
    challenge slots are the trailing instance indices (one per commitment).
    NOTE: end-to-end validation against a gnark-produced AES proof is
    impossible in this snapshot (pk.aes* stripped upstream,
    .MISSING_LARGE_BLOBS); the conversion is exercised structurally in
    test_gnark_compat."""
    ncomm = len(gvk.public_and_commitment_committed)
    slots = [len(gvk.ic) - ncomm + i for i in range(ncomm)]
    return VerifyingKey(
        alpha_g1=gvk.alpha_g1,
        beta_g2=gvk.beta_g2,
        gamma_g2=gvk.gamma_g2,
        delta_g2=gvk.delta_g2,
        ic=list(gvk.ic),
        challenge_slots=slots if gvk.pedersen_g is not None else [],
        pedersen_g=gvk.pedersen_g,
        pedersen_g_root_sigma_neg=gvk.pedersen_g_root_sigma_neg,
    )
