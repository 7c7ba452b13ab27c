"""Stage-split probe: find the r4->r5 prove regression; validate the new
prepare (CLA recode + pre-negated-Y gather) on chip; tail=4096 compile."""

import os
import threading
import time

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


def watchdog():
    time.sleep(float(os.environ.get("PROBE_DEADLINE", "2700")))
    log("WATCHDOG exit")
    os._exit(0)


threading.Thread(target=watchdog, daemon=True).start()

import jax
import jax.numpy as jnp
import numpy as np

log("devices:", jax.devices())

from zktpu.circuits import chacha_v3 as cc
from zktpu.curve import jnp_curve as jc
from zktpu.curve import ref_ec as ec
from zktpu.field.jnp_field import JnpField
from zktpu.field.params import FR
from zktpu.groth16.prove import Prover
from zktpu.groth16.setup import ProvingKey
from zktpu.msm import pippenger as pp
from zktpu.ntt.ntt import coset_intt, coset_ntt, intt
from zktpu.r1cs import serialize as r1cs_ser

F = JnpField(FR)
art = os.path.join(os.path.dirname(__file__), "..", "artifacts", "generated")
cs = r1cs_ser.load(os.path.join(art, "r1cs.chacha20"))
pk = ProvingKey.load(os.path.join(art, "pk.chacha20.npz"))
prover = Prover(cs, pk, assemble_on_host=True)
prover._use_h_fixed = False

key = bytes(range(32))
nonce = bytes.fromhex("000000090000004a00000000")
kw = cc.bytes_to_words_le(key)[None]
nw = cc.bytes_to_words_le(nonce)[None]


def witness_for(counter):
    ctr = np.array([counter], dtype=np.uint32)
    ks = np.asarray(cc.chacha20_block_words(kw, ctr, nw))[0]
    pt = bytes(64)
    ct = bytes(a ^ b for a, b in zip(pt, cc.words_to_bytes_le(ks)))
    return cc.witness_bits(
        ctr, nw, cc.bytes_to_words_be(pt)[None], cc.bytes_to_words_be(ct)[None], kw
    )[0]


def retry(tag, fn, attempts=3):
    for k in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            log(f"{tag} attempt {k+1} failed: {e!r}")
            if k == attempts - 1:
                raise
            time.sleep(20)


z0 = retry("witness", lambda: witness_for(1))
np.asarray(z0)

# --- old (unfused) quotient replica for A/B


@jax.jit
def h_old(zbits):
    az, bz, czv = prover._matvecs_bits(zbits)
    d = prover.domain
    cos = coset_ntt(intt(jnp.stack([az, bz, czv]), d), d)
    prod = F.sub(F.mont_mul(cos[0], cos[1]), cos[2])
    h_cos = F.mont_mul(prod, jnp.asarray(d.z_coset_inv_mont))
    h = coset_intt(h_cos, d)
    h = h.at[-1].set(jnp.zeros(16, jnp.uint32))
    return F.from_mont(h)


retry("h_new warm", lambda: jax.block_until_ready(prover._h_scalars(jnp.asarray(z0))))
retry("h_old warm", lambda: jax.block_until_ready(h_old(jnp.asarray(z0))))
for i in range(3):
    zi = jnp.asarray(np.asarray(witness_for(100 + i)))
    t = time.time()
    jax.block_until_ready(prover._h_scalars(zi))
    t1 = time.time()
    jax.block_until_ready(h_old(zi))
    t2 = time.time()
    log(f"h_scalars rep{i}: fused {1000*(t1-t):.1f} ms, unfused {1000*(t2-t1):.1f} ms")

# --- witness-MSM stages
zpad0 = prover._pad_bits(z0)
retry("g1x3 warm", lambda: jax.block_until_ready(
    prover._msm_bits_g1x3(prover._g1_stack, prover._g1_stack_inf, zpad0)))
retry("b_g2 warm", lambda: jax.block_until_ready(
    prover._msm_bits_g2(*prover._dev["b_g2_query"], zpad0)))
for i in range(3):
    zp = prover._pad_bits(witness_for(110 + i))
    jax.block_until_ready(zp)
    t = time.time()
    jax.block_until_ready(prover._msm_bits_g1x3(prover._g1_stack, prover._g1_stack_inf, zp))
    t1 = time.time()
    jax.block_until_ready(prover._msm_bits_g2(*prover._dev["b_g2_query"], zp))
    t2 = time.time()
    log(f"wmsm rep{i}: g1x3 {1000*(t1-t):.1f} ms, b_g2 {1000*(t2-t1):.1f} ms")

# --- new fixed-H (CLA recode + Ycat gather), tail=16384
fb = retry("fb", lambda: pp.FixedBaseMSM(pk.h_query, pk.h_inf, tail=16384))
h0 = jnp.asarray(np.asarray(prover._h_scalars(jnp.asarray(z0))))
t = time.time()
retry("fb warm", lambda: jax.block_until_ready(fb(h0)))
log(f"fixed_h warm {time.time()-t:.1f}s")
for i in range(3):
    hs = jnp.asarray(np.asarray(prover._h_scalars(jnp.asarray(witness_for(120 + i)))))
    t = time.time()
    prep = jax.block_until_ready(fb._prepare(*fb._Q, hs))
    t1 = time.time()
    B = jax.block_until_ready(fb._tree(*prep))
    t2 = time.time()
    r = jax.block_until_ready(fb._reduce(*B))
    t3 = time.time()
    log(f"fixed_h stages rep{i}: prepare {1000*(t1-t):.1f} tree {1000*(t2-t1):.1f} "
        f"reduce {1000*(t3-t2):.1f} ms")

# correctness spot-check vs staged (already compiled earlier rounds)
s0 = retry("staged", lambda: prover._msm_g1(*prover._dev["h_query"], h0))
a = jc.limbs_to_g1(tuple(np.asarray(c) for c in fb(h0)))
b = jc.limbs_to_g1(tuple(np.asarray(c) for c in s0))
ok = ec.G1_CURVE.eq(a, b)
log(f"new-prepare fixed_h == staged: {ok}")
if not ok:
    os._exit(1)

# --- host-assemble cost in isolation
from zktpu.groth16 import ref_prove  # noqa: E402

h_msm = fb(h0)
g1x3 = prover._msm_bits_g1x3(prover._g1_stack, prover._g1_stack_inf, zpad0)
b2 = prover._msm_bits_g2(*prover._dev["b_g2_query"], zpad0)
am = tuple(t[0] for t in g1x3)
b1m = tuple(t[1] for t in g1x3)
lm = tuple(t[2] for t in g1x3)
jax.block_until_ready((h_msm, g1x3, b2))
for i in range(2):
    t = time.time()
    prover._assemble(am, b1m, b2, lm, h_msm, rng_seed=b"as-%d" % i, on_host=True)
    log(f"host assemble rep{i}: {1000*(time.time()-t):.1f} ms")

# --- full prove with new fixed-H
prover._msm_h_fixed_inst = fb
prover._use_h_fixed = True
retry("prove warm", lambda: prover.prove(z0, rng_seed=b"pw"))
for i in range(4):
    zi = witness_for(130 + i)
    t = time.time()
    prover.prove(zi, rng_seed=b"pp-%d" % i)
    log(f"prove fixed-H varied rep{i}: {1000*(time.time()-t):.1f} ms")

# --- tail=4096 gamble if time remains
if time.time() - T0 < 1500:
    try:
        fb4 = pp.FixedBaseMSM(pk.h_query, pk.h_inf, tail=4096)
        t = time.time()
        jax.block_until_ready(fb4(h0))
        log(f"fixed_h tail=4096 compile+run {time.time()-t:.1f}s")
        for i in range(3):
            hs = jnp.asarray(np.asarray(prover._h_scalars(jnp.asarray(witness_for(140 + i)))))
            t = time.time()
            jax.block_until_ready(fb4(hs))
            log(f"fixed_h tail=4096 rep{i}: {1000*(time.time()-t):.1f} ms")
    except Exception as e:  # noqa: BLE001
        log("tail=4096 failed:", repr(e))

log("probe_r5d done")
os._exit(0)
