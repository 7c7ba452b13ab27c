"""Mini-probe: prepare internals (sort/gather/neg), staged-vs-fixed prove,
same-z (bench protocol) vs varied-z (honest) reps."""

import os
import threading
import time

T0 = time.time()


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


def watchdog():
    time.sleep(float(os.environ.get("PROBE_DEADLINE", "2400")))
    log("WATCHDOG exit")
    os._exit(0)


threading.Thread(target=watchdog, daemon=True).start()

import jax
import jax.numpy as jnp
import numpy as np

log("devices:", jax.devices())

from zktpu.circuits import chacha_v3 as cc
from zktpu.groth16.prove import Prover
from zktpu.groth16.setup import ProvingKey
from zktpu.msm import pippenger as pp
from zktpu.r1cs import serialize as r1cs_ser

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
h0 = retry("h0", lambda: np.asarray(prover._h_scalars(jnp.asarray(z0))))
log("warm ready")

# --- prepare internals: sort vs gathers vs neg (separate jits)
D = pp.FB_NWINDOWS


@jax.jit
def just_digits(S):
    d = pp.scalars_to_signed_digits(S)
    return jnp.abs(d).astype(jnp.uint32).reshape(-1), (d < 0).reshape(-1)


@jax.jit
def just_sort(d_flat):
    return jnp.argsort(d_flat)


def mk_h(counter):
    zi = witness_for(counter)
    return jnp.asarray(np.asarray(prover._h_scalars(jnp.asarray(zi))))


retry("digits", lambda: jax.block_until_ready(just_digits(jnp.asarray(h0))))
retry("sort", lambda: jax.block_until_ready(just_sort(just_digits(jnp.asarray(h0))[0])))
for i in range(3):
    hs = mk_h(40 + i)
    t = time.time()
    df, nf = jax.block_until_ready(just_digits(hs))
    t1 = time.time()
    o = jax.block_until_ready(just_sort(df))
    t2 = time.time()
    log(f"prepare-split rep{i}: digits {1000*(t1-t):.1f} ms, argsort {1000*(t2-t1):.1f} ms")

fb = retry("fb", lambda: pp.FixedBaseMSM(pk.h_query, pk.h_inf, tail=16384))
retry("fb warm", lambda: jax.block_until_ready(fb(jnp.asarray(h0))))


@jax.jit
def gather_neg(QX, QY, QZ, order, nf):
    px = jnp.take(QX, order, axis=0)
    py = jnp.take(QY, order, axis=0)
    pz = jnp.take(QZ, order, axis=0)
    from zktpu.curve import jnp_curve as jc

    py = jnp.where(nf[:, None], jc.FP_OPS.neg(py), py)
    return px, py, pz


retry("gather", lambda: jax.block_until_ready(
    gather_neg(*fb._Q, just_sort(just_digits(jnp.asarray(h0))[0]),
               just_digits(jnp.asarray(h0))[1])))
for i in range(3):
    hs = mk_h(50 + i)
    df, nf = just_digits(hs)
    o = just_sort(df)
    jax.block_until_ready((df, nf, o))
    t = time.time()
    g = jax.block_until_ready(gather_neg(*fb._Q, o, nf))
    log(f"gather+neg rep{i}: {1000*(time.time()-t):.1f} ms")

# --- staged-H prove, varied z (honest protocol)
for i in range(3):
    zi = witness_for(60 + i)
    t = time.time()
    prover.prove(zi, rng_seed=b"pv-%d" % i)
    log(f"prove staged-H varied rep{i}: {1000*(time.time()-t):.1f} ms")

# --- staged-H prove, SAME z (bench r4 protocol — memoization check)
for i in range(3):
    t = time.time()
    prover.prove(z0, rng_seed=b"pf-%d" % i)
    log(f"prove staged-H same-z rep{i}: {1000*(time.time()-t):.1f} ms")

# --- fixed-H prove, varied + same
prover._msm_h_fixed_inst = fb
prover._use_h_fixed = True
retry("warm fixed prove", lambda: prover.prove(z0, rng_seed=b"pw"))
for i in range(3):
    zi = witness_for(70 + i)
    t = time.time()
    prover.prove(zi, rng_seed=b"pg-%d" % i)
    log(f"prove fixed-H varied rep{i}: {1000*(time.time()-t):.1f} ms")
for i in range(3):
    t = time.time()
    prover.prove(z0, rng_seed=b"ph-%d" % i)
    log(f"prove fixed-H same-z rep{i}: {1000*(time.time()-t):.1f} ms")

log("probe_r5c done")
os._exit(0)
