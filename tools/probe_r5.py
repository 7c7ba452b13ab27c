"""Round-5 TPU probe: signed FixedBaseMSM + fused quotient, measured on chip.

Run (one TPU process at a time; check ps first):
  cd /root/repo && nohup python -u tools/probe_r5.py > /tmp/probe_r5.log 2>&1 &

Rules (memory: axon-tpu-tunnel-benchmarking): in-process watchdog with
os._exit, vary inputs between reps (the relay memoizes byte-identical
dispatches), force an np.asarray fetch per rep.
"""

import os
import sys
import threading
import time

T0 = time.time()
DEADLINE = float(os.environ.get("PROBE_DEADLINE", "3000"))


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, flush=True)


def watchdog():
    time.sleep(DEADLINE)
    log("WATCHDOG: deadline hit, exiting cleanly")
    os._exit(0)


threading.Thread(target=watchdog, daemon=True).start()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def retry(tag, fn, attempts=3):
    """The axon remote-compile helper flakes transiently (INTERNAL:
    'response body closed') — retry like bench.py does."""
    for k in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            log(f"{tag} attempt {k+1} failed: {e!r}")
            if k == attempts - 1:
                raise
            time.sleep(20)

log("devices:", jax.devices())

from zktpu.circuits import chacha_v3 as cc  # noqa: E402
from zktpu.groth16.prove import Prover  # noqa: E402
from zktpu.groth16.setup import ProvingKey  # noqa: E402
from zktpu.msm import pippenger as pp  # noqa: E402
from zktpu.curve import jnp_curve as jc  # noqa: E402
from zktpu.r1cs import serialize as r1cs_ser  # noqa: E402

art = os.path.join(os.path.dirname(__file__), "..", "artifacts", "generated")
cs = r1cs_ser.load(os.path.join(art, "r1cs.chacha20"))
pk = ProvingKey.load(os.path.join(art, "pk.chacha20.npz"))
log("artifacts loaded")

prover = Prover(cs, pk, assemble_on_host=True)
prover._use_h_fixed = False  # manual control below

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

t = time.time()
z0 = retry("witness", lambda: witness_for(1))
np.asarray(z0)
log(f"witness compile+run {time.time()-t:.1f}s")

# --- fused h_scalars (NEW graph this round)
t = time.time()
h0 = retry("h_scalars", lambda: np.asarray(prover._h_scalars(jnp.asarray(z0))))
log(f"h_scalars(fused) compile+run {time.time()-t:.1f}s")
for i in range(3):
    zi = witness_for(2 + i)
    t = time.time()
    hi = prover._h_scalars(jnp.asarray(zi))
    np.asarray(hi)
    log(f"h_scalars(fused) rep{i} {1000*(time.time()-t):.1f} ms (incl fetch)")

# --- signed FixedBaseMSM (NEW), tail from env
tail = int(os.environ.get("PROBE_TAIL", "16384"))
t = time.time()
fb = retry("fixed_h_precompute", lambda: pp.FixedBaseMSM(pk.h_query, pk.h_inf, tail=tail))
jax.block_until_ready(fb._Q)
log(f"fixed_h(signed, tail={tail}) precompute {time.time()-t:.1f}s")
t = time.time()
r0 = retry("fixed_h", lambda: fb(jnp.asarray(np.asarray(h0))))
np.asarray(r0[0])
log(f"fixed_h compile+run {time.time()-t:.1f}s")
times = []
outs = []
for i in range(4):
    zi = witness_for(10 + i)
    hi_np = np.asarray(prover._h_scalars(jnp.asarray(zi)))
    t = time.time()
    ri = fb(jnp.asarray(hi_np))
    fetched = tuple(np.asarray(c) for c in ri)
    dt = 1000 * (time.time() - t)
    times.append(dt)
    outs.append((hi_np, fetched))
    log(f"fixed_h rep{i} {dt:.1f} ms (incl fetch)")
log(f"fixed_h median-ish {sorted(times)[len(times)//2]:.1f} ms")

# --- per-stage split of the fixed-H call (block_until_ready each)
import jax as _jax
for i in range(3):
    zi = witness_for(20 + i)
    hs = jnp.asarray(np.asarray(prover._h_scalars(jnp.asarray(zi))))
    t = time.time()
    prep = _jax.block_until_ready(fb._prepare(*fb._Q, hs))
    t1 = time.time()
    B = _jax.block_until_ready(fb._tree(*prep))
    t2 = time.time()
    r = _jax.block_until_ready(fb._reduce(*B))
    t3 = time.time()
    log(f"fixed_h stages rep{i}: prepare {1000*(t1-t):.1f} ms, "
        f"tree {1000*(t2-t1):.1f} ms, reduce {1000*(t3-t2):.1f} ms")

# --- cross-check vs the staged generic MSM (unchanged graph, r4-cached)
if os.environ.get("PROBE_CHECK", "1") == "1":
    t = time.time()
    hq = prover._dev["h_query"]
    s0 = retry("staged_msm_h", lambda: prover._msm_g1(*hq, jnp.asarray(outs[0][0])))
    np.asarray(s0[0])
    log(f"staged msm_h compile+run {time.time()-t:.1f}s")
    a = jc.limbs_to_g1(tuple(np.asarray(c) for c in outs[0][1]))
    b = jc.limbs_to_g1(tuple(np.asarray(c) for c in s0))
    from zktpu.curve import ref_ec as ec

    ok = ec.G1_CURVE.eq(a, b)
    log(f"fixed_h == staged msm_h on chip: {ok}")
    if not ok:
        log("MISMATCH — do not ship")
        os._exit(1)

# --- full prove latency (host assemble, fixed H)
prover._msm_h_fixed_inst = fb
prover._use_h_fixed = True
t = time.time()
p = retry("prove_warm", lambda: prover.prove(z0, rng_seed=b"probe-warm"))
log(f"prove(fixed_h, host-assemble) warm-chain {time.time()-t:.1f}s")
for i in range(4):
    zi = witness_for(30 + i)
    t = time.time()
    prover.prove(zi, rng_seed=b"probe-%d" % i)
    log(f"prove rep{i} {1000*(time.time()-t):.1f} ms")

log("probe done")
os._exit(0)
