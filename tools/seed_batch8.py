import os, time, json
import sys; sys.path.insert(0, "/root/repo")
os.environ.setdefault("ZKTPU_METRICS", "0")
import numpy as np, jax
t00=time.time()
def log(m): print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)
from zktpu.circuits import chacha_v3 as cc
from zktpu.groth16.prove import Prover
from zktpu.groth16.setup import ProvingKey
from zktpu.r1cs import serialize as r1cs_ser
art = "/root/repo/artifacts/generated"
cs = r1cs_ser.load(os.path.join(art, "r1cs.chacha20"))
pk = ProvingKey.load(os.path.join(art, "pk.chacha20.npz"))
prover = Prover(cs, pk); prover._use_h_fixed = False
log("artifacts loaded")
key = bytes(range(32)); nonce = bytes.fromhex("000000090000004a00000000")
kw = cc.bytes_to_words_le(key)[None]; nw = cc.bytes_to_words_le(nonce)[None]
def witness_for(counter):
    ctr = np.array([counter], dtype=np.uint32)
    ks = np.asarray(cc.chacha20_block_words(kw, ctr, nw))[0]
    pt = bytes(64)
    ct = bytes(a ^ b for a, b in zip(pt, cc.words_to_bytes_le(ks)))
    return cc.witness_bits(ctr, nw, cc.bytes_to_words_be(pt)[None],
                           cc.bytes_to_words_be(ct)[None], kw)[0]
zpool = [witness_for(100+i) for i in range(6)]
zb = np.stack([np.asarray(zp) for zp in (zpool*8)[:8]])
seeds = [b"bench-batch%d" % i for i in range(8)]
log("witnesses ready; compiling prove_batch(8)")
t0=time.time()
prover.prove_batch(zb, seeds)
log(f"batch8 compile+run: {time.time()-t0:.1f}s")
t0=time.time()
prover.prove_batch(zb, seeds)
dt=time.time()-t0
log(f"batch8 warm: {dt*1000:.0f} ms total = {dt/8*1000:.1f} ms/proof")
