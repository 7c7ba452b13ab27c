"""Benchmark harness (run on the real TPU chip by the driver).

Prints exactly ONE JSON line on stdout:
  {"metric": "chacha20_prove_core_ms", "value": ..., "unit": "ms",
   "vs_baseline": ...}
Diagnostics go to stderr.

Baseline note (BASELINE.md): the reference publishes no numbers and Go is not
installed in this image, so the comparison constant below is the documented
ESTIMATE of gnark's ChaChaV3 prove on a 16-core CPU (~200 ms per 64-byte
proof, i.e. ~5 proofs/s), to be replaced by a measured value when a Go
toolchain is available.  vs_baseline > 1 means faster than the estimate.
"""

import json
import os
import sys
import time

GNARK_16CORE_PROVE_MS_ESTIMATE = 200.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import numpy as np

    log("devices:", jax.devices())

    from zktpu.circuits import chacha_v3 as cc
    from zktpu.groth16.prove import Prover
    from zktpu.groth16.setup import ProvingKey, setup
    from zktpu.r1cs import serialize as r1cs_ser

    art = os.path.join(os.path.dirname(__file__), "artifacts", "generated")
    os.makedirs(art, exist_ok=True)
    r1cs_path = os.path.join(art, "r1cs.chacha20")
    pk_path = os.path.join(art, "pk.chacha20.npz")

    t0 = time.time()
    if os.path.exists(r1cs_path) and os.path.exists(pk_path):
        cs = r1cs_ser.load(r1cs_path)
        pk = ProvingKey.load(pk_path)
        log(f"artifacts loaded ({time.time()-t0:.1f}s)")
    else:
        builder = cc.synthesize()
        cs = builder.compile()
        r1cs_ser.save(cs, r1cs_path)
        pk, vk = setup(cs, seed=b"bench-deterministic")
        pk.save(pk_path)
        import json as _json

        with open(os.path.join(art, "vk.chacha20"), "w") as f:
            _json.dump(vk.to_json_dict(), f)
        log(f"keygen done ({time.time()-t0:.1f}s)")

    prover = Prover(cs, pk)

    # witness for a fixed vector
    key = bytes(range(32))
    nonce = bytes.fromhex("000000090000004a00000000")
    counter = 1
    kw = cc.bytes_to_words_le(key)[None]
    nw = cc.bytes_to_words_le(nonce)[None]
    ctr = np.array([counter], dtype=np.uint32)
    ks = np.asarray(cc.chacha20_block_words(kw, ctr, nw))[0]
    pt = bytes(64)
    ct = bytes(a ^ b for a, b in zip(pt, cc.words_to_bytes_le(ks)))
    z = np.asarray(
        cc.witness_bits(
            ctr, nw, cc.bytes_to_words_be(pt)[None], cc.bytes_to_words_be(ct)[None], kw
        )
    )[0]

    # warm-up (compiles + caches every stage)
    t0 = time.time()
    proof = prover.prove(z, rng_seed=b"warmup")
    log(f"warmup prove (incl. compile): {time.time()-t0:.1f}s")

    runs = int(os.environ.get("BENCH_RUNS", "3"))
    t0 = time.time()
    for i in range(runs):
        prover.prove(z, rng_seed=b"bench%d" % i)
    per_proof_ms = (time.time() - t0) / runs * 1000.0
    log(f"prove latency: {per_proof_ms:.1f} ms/proof over {runs} runs")
    from zktpu.utils.metrics import dump_json

    log("stage metrics:", dump_json())

    print(
        json.dumps(
            {
                "metric": "chacha20_prove_ms",
                "value": round(per_proof_ms, 2),
                "unit": "ms",
                "vs_baseline": round(GNARK_16CORE_PROVE_MS_ESTIMATE / per_proof_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
