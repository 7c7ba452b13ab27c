"""Benchmark harness (run on the real TPU chip by the driver).

Prints exactly ONE JSON line on stdout:
  {"metric": "chacha20_prove_ms", "value": ..., "unit": "ms",
   "vs_baseline": ...}

Un-timeout-able by construction (VERDICT.md round-1 item 1, hardened after
round 3's first attempt):
  * deadline enforcement is a WATCHDOG THREAD, not SIGALRM — Python signal
    handlers only run between bytecodes of the main thread, so an alarm that
    fires while the main thread is blocked inside an XLA compile wait never
    runs (observed: round-3 bench killed at 1540 s with the 1500 s alarm
    pending and no JSON emitted);
  * the repo ships a prebuilt TPU compile cache (artifacts/jax_cache_tpu/,
    produced by running this very harness) that is seeded into the active
    persistent-cache dir (axon executables reload only partially — budget
    for ~2-3x speedups, not hits);
  * the schedule is PHASED and TIME-GATED (the axon remote-compile helper
    serializes compiles, so parallelism only helps within a phase): staged
    stage graphs -> host-assemble headline -> device assembly -> pipelined
    throughput (compile-free) -> vmapped batch / FixedBaseMSM H only when
    the cache leaves enough budget;
  * every metric records the moment it lands; the emitted JSON carries all
    of them as side fields with the single-proof latency as the headline.

Baseline note (BASELINE.md "Derived estimate"): the reference publishes no
numbers and Go is not installed in this image; the comparison constant below
is derived from the reference's own shipped production pprof profile
(libraries/prover/default.pgo) — gnark ChaChaV3 prove ≈ 45-80 ms on a
16-core CPU, adopted midpoint 60 ms.  vs_baseline > 1 means faster than the
estimate; the emitted JSON labels its source.
"""

import json
import os
import sys
import threading
import time

# the prove latency loop must run the production no-sync dispatch chain:
# per-stage block_until_ready costs a host round trip each over the tunnel;
# the per-stage warmups below measure stage costs explicitly
os.environ.setdefault("ZKTPU_METRICS", "0")

GNARK_16CORE_PROVE_MS_ESTIMATE = 60.0  # ESTIMATE, not measured: see BASELINE.md
# (no Go toolchain in this image, zero egress, and the host has 4 cores, so the
# reference harness cannot run here; this figure is DERIVED from the reference's
# own shipped production pprof profile, libraries/prover/default.pgo — model and
# provenance in BASELINE.md "Derived estimate".  Round 1-3 used an undocumented
# 200 ms figure that the pgo model shows was ~3x too generous to us.)

T0 = time.time()
BEST = {"metric": "chacha20_bench_incomplete", "value": -1.0, "unit": "ms",
        "vs_baseline": 0.0, "vs_baseline_source": "estimate(BASELINE.md)"}
_EMIT_LOCK = threading.Lock()
_DONE = False


def log(*a):
    print(f"[{time.time()-T0:7.1f}s]", *a, file=sys.stderr, flush=True)


def emit_and_exit(rc=0, hard=False):
    global _DONE
    with _EMIT_LOCK:
        if not _DONE:
            _DONE = True
            BEST.pop("_full", None)
            print(json.dumps(BEST), flush=True)
    if hard:
        os._exit(rc)  # bypass blocked main thread / atexit
    sys.exit(rc)


def record(metric, ms, full_prove=False):
    """Record a latency.  Every metric lands in BEST["stages"]; the
    HEADLINE (metric/value/vs_baseline) is a full-prove number once one
    exists — stage metrics only serve as the fallback headline until then
    (round-4 regression: a post-prove stage record must never clobber the
    measured prove latency).

    vs_baseline is only meaningful against the gnark full-prove estimate,
    so stage fallbacks carry 0.0 (ADVICE r3)."""
    BEST.setdefault("stages", {})[metric] = round(ms, 3)
    if full_prove:
        if not BEST.get("_full") or ms < BEST["value"]:
            BEST["metric"] = metric
            BEST["value"] = round(ms, 3)
            BEST["vs_baseline"] = round(GNARK_16CORE_PROVE_MS_ESTIMATE / ms, 3)
            BEST["_full"] = True
    elif not BEST.get("_full"):
        BEST["metric"] = metric
        BEST["value"] = round(ms, 3)
        BEST["vs_baseline"] = 0.0
    log(f"stage metric {metric} = {ms:.2f} ms")


def seed_compile_cache():
    """Link the repo-shipped TPU compile cache into the active cache dir.

    Instrumented (VERDICT r4 item 3): records entries shipped / linked /
    already-present so BENCH_r*.json shows whether the cache was in play;
    every phase below also records its compile seconds into
    BEST["compiles"], making cache effectiveness directly legible."""
    src = os.path.join(os.path.dirname(__file__), "artifacts", "jax_cache_tpu")
    dst = os.environ.get(
        "ZKTPU_JAX_CACHE", os.path.expanduser("~/.cache/zktpu_jax")
    )
    stats = {"shipped": 0, "linked": 0, "present": 0}
    if os.path.isdir(src):
        os.makedirs(dst, exist_ok=True)
        for name in os.listdir(src):
            stats["shipped"] += 1
            d = os.path.join(dst, name)
            if os.path.exists(d):
                stats["present"] += 1
                continue
            try:
                os.link(os.path.join(src, name), d)
            except OSError:
                import shutil

                shutil.copyfile(os.path.join(src, name), d)
            stats["linked"] += 1
    BEST["cache"] = stats
    log(f"compile cache: {stats}")


def compile_mark(name):
    """Context recording a phase's wall time into BEST['compiles']."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        t = time.time()
        yield
        BEST.setdefault("compiles", {})[name] = round(time.time() - t, 1)

    return cm()


def main():
    deadline = float(os.environ.get("BENCH_DEADLINE", "1500"))
    watchdog = threading.Timer(
        deadline, lambda: (log("DEADLINE hit — emitting best partial metric"),
                           emit_and_exit(0, hard=True))
    )
    watchdog.daemon = True
    watchdog.start()

    seed_compile_cache()

    import jax
    import jax.numpy as jnp
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
        r1cs_bytes = r1cs_ser.dumps(cs)
        with open(r1cs_path, "wb") as f:
            f.write(r1cs_bytes)
        pk, vk = setup(cs, seed=b"bench-deterministic")
        pk.bind_r1cs(r1cs_bytes)
        pk.save(pk_path)
        with open(os.path.join(art, "vk.chacha20"), "w") as f:
            json.dump(vk.to_json_dict(), f)
        log(f"keygen done ({time.time()-t0:.1f}s)")

    # the FixedBaseMSM H path costs a ~14-minute cold XLA/Mosaic compile;
    # phase 6 enables it only when enough budget remains (warm cache).
    prover = Prover(cs, pk)
    want_fixed_h = prover._use_h_fixed
    prover._use_h_fixed = False

    # witnesses: one fixed vector for warmups + a pool of VARIED witnesses
    # for the timed reps.  Round-4 reps reused one witness; the relay's
    # byte-identical-dispatch memoization makes that risky (probe_r5c showed
    # no distortion for prove, but varied inputs make the number honest by
    # construction).
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
            ctr, nw, cc.bytes_to_words_be(pt)[None],
            cc.bytes_to_words_be(ct)[None], kw
        )[0]

    t0 = time.time()
    z = witness_for(1)  # stays on device (service behavior)
    np.asarray(z)
    log(f"witness (compile+run) {time.time()-t0:.1f}s")
    t0 = time.time()
    np.asarray(witness_for(2))
    record("chacha20_witness_ms", (time.time() - t0) * 1000.0)

    zj = jnp.asarray(z)
    zpad = prover._pad_bits(z)
    jax.block_until_ready(zpad)

    # --- phased, TIME-GATED schedule.  The axon remote-compile helper
    # serializes compiles, so "warm everything in parallel" only scrambles
    # ordering and pollutes measurements (measured round 4: a prove timed
    # during a concurrent batch compile read 2816 ms vs 581 ms quiet).
    # Order by value-per-compile-second; gate each phase on remaining time:
    #   1. staged-H stage graphs (parallel among themselves)
    #   2. stage metrics + host-assemble prove  -> headline secured
    #   3. device assemble (one packed fetch)   -> honest latency + enables 4
    #   4. pipelined-8 (compile-free)
    #   5. gnark-artifact path                  (VERDICT r5 demanded metric)
    #   6. vmapped batch-8                      (VERDICT r5 demanded metric)
    #   7. FixedBaseMSM H tail=4096             (best-effort: ~staged parity)
    deadline_ts = T0 + deadline

    def remaining():
        return deadline_ts - time.time()

    def warm(name, fn, box=None):
        t = time.time()
        try:
            out = jax.block_until_ready(fn())
            log(f"warm {name}: {time.time()-t:.1f}s")
            if box is not None:
                box.append(out)
        except Exception as e:  # noqa: BLE001 — best-effort warmers
            log(f"warm {name} FAILED: {e!r}")

    stages = {
        "h_scalars": lambda: prover._h_scalars(zj),
        "msm_g1x3": lambda: prover._msm_bits_g1x3(
            prover._g1_stack, prover._g1_stack_inf, zpad
        ),
        "msm_b_g2": lambda: prover._msm_bits_g2(*prover._dev["b_g2_query"], zpad),
        "msm_h": lambda: prover._msm_g1(
            *prover._dev["h_query"], jnp.zeros((prover.n, 16), jnp.uint32)
        ),
    }
    with compile_mark("stage_warmups"):
        threads = [
            threading.Thread(target=warm, args=(nm, fn), daemon=True)
            for nm, fn in stages.items()
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
    log("staged-H stage warmup done")

    def stage(name, fn):
        t = time.time()
        out = jax.block_until_ready(fn())
        record(f"chacha20_{name}_ms", (time.time() - t) * 1000.0)
        return out

    h = stage("h_scalars", lambda: prover._h_scalars(zj))
    stage(
        "msm_g1x3",
        lambda: prover._msm_bits_g1x3(prover._g1_stack, prover._g1_stack_inf, zpad),
    )
    stage("msm_b_g2", lambda: prover._msm_bits_g2(*prover._dev["b_g2_query"], zpad))
    stage("msm_h", lambda: prover._msm_g1(*prover._dev["h_query"], h))

    runs = int(os.environ.get("BENCH_RUNS", "5"))
    # varied-witness pool for honest reps (generated once, kept on device)
    zpool = [z] + [witness_for(100 + i) for i in range(runs)]
    for zi in zpool:
        jax.block_until_ready(zi)

    def measure_prove(tag, **kw):
        t0 = time.time()
        prover.prove(z, rng_seed=b"warmup-%s" % tag, **kw)  # residual compile
        log(f"warmup prove ({tag.decode()}): {time.time()-t0:.1f}s")
        t0 = time.time()
        for i in range(runs):
            prover.prove(zpool[1 + i], rng_seed=b"bench-%s%d" % (tag, i), **kw)
        ms = (time.time() - t0) / runs * 1000.0
        log(f"prove latency ({tag.decode()}): {ms:.1f} ms/proof over {runs} runs")
        return ms

    # --- phase 2: headline number, HOST assembly + staged H (no compile risk)
    prover.assemble_on_host = True
    best_ms = measure_prove(b"host-staged")
    record("chacha20_prove_ms", best_ms, full_prove=True)

    # --- phase 3: device assembly (one packed transfer per proof; the
    # host-assemble path pays FIVE sequential device->host MSM fetches,
    # ~200+ ms over the tunnel — probe_r5d)
    dev_ok = False
    if remaining() > 280:
        with compile_mark("device_assemble"):
            warm("device_assemble",
                 lambda: prover.prove(z, rng_seed=b"warmup-dev",
                                      assemble_on_host=False))
        try:
            ms = measure_prove(b"dev", assemble_on_host=False)
            dev_ok = True
            record("chacha20_prove_ms_device_assemble", ms)
            if ms < best_ms:
                best_ms = ms
                record("chacha20_prove_ms", ms, full_prove=True)
        except Exception as e:  # noqa: BLE001
            log("device assemble failed:", repr(e))
    else:
        log(f"SKIP device assemble: {remaining():.0f}s left < 280s budget")

    # --- phase 4: pipelined throughput — K whole-proof dispatch chains
    # issued back-to-back with ONE fetch each at the end (prove_device).
    # COMPILE-FREE (reuses phase 3's graphs).
    bsz = int(os.environ.get("BENCH_BATCH", "8"))
    if dev_ok:
        try:
            t0 = time.time()
            devs = [
                prover.prove_device(zpool[i % len(zpool)],
                                    rng_seed=b"bench-pipe%d" % i)
                for i in range(bsz)
            ]
            proofs = [prover.finish_proof(d) for d in devs]
            pipe_s = time.time() - t0
            assert len(proofs) == bsz
            amort = pipe_s / bsz * 1000.0
            log(
                f"pipelined{bsz}: {pipe_s*1000:.1f} ms total = "
                f"{bsz/pipe_s:.2f} proofs/s ({amort:.1f} ms/proof)"
            )
            # amortized number stays a SIDE metric (ADVICE r3): the
            # headline remains single-proof latency
            BEST["chacha20_prove_ms_pipelined%d_amortized" % bsz] = round(amort, 3)
        except Exception as e:  # noqa: BLE001
            log("pipelined throughput failed:", repr(e))

    # --- phase 5: the gnark-artifact (drop-in) path on the chip (VERDICT r4
    # item 4): init from the REFERENCE'S OWN pk/r1cs, vectorized witness
    # solver + ternary prove, proof bytes = gnark wire format.
    ref_dir = "/root/reference"
    ref_pk = os.path.join(ref_dir, "circuits", "generated", "pk.chacha20")
    ref_r1 = os.path.join(ref_dir, "circuits", "generated", "r1cs.chacha20")
    if remaining() > 450 and os.path.exists(ref_pk):
        for attempt in (1, 2):
            try:
                from zktpu.api import service as svc_mod

                # staged H for the drop-in prover: its FixedBaseMSM would
                # cost an extra ~280 s of compiles in this phase
                os.environ["ZKTPU_MSM_H_FIXED"] = "0"
                with compile_mark("gnark_init"):
                    gsvc = svc_mod._init_gnark(
                        "chacha20",
                        open(ref_pk, "rb").read(),
                        open(ref_r1, "rb").read(),
                    )
                # witness-solve latency (the item's <50 ms bar)
                t0 = time.time()
                for i in range(5):
                    ct = svc_mod._native_chacha_ct(key, nonce, 50 + i, bytes(64))
                    pub = svc_mod.chacha_public_bits(50 + i, nonce, bytes(64), ct)
                    kb = gsvc._key_bits(key)
                    gsvc._vsolver.solve(pub, kb)
                record("chacha20_gnark_witness_ms", (time.time() - t0) / 5 * 1000.0)
                with compile_mark("gnark_prove"):
                    gsvc.prove(key, nonce, 7, bytes(64))  # tern-graph compile
                t0 = time.time()
                for i in range(3):
                    gsvc.prove(key, nonce, 60 + i, bytes(64))
                record(
                    "chacha20_gnark_artifact_prove_ms",
                    (time.time() - t0) / 3 * 1000.0,
                )
                break
            except Exception as e:  # noqa: BLE001
                log(f"gnark-artifact phase failed (attempt {attempt}):", repr(e))
                if remaining() < 450:
                    break
                time.sleep(10)
    else:
        log(f"SKIP gnark-artifact phase: {remaining():.0f}s left or no reference")

    # --- phase 6: vmapped batch throughput (best amortization, hugest
    # compile: >930s cold, ~half that with the partially-reloading cache.
    # Every metric is already recorded, so a deadline mid-compile here
    # costs NOTHING — the watchdog emits the complete JSON.  Gate low on
    # purpose (round-5 rehearsal had 393s left and skipped at the old
    # 550s gate; this is the VERDICT-demanded metric while phase 7's
    # fixed-H is a measured ~parity gamble, so batch8 gets the budget)
    if remaining() > 300:
        for attempt in (1, 2):
            try:
                zb = np.stack([np.asarray(zp) for zp in (zpool * bsz)[:bsz]])
                seeds = [b"bench-batch%d" % i for i in range(bsz)]
                with compile_mark("batch%d" % bsz):
                    t0 = time.time()
                    prover.prove_batch(zb, seeds)  # compile
                    log(f"batch{bsz} prove compile+run: {time.time()-t0:.1f}s")
                t0 = time.time()
                prover.prove_batch(zb, seeds)
                batch_s = time.time() - t0
                amort = batch_s / bsz * 1000.0
                log(
                    f"batch{bsz} prove: {batch_s*1000:.1f} ms total = "
                    f"{bsz/batch_s:.2f} proofs/s ({amort:.1f} ms/proof)"
                )
                BEST["chacha20_prove_ms_batch%d_amortized" % bsz] = round(amort, 3)
                break
            except Exception as e:  # noqa: BLE001 — best-effort
                log(f"batch prove failed (attempt {attempt}):", repr(e))
                if remaining() < 300:
                    break
                time.sleep(10)
    else:
        log(f"SKIP vmapped batch{bsz}: {remaining():.0f}s left < 300s budget")

    # --- phase 7: FixedBaseMSM H, tail=4096 (probe_r5d: 151 s compile,
    # ~310 ms/call — roughly staged-H parity on this chip, so it runs LAST
    # as a best-effort improvement, after the round's demanded metrics)
    if want_fixed_h and remaining() > 320:
        from zktpu.msm import pippenger as pp

        for attempt in (1, 2):  # remote_compile flakes transiently (INTERNAL
            try:                # "response body closed"); one retry
                with compile_mark("fixed_h"):
                    t0 = time.time()
                    inst = pp.FixedBaseMSM(pk.h_query, pk.h_inf, tail=4096)
                    jax.block_until_ready(
                        inst(jnp.ones((prover.n, 16), jnp.uint32))
                    )
                    log(f"warm fixed_h: {time.time()-t0:.1f}s")
                prover._msm_h_fixed_inst = inst
                prover._use_h_fixed = True
                stage("msm_h_fixed", lambda: prover._msm_h_fixed(h))
                ms = measure_prove(
                    b"dev-fixedh" if dev_ok else b"host-fixedh",
                    assemble_on_host=not dev_ok,
                )
                record("chacha20_prove_ms_fixed_h", ms)
                if ms < best_ms:
                    best_ms = ms
                    record("chacha20_prove_ms", ms, full_prove=True)
                break
            except Exception as e:  # noqa: BLE001 — best-effort improvement
                log(f"fixed-base H failed (attempt {attempt}):", repr(e))
                if remaining() < 320:
                    break
                time.sleep(10)
    elif want_fixed_h:
        log(f"SKIP fixed-base H: {remaining():.0f}s left < 320s budget")

    from zktpu.utils import metrics

    if metrics.enabled():
        log("stage metrics:", metrics.dump_json())
    emit_and_exit(0)


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except Exception as e:  # noqa: BLE001 — always leave a JSON line behind
        log("FATAL:", repr(e))
        import traceback

        traceback.print_exc(file=sys.stderr)
        emit_and_exit(0)
