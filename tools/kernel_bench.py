"""Per-kernel speed-of-light benchmark table (BASELINE.json requirement:
"every field-arithmetic kernel benchmarked ... ops/s at 1 chip").

Measures, on whatever backend is active (the real TPU chip under the axon
tunnel, or CPU):
  * Fr/Fp Montgomery mul — u32 16-bit-limb path and (on TPU) the Pallas
    f32 8-bit-digit path;
  * G1 / G2 Jacobian point_add;
  * NTT (radix-2, 32768) butterfly throughput;
  * MSM points/s: generic 8-bit StagedMSM and the 16-bit FixedBaseMSM.

Methodology notes (hard-won on the axon tunnel):
  * vary inputs between repetitions — the relay memoizes byte-identical
    dispatches, so repeating one input reads back a cached result;
  * amortize over K dispatches and force ONE final device->host fetch
    (block_until_ready alone under-measures on the tunnel).

Writes/updates BENCHMARKS.md at the repo root and prints the table.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import zktpu  # noqa: E402  (compile cache config)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from zktpu.curve import jnp_curve as jc  # noqa: E402
from zktpu.curve import ref_ec as ec  # noqa: E402
from zktpu.field import limb  # noqa: E402
from zktpu.field.jnp_field import JnpField  # noqa: E402
from zktpu.field.params import FR, FP  # noqa: E402
from zktpu.msm import pippenger as pp  # noqa: E402
from zktpu.ntt.ntt import Domain, ntt  # noqa: E402

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def amortized(fn, inputs, fetch, reps):
    """Dispatch fn over varied inputs; ONE final fetch closes the chain."""
    out = None
    t0 = time.time()
    for i in range(reps):
        out = fn(*inputs[i % len(inputs)])
    np.asarray(fetch(out))
    return (time.time() - t0) / reps


ROWS = []


def bench(name, unit_count, fn, inputs, fetch=lambda o: o, reps=8):
    # compile + warm
    t0 = time.time()
    np.asarray(fetch(fn(*inputs[0])))
    compile_s = time.time() - t0
    dt = amortized(fn, inputs[1:], fetch, reps)
    ops = unit_count / dt
    ROWS.append((name, unit_count, dt * 1e3, ops))
    log(f"{name}: {dt*1e3:.2f} ms/call -> {ops/1e6:.1f} M ops/s "
        f"(compile {compile_s:.0f}s)")


def main():
    backend = jax.default_backend()
    log(f"backend: {backend} devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    Ff = JnpField(FR)

    # ---- Montgomery mul (u32 limb path), batch 1M
    NMUL = 1 << 20
    def rand_mont(n):
        return jnp.asarray(
            rng.integers(0, 1 << 16, size=(n, 16), dtype=np.int64).astype(np.uint32)
        )
    ins = [(rand_mont(NMUL), rand_mont(NMUL)) for _ in range(4)]
    mm = jax.jit(Ff.mont_mul)
    bench("fr_mont_mul (1M lanes, JnpField dispatch)", NMUL, mm, ins, fetch=lambda o: o[0])

    if backend != "cpu":
        from zktpu.curve import pallas_f32

        try:
            mmf = jax.jit(lambda a, b: pallas_f32.mont_mul(a, b, field="fp"))
            bench("fp_mont_mul_pallas_f32 (1M lanes)", NMUL, mmf, ins,
                  fetch=lambda o: o[0])
        except Exception as e:  # noqa: BLE001
            log(f"pallas mont_mul bench skipped: {e!r}")

    # ---- G1 / G2 point_add, batch 128k / 16k
    NPA = 1 << 17
    base = ec.G1_CURVE.mul(ec.G1_GEN, 12345)
    P1 = jc.g1_to_limbs([base])[0]
    def g1batch():
        X = jnp.asarray(np.broadcast_to(P1[0], (NPA, 16)).copy())
        Y = jnp.asarray(np.broadcast_to(P1[1], (NPA, 16)).copy())
        Z = jnp.asarray(np.broadcast_to(jc._one_cached(False), (NPA, 16)).copy())
        # vary by scaling Z with random field elements (still valid points)
        return X, Y, Z
    pa = jax.jit(lambda a, b: jc.point_add(jc.G1, a, b))
    ins = []
    for _ in range(4):
        A, B = g1batch(), g1batch()
        # vary inputs: randomize one limb lane (keeps dispatch bytes unique)
        A = (A[0].at[0, 0].set(int(rng.integers(0, 1 << 16))), A[1], A[2])
        ins.append((A, B))
    bench(f"g1_point_add ({NPA//1024}k lanes)", NPA, pa, ins,
          fetch=lambda o: o[0])

    NPA2 = 1 << 14
    base2 = ec.G2_CURVE.mul(ec.G2_GEN, 9876)
    P2 = jc.g2_to_limbs([base2])[0]
    one2 = jc._one_cached(True)
    def g2batch():
        X = jnp.asarray(np.broadcast_to(P2[0], (NPA2, 2, 16)).copy())
        Y = jnp.asarray(np.broadcast_to(P2[1], (NPA2, 2, 16)).copy())
        Z = jnp.asarray(np.broadcast_to(one2, (NPA2, 2, 16)).copy())
        return X, Y, Z
    pa2 = jax.jit(lambda a, b: jc.point_add(jc.G2, a, b))
    ins = []
    for _ in range(4):
        A, B = g2batch(), g2batch()
        A = (A[0].at[0, 0, 0].set(int(rng.integers(0, 1 << 16))), A[1], A[2])
        ins.append((A, B))
    bench(f"g2_point_add ({NPA2//1024}k lanes)", NPA2, pa2, ins,
          fetch=lambda o: o[0])

    # ---- NTT 32768 (butterflies = n/2 * log2 n)
    NN = 32768
    d = Domain(NN)
    nt = jax.jit(lambda x: ntt(x, d))
    ins = [(rand_mont(NN),) for _ in range(4)]
    bench(f"ntt_{NN} (radix-2)", NN // 2 * 15, nt, ins)

    # ---- MSM points/s (32768 random scalars)
    NM = 32768
    Pts = np.broadcast_to(P1, (NM, 2, 16)).copy()
    infm = np.zeros(NM, bool)
    msm = pp.StagedMSM(jc.G1)
    Pj, infj = jnp.asarray(Pts), jnp.asarray(infm)
    ins = [(Pj, infj, rand_mont(NM)) for _ in range(4)]
    bench(f"msm_generic_8bit ({NM} pts)", NM, lambda p, i, s: msm(p, i, s),
          ins, fetch=lambda o: o[0], reps=4)

    fb = pp.FixedBaseMSM(Pts, infm)
    ins = [(rand_mont(NM),) for _ in range(4)]
    bench(f"msm_fixedbase_16bit ({NM} pts)", NM, fb, ins,
          fetch=lambda o: o[0], reps=4)

    # ---- write table
    lines = [
        "# Kernel benchmarks (speed-of-light table)",
        "",
        f"Backend: **{backend}** ({jax.devices()[0].device_kind if jax.devices() else '?'}); "
        f"methodology in tools/kernel_bench.py (amortized, varied inputs, "
        f"forced final fetch).",
        "",
        "| kernel | units/call | ms/call | ops/s |",
        "|---|---|---|---|",
    ]
    for name, units, ms, ops in ROWS:
        lines.append(f"| {name} | {units} | {ms:.2f} | {ops:,.0f} |")
    out = "\n".join(lines) + "\n"
    path = os.path.join(os.path.dirname(__file__), "..", "BENCHMARKS.md")
    with open(path, "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
