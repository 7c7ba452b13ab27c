"""Keygen CLI: compile circuits + trusted setup + artifact emission.

Reference analog: /root/reference/keygen.go (main -> generateChaChaV3/...,
keygen.go:74-77,324-435): compile each production circuit, print the
constraint count, run Groth16 setup, write r1cs/pk for the prover and vk for
the verifier.

Usage:  python -m zktpu.keygen [--out artifacts/generated] [--seed HEX]
        [--ciphers chacha20,aes-128-ctr,aes-256-ctr]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def generate_chacha20(out_dir: str, seed: bytes | None):
    from .circuits import chacha_v3
    from .groth16 import setup as g16_setup
    from .r1cs import serialize as r1cs_ser

    t0 = time.time()
    builder = chacha_v3.synthesize()
    cs = builder.compile()
    print(
        f"chacha20: {cs.num_constraints} constraints, {cs.num_vars} vars, "
        f"{cs.num_public} public ({time.time() - t0:.1f}s)"
    )
    r1cs_bytes = r1cs_ser.dumps(cs)
    with open(os.path.join(out_dir, "r1cs.chacha20"), "wb") as f:
        f.write(r1cs_bytes)
    # gnark-consumable constraint system (keygen.go:324-435 writes the cs
    # via gnark's WriteTo; this is that binary, readable by gnark clients —
    # format pinned byte-exactly in tests/test_gnark_r1cs_writer.py)
    from .compat.gnark_r1cs_write import export_gnark_r1cs

    gnark_bytes = export_gnark_r1cs(
        builder,
        [f"Public_{i}" for i in range(builder.num_public)],
        [f"Key_{i}" for i in range(len(builder.secret_vars))],
    )
    with open(os.path.join(out_dir, "r1cs.chacha20.gnark"), "wb") as f:
        f.write(gnark_bytes)
    t0 = time.time()
    pk, vk = g16_setup.setup(cs, seed=seed)
    print(f"chacha20: setup done ({time.time() - t0:.1f}s)")
    pk.bind_r1cs(r1cs_bytes)  # pk<->r1cs integrity (prove_impl.go:27-43 done right)
    pk.save(os.path.join(out_dir, "pk.chacha20"))
    with open(os.path.join(out_dir, "vk.chacha20"), "w") as f:
        json.dump(vk.to_json_dict(), f)
    print("chacha20: artifacts written")


def _generate_aes(cipher: str, short: str):
    def gen(out_dir: str, seed: bytes | None):
        from .circuits import aes_v2
        from .groth16 import setup as g16_setup
        from .r1cs import serialize as r1cs_ser

        t0 = time.time()
        builder = aes_v2.synthesize(cipher)
        cs = builder.compile()
        print(
            f"{cipher}: {cs.num_constraints} constraints, {cs.num_vars} vars, "
            f"{cs.num_public} public, {len(cs.committed_vars)} committed "
            f"({time.time() - t0:.1f}s)"
        )
        r1cs_bytes = r1cs_ser.dumps(cs)
        with open(os.path.join(out_dir, f"r1cs.{short}"), "wb") as f:
            f.write(r1cs_bytes)
        t0 = time.time()
        pk, vk = g16_setup.setup(cs, seed=seed)
        print(f"{cipher}: setup done ({time.time() - t0:.1f}s)")
        pk.bind_r1cs(r1cs_bytes)
        pk.save(os.path.join(out_dir, f"pk.{short}"))
        with open(os.path.join(out_dir, f"vk.{short}"), "w") as f:
            json.dump(vk.to_json_dict(), f)
        print(f"{cipher}: artifacts written")

    return gen


GENERATORS = {
    "chacha20": generate_chacha20,
    "aes-128-ctr": _generate_aes("aes-128-ctr", "aes128"),
    "aes-256-ctr": _generate_aes("aes-256-ctr", "aes256"),
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="artifacts/generated")
    ap.add_argument("--seed", default=None, help="hex seed for deterministic setup (tests only)")
    ap.add_argument("--ciphers", default="chacha20")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    seed = bytes.fromhex(args.seed) if args.seed else None
    for name in args.ciphers.split(","):
        GENERATORS[name](args.out, seed)


if __name__ == "__main__":
    main()
