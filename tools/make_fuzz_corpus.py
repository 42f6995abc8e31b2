"""Synthesize the fuzz seed corpus for native/fuzz_native.cpp.

Seed format: [1 byte precompile index][calldata], index into the
FHE_PRECOMPILE_LIST order (c_fhe.h).  Two seed classes:

* small malformed shapes (the error-matrix corpus) — checked into git;
* full valid calldata for one op per shape family — synthesized here at
  run time (each carries the ~400 KB network pk; too big to check in),
  so mutations start from inputs that reach the deep parse/compute paths.

Usage: python tools/make_fuzz_corpus.py <corpus_dir>
"""
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from fhe_precompiles_tpu import pack  # noqa: E402
from fhe_precompiles_tpu.app import _CT_CODEC  # noqa: E402
from fhe_precompiles_tpu.encoding import PLAIN_TYPES  # noqa: E402
from fhe_precompiles_tpu.testnet import one  # noqa: E402

# FHE_PRECOMPILE_LIST order (c_fhe.h) — index 0..48
NAMES = []
for t in ("u256", "u64", "i64", "frac64"):
    c = f"cipher{t}"
    for op in ("add", "sub", "mul"):
        NAMES += [f"{op}_{c}_{c}", f"{op}_{c}_{t}", f"{op}_{t}_{c}"]
NAMES += [f"encrypt_{t}" for t in ("u256", "u64", "i64", "frac64")]
NAMES += [f"reencrypt_{t}" for t in ("u256", "u64", "i64", "frac64")]
NAMES += [f"decrypt_{t}" for t in ("u256", "u64", "i64", "frac64")]
NAMES += ["public_key_bytes"]
assert len(NAMES) == 49

SCALARS = {"u256": pack.U256, "u64": pack.U64, "i64": pack.I64,
           "frac64": pack.FRAC64}
VALS = {"u256": 7, "u64": 7, "i64": -7, "frac64": 2.5}


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "fuzz_corpus"
    os.makedirs(out_dir, exist_ok=True)
    FHE = one.FHE
    import hashlib

    def ct(value, tname, tag=b"fz"):
        seed = hashlib.sha512(tag + tname.encode()).digest()
        return FHE.ctx.encrypt(PLAIN_TYPES[tname].encode(value, FHE.params),
                               FHE.public_key, seed)

    def write(name, calldata, label):
        idx = NAMES.index(name)
        path = os.path.join(out_dir, f"seed_{label}.bin")
        with open(path, "wb") as f:
            f.write(bytes([idx]) + calldata)

    # ---- valid deep-path seeds (synthesized, not checked in) -----------
    pk = FHE.public_key
    a, b = ct(4, "u64", b"a"), ct(3, "u64", b"b")
    write("mul_cipheru64_cipheru64",
          pack.pack_binary_operation(pk, a, _CT_CODEC, b, _CT_CODEC),
          "valid_cc_mul")
    write("add_cipherfrac64_frac64",
          pack.pack_binary_operation(pk, ct(2.5, "frac64", b"c"), _CT_CODEC,
                                     0.25, pack.FRAC64), "valid_cp_add")
    write("sub_i64_cipheri64",
          pack.pack_binary_operation(pk, -3, pack.I64,
                                     ct(-7, "i64", b"d"), _CT_CODEC),
          "valid_pc_sub")
    write("encrypt_u256",
          pack.pack_two_arguments(9, pack.U256, b"pd", pack.BYTES),
          "valid_encrypt")
    write("decrypt_u64", pack.pack_one_argument(a, _CT_CODEC),
          "valid_decrypt")
    write("reencrypt_u64",
          pack.pack_binary_operation(pk, a, _CT_CODEC, b"rd", pack.BYTES),
          "valid_reencrypt")

    # ---- small malformed shapes (checked in; error-matrix corpus) ------
    write("encrypt_u64", b"\x00\x00", "trunc_offsets")
    write("add_cipheru64_cipheru64", b"\x00\x00\x00\x08trunc",
          "trunc_binary")
    write("decrypt_u64", b"\xde\xad\xbe\xef" * 10, "garbage_ct")
    write("reencrypt_u64", struct.pack(">I", 10_000_000) + b"\x00" * 64,
          "oversized_offset")
    write("encrypt_u256",
          pack.pack_two_arguments(b"\x01\x02\x03", pack.BYTES, b"x",
                                  pack.BYTES), "wrong_width_scalar")
    # SEAL header magics / zstd frame prefix to steer the mutator
    write("decrypt_u64", b"\x5e\xa1\x10\x04\x00\x02\x00\x00" + b"\x00" * 32,
          "seal_header")
    write("decrypt_u64", b"\x28\xb5\x2f\xfd" + b"\x00" * 24, "zstd_magic")

    # ---- batched-codec (fhe_tpu_*) family seeds ------------------------
    # Harness selector byte = 49 + family (fuzz_native.cpp run_tpu);
    # families taking a name read input[1] as the sub-selector into the
    # harness's (op-outer, type-inner, shape-inner) 36-name table:
    # idx = (op*4 + type)*3 + shape with type order u256,u64,i64,frac64.
    def write_tpu(family, body, label):
        with open(os.path.join(out_dir, f"seed_tpu_{label}.bin"),
                  "wb") as f:
            f.write(bytes([49 + family]) + body)

    mul_cc = pack.pack_binary_operation(pk, a, _CT_CODEC, b, _CT_CODEC)
    cp_add = pack.pack_binary_operation(pk, ct(2.5, "frac64", b"c"),
                                        _CT_CODEC, 0.25, pack.FRAC64)
    write_tpu(0, bytes([(2 * 4 + 1) * 3 + 0]) + mul_cc, "binary_mul_cc")
    write_tpu(0, bytes([(0 * 4 + 3) * 3 + 1]) + cp_add, "binary_add_cp")
    write_tpu(1, bytes([0]) + pack.pack_two_arguments(9, pack.U256, b"pd",
                                                      pack.BYTES),
              "encrypt_u256")
    write_tpu(2, pack.pack_one_argument(a, _CT_CODEC), "decrypt")
    reenc = pack.pack_binary_operation(pk, a, _CT_CODEC, b"rd", pack.BYTES)
    write_tpu(3, reenc, "reencrypt")
    write_tpu(4, bytes([1]) + reenc, "reencrypt_finish")
    write_tpu(5, bytes([1]) + b"\x00\x01\x02\x03" * 8, "decode_scalar")
    write_tpu(6, bytes([0]) + b"\x05" * 16, "pack_ct")

    # replay the checked-in coverage finds (native/fuzz_seeds/) so every
    # run starts from the accumulated interesting-input set
    seeds_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", "fhe_precompiles_tpu", "native",
                             "fuzz_seeds")
    if os.path.isdir(seeds_dir):
        import shutil
        for name in os.listdir(seeds_dir):
            if name.endswith(".bin"):
                shutil.copy(os.path.join(seeds_dir, name),
                            os.path.join(out_dir, name))
    print(f"wrote corpus to {out_dir}: {len(os.listdir(out_dir))} files")


if __name__ == "__main__":
    main()
