"""ByteServer demo: the reference's calldata surface, batched.

Builds a small mixed request stream (binary ops under a user key + the
threshold API), serves it through ByteServer with the C++ native codec,
and verifies every (code, payload) equals FheApp.call one at a time —
the consensus property that lets a TPU-fronted node coexist with
call-by-call CPU validators.

Run anywhere (CPU works; a TPU chip just makes the device phase fast):

    python examples/byte_server_demo.py
"""
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("BYTE_SERVER_DEMO_TPU", "") != "1":
    jax.config.update("jax_platforms", "cpu")  # demo default: portable

from fhe_precompiles_tpu import FheApp, pack  # noqa: E402
from fhe_precompiles_tpu.app import _CT_CODEC  # noqa: E402
from fhe_precompiles_tpu.encoding import PLAIN_TYPES  # noqa: E402
from fhe_precompiles_tpu.serve import ByteServer  # noqa: E402
from fhe_precompiles_tpu.testnet import one  # noqa: E402


def main():
    FHE = one.FHE
    app = FheApp(FHE.params, engine="jax")
    server = ByteServer(FHE.params, app=app, codec="native")
    pk, _sk = FHE.generate_keys()

    def ct(value, tag):
        seed = hashlib.sha512(tag).digest()
        return FHE.ctx.encrypt(PLAIN_TYPES["u64"].encode(value, FHE.params),
                               pk, seed)

    a, b = ct(6, b"demo-a"), ct(7, b"demo-b")
    reqs = []
    for op in ("add", "sub", "mul"):
        reqs.append((f"{op}_cipheru64_cipheru64",
                     pack.pack_binary_operation(pk, a, _CT_CODEC,
                                                b, _CT_CODEC)))
    reqs.append(("mul_cipheru64_u64",
                 pack.pack_binary_operation(pk, a, _CT_CODEC, 3, pack.U64)))
    reqs.append(("encrypt_u64",
                 pack.pack_two_arguments(41, pack.U64, b"pd", pack.BYTES)))
    net_ct = FHE.ctx.encrypt(PLAIN_TYPES["u64"].encode(9, FHE.params),
                             FHE.public_key,
                             hashlib.sha512(b"net").digest())
    reqs.append(("decrypt_u64", pack.pack_one_argument(net_ct, _CT_CODEC)))
    reqs.append(("reencrypt_u64",
                 pack.pack_binary_operation(pk, net_ct, _CT_CODEC,
                                            b"rd", pack.BYTES)))

    t0 = time.time()
    results = server.run(reqs)
    dt = time.time() - t0
    print(f"served {len(reqs)} byte requests in {dt:.2f}s")
    for (name, data), (code, payload) in zip(reqs, results):
        want = app.call(name, data)
        status = "OK" if (code, payload) == want else "MISMATCH"
        print(f"  {name:32s} code={code} bytes={len(payload):6d}  {status}")
        assert (code, payload) == want
    print("every (code, payload) byte-equal to FheApp.call — consensus holds")


if __name__ == "__main__":
    main()
