"""Two validators, two engines, one byte stream: the consensus property.

Simulates what the framework guarantees in production: a CPU validator
(golden engine) and an accelerator validator (JAX engine) process the same
random precompile request stream and must emit byte-identical outputs --
any divergence is a consensus break.

Run:  python examples/consensus_demo.py [--requests 100]
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")       # demo runs anywhere

import numpy as np  # noqa: E402

from fhe_precompiles_tpu import FheApp, pack  # noqa: E402
from fhe_precompiles_tpu.app import _CT_CODEC, PRECOMPILE_NAMES  # noqa: E402
from fhe_precompiles_tpu.encoding import PLAIN_TYPES  # noqa: E402
from fhe_precompiles_tpu.testnet import one  # noqa: E402


def main():
    n_req = 100
    if "--requests" in sys.argv:
        n_req = int(sys.argv[sys.argv.index("--requests") + 1])

    cpu_validator = one.FHE                       # golden engine
    tpu_validator = FheApp(one.PARAMS, engine="jax")

    rng = np.random.default_rng(0)
    pk, _sk = cpu_validator.generate_keys()
    pool = {
        t: [cpu_validator.ctx.encrypt(
                PLAIN_TYPES[t].encode(v if t != "frac64" else float(v),
                                      one.PARAMS),
                pk, hashlib.sha512(f"{t}{v}".encode()).digest())
            for v in (2, 3, 5)]
        for t in ("u256", "u64", "i64", "frac64")
    }

    binary_ops = [n for n in PRECOMPILE_NAMES if n.count("cipher") == 2]
    stream_digest = hashlib.sha256()
    divergences = 0
    for i in range(n_req):
        name = binary_ops[rng.integers(len(binary_ops))]
        t = name.split("_")[1].replace("cipher", "")
        a, b = rng.choice(3, size=2)
        data = pack.pack_binary_operation(pk, pool[t][a], _CT_CODEC,
                                          pool[t][b], _CT_CODEC)
        code_c, out_c = cpu_validator.call(name, data)
        code_t, out_t = tpu_validator.call(name, data)
        if (code_c, out_c) != (code_t, out_t):
            divergences += 1
            print(f"CONSENSUS BREAK at request {i}: {name}")
        stream_digest.update(out_c)
    print(f"{n_req} requests, {divergences} divergences")
    print(f"stream digest (both validators): {stream_digest.hexdigest()[:32]}")
    assert divergences == 0, "consensus broken"


if __name__ == "__main__":
    main()
