"""Poll the remote-TPU tunnel until it answers, logging each attempt.

The shared dev chip's tunnel goes down for hours at a time (see
CLAUDE.md "Environment gotchas").  This probe runs a tiny device
computation in a subprocess under a hard timeout, so a hung tunnel
cannot wedge the caller, and appends one status line per attempt to
the log file.  Exit 0 on first success.

Usage: python tools/tpu_probe.py [logfile] [interval_s] [max_tries]
"""
from __future__ import annotations

import subprocess
import sys
import time

SNIPPET = (
    "import jax, jax.numpy as jnp;"
    "print('DEVICES', jax.devices(), flush=True);"
    "print('SUM', float(jnp.ones((8, 8)).sum()), flush=True)"
)


def try_once(timeout: float) -> tuple[bool, str]:
    try:
        r = subprocess.run([sys.executable, "-c", SNIPPET],
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return False, "timeout"
    out = (r.stdout + r.stderr).strip().replace("\n", " | ")
    return r.returncode == 0 and "SUM 64.0" in r.stdout, out[-300:]


def main() -> int:
    log_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_probe.log"
    interval = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
    max_tries = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    for i in range(max_tries):
        t0 = time.time()
        ok, msg = try_once(timeout=180.0)
        line = (f"{time.strftime('%H:%M:%S')} try={i} ok={ok} "
                f"dt={time.time() - t0:.0f}s {msg}\n")
        with open(log_path, "a") as f:
            f.write(line)
        if ok:
            print("TPU UP:", line, flush=True)
            return 0
        time.sleep(interval)
    return 1


if __name__ == "__main__":
    sys.exit(main())
