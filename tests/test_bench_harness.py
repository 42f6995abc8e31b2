"""Bitrot guard for the measurement harness's fresh-process modes.

``report.py --host-rows`` and ``serve_bench.py --codec-only`` produce the
canonical host-CPU rows of benchmarks/RESULTS.md.  They MUST run in fresh
processes before any TPU traffic (see the RESULTS methodology note: a
process with resident tunnel-transfer threads measures host-core rates up
to ~3x low), so the report shells out to them — meaning an import error or
emit-schema change would silently drop rows from the canonical table
instead of failing the report.  These tests pin both entry points.
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rows(args):
    out = subprocess.run([sys.executable] + args, capture_output=True,
                         text=True, timeout=900, cwd=ROOT)
    rows = {}
    for line in out.stdout.splitlines():
        try:
            r = json.loads(line)
        except ValueError:
            continue
        rows[r["metric"]] = r
    assert rows, f"no JSON rows; stderr: {out.stderr[-500:]}"
    return rows


def test_report_host_rows_quick():
    rows = _rows(["benchmarks/report.py", "--host-rows", "--quick"])
    for metric in ("byte_path_decrypt_u64_per_sec",
                   "native_mul_relin_per_sec",
                   "native_decrypt_per_sec",
                   "native_encrypt_per_sec",
                   "native_byte_path_decrypt_u64_per_sec",
                   "c_abi_native_mul_per_sec"):
        assert metric in rows, metric
        assert rows[metric]["value"] > 0, metric
        assert rows[metric]["unit"] == "ops/s/host-core", metric


def test_serve_bench_codec_only_quick():
    rows = _rows(["benchmarks/serve_bench.py", "--codec-only", "--quick"])
    for metric in ("byte_codec_native_decode_mul_per_sec",
                   "byte_codec_native_encode_ct_per_sec",
                   "byte_codec_native_roundtrip_per_sec",
                   "byte_codec_native_roundtrip_1thread_per_sec"):
        assert metric in rows, metric
        assert rows[metric]["value"] > 0, metric
    # threaded rate must sit between the 1-thread rate and perfect scaling
    scal = rows["byte_codec_native_thread_scaling"]["value"]
    assert 0.0 < scal <= 1.5, scal
