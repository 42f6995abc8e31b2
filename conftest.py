"""Pytest configuration: force the JAX CPU backend with 8 virtual devices.

Multi-chip sharding tests run single-process on a virtual device mesh
(SURVEY.md section 4 "multi-chip tests runnable via device count override");
the real-TPU benchmark path is exercised separately by bench.py.

Note: this environment's sitecustomize pins JAX_PLATFORMS=axon (remote TPU
tunnel), so the env var alone is not enough -- jax.config must be updated
after import, before any backend is touched.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The pair-backend programs take minutes of XLA CPU compile time on a
# small host; persist compiles so repeat suite runs skip them.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


# ---------------------------------------------------------------------------
# Test tiers: `pytest -m smoke` is a <10-min cross-section touching every
# surface (one op per family x every engine, pack/error matrix, native ABI
# build, serialization interop, one sharding test); CI runs smoke on PRs
# and the full suite on main/nightly.  Patterns are matched as substrings
# of the nodeid; tuple entries require ALL parts to match (used to pin one
# parametrization of an otherwise huge matrix).
# ---------------------------------------------------------------------------
_SMOKE_PATTERNS = [
    # golden engine core semantics
    "test_golden_bfv.py::test_encrypt_decrypt_roundtrip",
    "test_golden_bfv.py::test_transparent_zero_difference",
    ("test_golden_bfv.py::test_cipher_cipher_u256", "mul"),
    # JAX engine bit-exactness vs golden (the consensus contract)
    "test_jax_engine.py::test_add_sub_neg_bitexact",
    "test_jax_engine.py::test_relinearize_and_mul_relin_bitexact",
    # plaintext encodings + wire framing
    "test_encoding.py",
    "test_pack.py",
    # byte-level app surface: one op per shape family + threshold API
    ("test_app.py::test_precompile_cipher_cipher[", "u64-mul"),
    ("test_app.py::test_precompile_cipher_plain_and_plain_cipher[",
     "u64-mul"),
    "test_app.py::test_encrypt_decrypt_network_key",
    "test_app.py::test_encrypt_golden_digest_pinned",
    "test_app.py::test_reencrypt_refresh_network_key",
    # error-code matrix (one per failure family)
    "test_error_code_matrix.py::test_truncated_offsets_unexpected_eof",
    "test_error_code_matrix.py::test_garbage_ciphertext_invalid_encoding",
    ("test_error_code_matrix.py::test_decode_overflow", "u64"),
    # cross-engine byte consensus: one op per family on BOTH engines
    ("test_consensus_49.py", "mul_cipheru64_cipheru64"),
    ("test_consensus_49.py", "add_cipherfrac64_frac64"),
    ("test_consensus_49.py", "encrypt_u256"),
    ("test_consensus_49.py", "decrypt_i64"),
    ("test_consensus_49.py", "reencrypt_u64"),
    # native ABI: build + roundtrip + error path (exercises make)
    "test_native_abi.py::test_all_51_symbols_exported",
    "test_native_abi.py::test_encrypt_decrypt_roundtrip",
    "test_native_abi.py::test_error_codes_through_abi",
    "test_native_byte_path.py::test_decrypted_values_correct",
    "test_native_byte_path.py::test_error_codes_match_python",
    # reference key interop (serialization surface)
    "test_serialization.py::test_load_reference_network_keys",
    "test_serialization.py::test_interop_mul_relin_with_reference",
    "test_serialization.py::test_own_key_save_load_roundtrip",
    # sharding on the virtual mesh + batched serving
    "test_parallel.py::test_stream_unsharded_vs_sharded_bitexact",
    ("test_serve.py::test_byte_server_matches_fheapp_call", "native"),
    # serving soak: RSS must stay flat over sustained windows (caught the
    # thread_local zstd-context leak)
    "test_serve_soak.py::test_byte_server_native_soak",
    # device-phase fault isolation + queue-fed continuous serving
    "test_serve_faults.py::test_stream_run_failure_degrades_to_fallback",
    "test_serve_faults.py::test_continuous_mode_matches_fheapp_call",
    # pooled byte-serving (operand dedup + prepared-mul fused path)
    "test_serve_pooled.py::test_pooled_path_engages_and_matches",
    "test_serve_pooled.py::test_adversarial_cts_through_server",
    # future-testnet preset byte consensus (k=3 multiword decrypt limbs)
    "test_testnet_two_app.py::test_boundary_dots_byte_consensus_at_k3",
    # runtime zstd dispatch: consensus-byte pins across library swaps
    "test_zstd_dispatch.py",
    # consensus-canonical zstd frames (the r5 attacker-steered split fix)
    "test_zstd_canonical.py",
    # adversarial decrypt byte-consensus (exact scale-and-round; VERDICT r4)
    "test_decrypt_consensus.py",
    # SEAL zero-extension add/sub on mismatched component counts (r5)
    "test_size_semantics.py::test_mismatched_sizes_byte_identical_all_stacks",
    # three-stack byte-differential fuzz replay (golden / jax / native ABI)
    "test_fuzz_byte_consensus.py::test_corpus_replay_three_stacks",
    "test_fuzz_byte_consensus.py::test_c1_zero_boundary_through_native_abi",
    "test_fuzz_byte_consensus.py::test_noise_exhaustion_chain_three_stacks",
]


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "smoke: fast cross-surface subset (<10 min; see conftest)")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    for item in items:
        nid = item.nodeid
        for pat in _SMOKE_PATTERNS:
            parts = pat if isinstance(pat, tuple) else (pat,)
            if all(p in nid for p in parts):
                item.add_marker(_pytest.mark.smoke)
                break
