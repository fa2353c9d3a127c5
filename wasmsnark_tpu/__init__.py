"""wasmsnark_tpu — a TPU-native zkSNARK (Groth16) proving framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
iden3/wasmsnark: Montgomery field arithmetic, NTT/QAP pipeline, Pippenger
multi-exponentiation, pairings, and a Groth16 prover/verifier over BN128,
plus BLS12-381 and MNT6753 field/curve stacks — batch-vectorized over TPU
lanes and sharded over device meshes instead of hand-unrolled WASM over a
worker pool.

Public API (mirrors the reference's index.js:20-22):

    build_bn128()    -> Bn128Runtime   (groth16_gen_proof / groth16_verify)
    build_f1(q)      -> F1Runtime      (single-field arithmetic runtime)
    build_mnt6753()  -> Mnt6753Runtime (Bowe-Gabizon verifier)
    build_bls12381() -> Bls12381       (field/curve/pairing module)
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: the framework's jitted programs (MSM
# scans, NTT pipelines) are large one-time compiles keyed by shape — the
# moral equivalent of the reference committing its generated WASM into
# build/*_wasm.js so production never regenerates code (SURVEY.md §5
# checkpoint/resume).  Opt out with WASMSNARK_TPU_NO_CACHE=1.
if not _os.environ.get("WASMSNARK_TPU_NO_CACHE"):
    # Cap XLA:CPU codegen at AVX2: without it, native codegen embeds
    # tuning pseudo-features (+prefer-no-scatter/+prefer-no-gather) in the
    # cache entries that the AOT loader's host-feature check rejects on
    # reload, silently recompiling everything.  AVX2 entries round-trip.
    # Effective as long as no backend has initialized yet; harmless for
    # TPU backends (the flag only affects CPU compilation).
    _flags = _os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_max_isa" not in _flags:
        _os.environ["XLA_FLAGS"] = (_flags + " --xla_cpu_max_isa=AVX2").strip()

    import jax as _jax

    _cache_dir = _os.environ.get(
        "WASMSNARK_TPU_CACHE_DIR",
        _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache_dir))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - older jax without these flags
        pass

    # Seed the cache from the committed artifact tier (build/xla_cache —
    # populated by tools/seed_cache.py with the compiled programs of the
    # driver's default bench shapes).  This is the direct analogue of the
    # reference loading build/*_wasm.js instead of regenerating code
    # (src/bn128.js:186, tools/buildwasm_bn128.js:8-29): a fresh machine
    # starts with the big one-time compiles already done.
    _seed_dir = _os.path.join(_os.path.dirname(__file__), "..", "build",
                              "xla_cache")
    if _os.path.isdir(_seed_dir):
        try:
            _os.makedirs(_cache_dir, exist_ok=True)
            for _name in _os.listdir(_seed_dir):
                _dst = _os.path.join(_cache_dir, _name)
                if not _os.path.exists(_dst):
                    try:  # hardlink (instant); fall back to copy
                        _os.link(_os.path.join(_seed_dir, _name), _dst)
                    except OSError:
                        import shutil as _shutil
                        _shutil.copy2(_os.path.join(_seed_dir, _name), _dst)
        except OSError:  # pragma: no cover - read-only checkout etc.
            pass

from .api import build_bn128, build_f1, build_mnt6753, build_bls12381  # noqa: F401
