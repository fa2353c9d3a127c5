"""Committed program artifacts — the no-codegen-at-runtime delivery tier.

The reference ships its generated WASM in build/bn128_wasm.js /
build/mnt6753_wasm.js (written by tools/buildwasm_bn128.js:8-29, loaded at
src/bn128.js:186) so production never regenerates code.  The JAX analogue
of "code generation" is Python tracing + StableHLO lowering — tens of
seconds per process for the prover's scan-heavy graphs — plus the XLA
backend compile.  The persistent XLA cache (wasmsnark_tpu/__init__.py)
covers the backend compile; this module covers trace + lower: programs are
serialized once at build time with jax.export (tools/build_artifacts.py)
and committed under build/; runtimes deserialize and call, skipping
tracing and lowering entirely.

Bundle layout (build/<bundle>/):

    MANIFEST.json   {"jax": ..., "platform": ..., "n_devices": ...,
                     "source_hash": ..., "entries": {name: filename}}
    <name>.hlo      serialized jax.export bytes

A bundle is ignored (callers fall back to tracing) when anything relevant
changed: package source hash, jax version, backend platform, or device
count.  That makes staleness impossible by construction — the failure mode
is only a slower cold start, never a wrong or uncompilable program.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

BUILD_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "build"))


def source_hash() -> str:
    """Hash of every .py source in the package — any edit invalidates all
    bundles (the tracing inputs are the source itself)."""
    root = os.path.dirname(__file__)
    h = hashlib.sha256()
    for p in sorted(glob.glob(os.path.join(root, "**", "*.py"),
                              recursive=True)):
        # hash the package-relative name: the import path may be relative
        # or absolute depending on the caller, the content must not be
        h.update(os.path.relpath(p, root).encode())
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def _env_fingerprint():
    import jax
    return {
        "jax": jax.__version__,
        "platform": jax.default_backend(),
        "n_devices": len(jax.devices()),
    }


def save_bundle(bundle: str, exported: dict) -> str:
    """exported: {name: jax.export.Exported}.  Writes build/<bundle>/."""
    d = os.path.join(BUILD_DIR, bundle)
    os.makedirs(d, exist_ok=True)
    manifest = dict(_env_fingerprint())
    manifest["source_hash"] = source_hash()
    manifest["entries"] = {}
    for name, exp in exported.items():
        fn = f"{name}.hlo"
        with open(os.path.join(d, fn), "wb") as f:
            f.write(exp.serialize())
        manifest["entries"][name] = fn
    with open(os.path.join(d, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    # prune entries from earlier builds no longer in the manifest
    live = set(manifest["entries"].values()) | {"MANIFEST.json"}
    for fn in os.listdir(d):
        if fn not in live:
            os.remove(os.path.join(d, fn))
    return d


def load_bundle(bundle: str):
    """Returns {name: jax.export.Exported} when the bundle exists and its
    fingerprint matches this process (source, jax version, platform,
    device count) — else None."""
    d = os.path.join(BUILD_DIR, bundle)
    mf = os.path.join(d, "MANIFEST.json")
    if not os.path.exists(mf):
        return None
    try:
        with open(mf) as f:
            manifest = json.load(f)
        if manifest.get("source_hash") != source_hash():
            return None
        fp = _env_fingerprint()
        if any(manifest.get(k) != v for k, v in fp.items()):
            return None
        from jax import export
        out = {}
        for name, fn in manifest["entries"].items():
            with open(os.path.join(d, fn), "rb") as f:
                out[name] = export.deserialize(f.read())
        return out
    except Exception:
        return None


def exported_matches(exp, args) -> bool:
    """Do the flat avals of `args` match the export's input signature?"""
    import jax
    flat, _ = jax.tree.flatten(args)
    if len(flat) != len(exp.in_avals):
        return False
    return all(tuple(getattr(a, "shape", ())) == tuple(v.shape)
               and a.dtype == v.dtype
               for a, v in zip(flat, exp.in_avals))


def wrap_exported(exp, mesh=None):
    """Callable around Exported.call; with a mesh, inputs are placed
    replicated on it so the call runs in the exported device context."""
    import jax

    if mesh is None:
        return jax.jit(exp.call)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P())

    def call(*args):
        args = jax.tree.map(lambda a: jax.device_put(a, sh), args)
        return exp.call(*args)

    return call
