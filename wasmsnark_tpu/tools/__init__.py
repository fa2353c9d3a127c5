"""Offline converters — parity with the reference's tools/ CLI:

    python -m wasmsnark_tpu.tools.build_pkey    -i proving_key.json -o proving_key.bin
    python -m wasmsnark_tpu.tools.build_witness -i witness.json     -o witness.bin

Like the reference (tools/buildpkey.js, tools/buildwitness.js), all heavy
preprocessing is pushed offline: keys are stored pre-Montgomery in the binary
layout the prover mmap-slices by header pointers (SURVEY.md §5).
"""
