"""Proving-key / witness binary formats — parity with tools/buildpkey.js and
tools/buildwitness.js.

Binary proving key layout (buildpkey.js:188-240 layout comment; offsets read
back by src/bn128.js:581-604):

    u32 x 10 header: [nSignals, nPublic, domainSize,
                      pPolsA, pPolsB, pPointsA, pPointsB1, pPointsB2,
                      pPointsC, pHExps]          (byte offsets into the file)
    alfa1  G1 affine  64B   (x, y as 32B LE, Montgomery form)
    beta1  G1 affine  64B
    delta1 G1 affine  64B
    beta2  G2 affine 128B   (x0, x1, y0, y1)
    delta2 G2 affine 128B
    polsA, polsB: per signal: u32 nCoefs, then nCoefs x (u32 coefIdx,
                  32B Fr Montgomery)             (buildpkey.js:79-89)
    pointsA  : nSignals x G1 affine 64B
    pointsB1 : nSignals x G1 affine 64B
    pointsB2 : nSignals x G2 affine 128B
    pointsC  : (nSignals - nPublic - 1) x G1 affine 64B
    hExps    : domainSize x G1 affine 64B

All points and coefficients are stored in Montgomery form, little-endian
(buildpkey.js:57-77).  Witness file: flat LE 32-byte canonical Fr values, no
header (buildwitness.js:65-69).

Element sizes derive from the field specs (wasmsnark's n8 = 8*n64,
build_f1m.js:27): 32B for BN128 — byte-identical to the reference format —
48B Fp for BLS12-381, 96B for MNT6753.  The same layout therefore serves
every curve family.
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

from ..fields.spec import FieldSpec
from ..utils.serialize import bytes_to_limbs, int_to_bytes_le, bytes_le_to_int
from ..ops.pol import SparseLC


@dataclasses.dataclass
class ProvingKey:
    """Parsed proving key with device-ready arrays (all limb planes uint32).

    Point arrays are AFFINE (x, y) limb planes [L, n] in Montgomery form —
    exactly the file's storage form, which is also what the MSM consumes
    (ops/msm.py mixed adds); zero points keep the file encoding x=y=0."""

    n_signals: int
    n_public: int
    domain_size: int
    alfa1: tuple  # bigint affine (canonical ints) for host-side assembly
    beta1: tuple
    delta1: tuple
    beta2: tuple
    delta2: tuple
    pols_a: SparseLC
    pols_b: SparseLC
    points_a: tuple
    points_b1: tuple
    points_b2: tuple
    points_c: tuple
    h_exps: tuple


def _g1_planes(fp: FieldSpec, data, n: int):
    """n G1 affine Montgomery points (2*n8 bytes each) -> (x, y) planes.
    Zero points keep the file encoding x=y=0 (the MSM's affine-zero form)."""
    s = fp.n8
    arr = np.frombuffer(data[: n * 2 * s], dtype=np.uint8).reshape(n, 2 * s)
    xs = bytes_to_limbs(arr[:, :s].tobytes(), s, fp.n_limbs)
    ys = bytes_to_limbs(arr[:, s:].tobytes(), s, fp.n_limbs)
    return xs, ys


def _g2_planes(fp: FieldSpec, data, n: int):
    s = fp.n8
    arr = np.frombuffer(data[: n * 4 * s], dtype=np.uint8).reshape(n, 4 * s)
    comps = [bytes_to_limbs(arr[:, s * i: s * (i + 1)].tobytes(), s, fp.n_limbs)
             for i in range(4)]
    return ((comps[0], comps[1]), (comps[2], comps[3]))


def _g1_affine_host(fp: FieldSpec, data: bytes):
    s = fp.n8
    x = fp.from_mont(bytes_le_to_int(data[:s]))
    y = fp.from_mont(bytes_le_to_int(data[s: 2 * s]))
    return (x, y)


def _g2_affine_host(fp: FieldSpec, data: bytes):
    s = fp.n8
    c = [fp.from_mont(bytes_le_to_int(data[s * i: s * (i + 1)])) for i in range(4)]
    return ((c[0], c[1]), (c[2], c[3]))


def _parse_sparse(fr: FieldSpec, data, n_signals: int, domain: int) -> SparseLC:
    """Sparse QAP section -> SparseLC arrays.  Uses the native C++ parser
    (csrc/marshal.cpp parse_sparse) when built — the Python fallback walks
    the var-length records interpreted-ly, which matters at 2^20 signals."""
    s = fr.n8
    from ..utils import native
    out = native.parse_sparse(data, n_signals, s)
    if out is not None:
        sig_idx, coef_idx, coef_bytes = out
        cf = bytes_to_limbs(coef_bytes.tobytes(), s, fr.n_limbs) \
            if coef_bytes.size else np.zeros((fr.n_limbs, 0), dtype=np.uint32)
        return SparseLC(sig_idx=sig_idx, coef_idx=coef_idx, coefs=cf,
                        domain_size=domain)
    sig_idx, coef_idx, coefs = [], [], []
    off = 0
    for i in range(n_signals):
        (ncoefs,) = struct.unpack_from("<I", data, off)
        off += 4
        for _ in range(ncoefs):
            (cidx,) = struct.unpack_from("<I", data, off)
            off += 4
            coefs.append(bytes(data[off: off + s]))
            off += s
            sig_idx.append(i)
            coef_idx.append(cidx)
    cf = bytes_to_limbs(b"".join(coefs), s, fr.n_limbs) if coefs else \
        np.zeros((fr.n_limbs, 0), dtype=np.uint32)
    return SparseLC(
        sig_idx=np.array(sig_idx, dtype=np.int32),
        coef_idx=np.array(coef_idx, dtype=np.int32),
        coefs=cf,
        domain_size=domain,
    )


def parse_pkey(pkey, fp_spec: FieldSpec, fr_spec: FieldSpec) -> ProvingKey:
    pkey = memoryview(pkey)  # zero-copy section slicing (multi-GB keys)
    h = struct.unpack_from("<10I", pkey, 0)
    n_signals, n_public, domain = h[0], h[1], h[2]
    p_pols_a, p_pols_b, p_a, p_b1, p_b2, p_c, p_h = h[3:]
    base = 40
    g1sz, g2sz = 2 * fp_spec.n8, 4 * fp_spec.n8
    alfa1 = _g1_affine_host(fp_spec, pkey[base: base + g1sz])
    beta1 = _g1_affine_host(fp_spec, pkey[base + g1sz: base + 2 * g1sz])
    delta1 = _g1_affine_host(fp_spec, pkey[base + 2 * g1sz: base + 3 * g1sz])
    beta2 = _g2_affine_host(fp_spec, pkey[base + 3 * g1sz:
                                          base + 3 * g1sz + g2sz])
    delta2 = _g2_affine_host(fp_spec, pkey[base + 3 * g1sz + g2sz:
                                           base + 3 * g1sz + 2 * g2sz])
    return ProvingKey(
        n_signals=n_signals,
        n_public=n_public,
        domain_size=domain,
        alfa1=alfa1, beta1=beta1, delta1=delta1, beta2=beta2, delta2=delta2,
        pols_a=_parse_sparse(fr_spec, pkey[p_pols_a:p_pols_b], n_signals, domain),
        pols_b=_parse_sparse(fr_spec, pkey[p_pols_b:p_a], n_signals, domain),
        points_a=_g1_planes(fp_spec, pkey[p_a:], n_signals),
        points_b1=_g1_planes(fp_spec, pkey[p_b1:], n_signals),
        points_b2=_g2_planes(fp_spec, pkey[p_b2:], n_signals),
        points_c=_g1_planes(fp_spec, pkey[p_c:], n_signals - n_public - 1),
        h_exps=_g1_planes(fp_spec, pkey[p_h:], domain),
    )


def _interleave_planes(fp_spec: FieldSpec, comps) -> bytes:
    """Montgomery limb planes [L, B] (one per point component) -> the file's
    per-point interleaved LE byte layout, vectorized (native limbs_to_bytes
    + one numpy transpose) — the bulk-section writer for device-generated
    keys."""
    from ..utils.serialize import limbs_to_bytes
    s = fp_spec.n8
    mats = [np.frombuffer(limbs_to_bytes(c, s), np.uint8).reshape(-1, s)
            for c in comps]
    n = mats[0].shape[0]
    out = np.empty((n, len(mats), s), np.uint8)
    for i, mc in enumerate(mats):
        out[:, i] = mc
    return out.tobytes()


def write_pkey(fp_spec: FieldSpec, fr_spec: FieldSpec, *,
               n_public: int, domain_size: int,
               alfa1, beta1, delta1, beta2, delta2,
               pols_a, pols_b, points_a, points_b1, points_b2,
               points_c, h_exps) -> bytes:
    """Serialize a proving key.

    pols_a/pols_b: per-signal dict {coefIdx: Fr canonical int}.
    points: either a list of affine (x, y) canonical bigint pairs (None for
    zero) or a tuple of *Montgomery limb planes* ((x, y) for G1,
    ((x0,x1),(y0,y1)) for G2) as produced by the device fixed-base setup —
    the planes path writes whole sections vectorized.
    """
    s = fp_spec.n8

    def g1(pt):
        if pt is None:
            return b"\0" * (2 * s)
        return (int_to_bytes_le(fp_spec.to_mont(pt[0]), s)
                + int_to_bytes_le(fp_spec.to_mont(pt[1]), s))

    def g2(pt):
        if pt is None:
            return b"\0" * (4 * s)
        (x0, x1), (y0, y1) = pt
        return b"".join(int_to_bytes_le(fp_spec.to_mont(v), s)
                        for v in (x0, x1, y0, y1))

    def g1_sec(pts):
        if isinstance(pts, tuple):
            return _interleave_planes(fp_spec, [pts[0], pts[1]])
        return b"".join(g1(p) for p in pts)

    def g2_sec(pts):
        if isinstance(pts, tuple):
            (x0, x1), (y0, y1) = pts
            return _interleave_planes(fp_spec, [x0, x1, y0, y1])
        return b"".join(g2(p) for p in pts)

    mont_cache = {}

    def fr_mont_bytes(v):
        b = mont_cache.get(v)
        if b is None:
            b = mont_cache[v] = int_to_bytes_le(fr_spec.to_mont(v), fr_spec.n8)
        return b

    def sparse(pols):
        out = bytearray()
        for p in pols:
            out += struct.pack("<I", len(p))
            for cidx in sorted(p):
                out += struct.pack("<I", cidx)
                out += fr_mont_bytes(p[cidx])
        return bytes(out)

    n_signals = len(pols_a)
    sa, sb = sparse(pols_a), sparse(pols_b)
    base = 40
    p_pols_a = base + 3 * (2 * s) + 2 * (4 * s)
    p_pols_b = p_pols_a + len(sa)
    p_a = p_pols_b + len(sb)
    p_b1 = p_a + 2 * s * n_signals
    p_b2 = p_b1 + 2 * s * n_signals
    p_c = p_b2 + 4 * s * n_signals
    p_h = p_c + 2 * s * (n_signals - n_public - 1)
    header = struct.pack("<10I", n_signals, n_public, domain_size,
                         p_pols_a, p_pols_b, p_a, p_b1, p_b2, p_c, p_h)
    body = (header + g1(alfa1) + g1(beta1) + g1(delta1) + g2(beta2) + g2(delta2)
            + sa + sb
            + g1_sec(points_a)
            + g1_sec(points_b1)
            + g2_sec(points_b2)
            + g1_sec(points_c)
            + g1_sec(h_exps))
    return body


def read_witness(data: bytes, fr_spec: FieldSpec) -> np.ndarray:
    """witness.bin (flat canonical LE n8-byte Fr) -> [L, nSignals] planes."""
    return bytes_to_limbs(data, fr_spec.n8, fr_spec.n_limbs)


def write_witness(values, fr_spec: FieldSpec) -> bytes:
    return b"".join(int_to_bytes_le(int(v) % fr_spec.q, fr_spec.n8)
                    for v in values)
