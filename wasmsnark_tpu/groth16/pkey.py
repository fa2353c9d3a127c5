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

    Point arrays are (x, y, z) limb planes [L, n] in Montgomery form with
    z in {0, 1}*R (zero points, i.e. x=y=0 in the file, get z=0)."""

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


def _g1_planes(fp: FieldSpec, data: bytes, n: int):
    """n G1 affine Montgomery points (2*n8 bytes each) -> (x, y, z) planes."""
    s = fp.n8
    arr = np.frombuffer(data[: n * 2 * s], dtype=np.uint8).reshape(n, 2 * s)
    xs = bytes_to_limbs(arr[:, :s].tobytes(), s, fp.n_limbs)
    ys = bytes_to_limbs(arr[:, s:].tobytes(), s, fp.n_limbs)
    nz = ((xs != 0).any(axis=0) | (ys != 0).any(axis=0)).astype(np.uint32)
    one = np.array(fp.limbs(fp.one_mont), dtype=np.uint32)[:, None]
    zs = (one * nz[None, :]).astype(np.uint32)
    return xs, ys, zs


def _g2_planes(fp: FieldSpec, data: bytes, n: int):
    s = fp.n8
    arr = np.frombuffer(data[: n * 4 * s], dtype=np.uint8).reshape(n, 4 * s)
    comps = [bytes_to_limbs(arr[:, s * i: s * (i + 1)].tobytes(), s, fp.n_limbs)
             for i in range(4)]
    nz = np.zeros(n, dtype=bool)
    for c in comps:
        nz |= (c != 0).any(axis=0)
    one = np.array(fp.limbs(fp.one_mont), dtype=np.uint32)[:, None]
    z0 = (one * nz.astype(np.uint32)[None, :]).astype(np.uint32)
    zz = np.zeros_like(z0)
    return ((comps[0], comps[1]), (comps[2], comps[3]), (z0, zz))


def _g1_affine_host(fp: FieldSpec, data: bytes):
    s = fp.n8
    x = fp.from_mont(bytes_le_to_int(data[:s]))
    y = fp.from_mont(bytes_le_to_int(data[s: 2 * s]))
    return (x, y)


def _g2_affine_host(fp: FieldSpec, data: bytes):
    s = fp.n8
    c = [fp.from_mont(bytes_le_to_int(data[s * i: s * (i + 1)])) for i in range(4)]
    return ((c[0], c[1]), (c[2], c[3]))


def _parse_sparse(fr: FieldSpec, data: bytes, n_signals: int, domain: int) -> SparseLC:
    s = fr.n8
    sig_idx, coef_idx, coefs = [], [], []
    off = 0
    for i in range(n_signals):
        (ncoefs,) = struct.unpack_from("<I", data, off)
        off += 4
        for _ in range(ncoefs):
            (cidx,) = struct.unpack_from("<I", data, off)
            off += 4
            coefs.append(data[off: off + s])
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


def parse_pkey(pkey: bytes, fp_spec: FieldSpec, fr_spec: FieldSpec) -> ProvingKey:
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


def write_pkey(fp_spec: FieldSpec, fr_spec: FieldSpec, *,
               n_public: int, domain_size: int,
               alfa1, beta1, delta1, beta2, delta2,
               pols_a, pols_b, points_a, points_b1, points_b2,
               points_c, h_exps) -> bytes:
    """Serialize a proving key (inputs are canonical bigints / dict lists).

    pols_a/pols_b: per-signal dict {coefIdx: Fr canonical int}.
    points: affine (x, y) canonical bigint pairs or None for zero.
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

    def sparse(pols):
        out = bytearray()
        for p in pols:
            out += struct.pack("<I", len(p))
            for cidx in sorted(p):
                out += struct.pack("<I", cidx)
                out += int_to_bytes_le(fr_spec.to_mont(p[cidx]), fr_spec.n8)
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
            + b"".join(g1(p) for p in points_a)
            + b"".join(g1(p) for p in points_b1)
            + b"".join(g2(p) for p in points_b2)
            + b"".join(g1(p) for p in points_c)
            + b"".join(g1(p) for p in h_exps))
    return body


def read_witness(data: bytes, fr_spec: FieldSpec) -> np.ndarray:
    """witness.bin (flat canonical LE n8-byte Fr) -> [L, nSignals] planes."""
    return bytes_to_limbs(data, fr_spec.n8, fr_spec.n_limbs)


def write_witness(values, fr_spec: FieldSpec) -> bytes:
    return b"".join(int_to_bytes_le(int(v) % fr_spec.q, fr_spec.n8)
                    for v in values)
