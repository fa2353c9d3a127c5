"""Serialization helpers: bigint <-> bytes/limbs/JSON.

Covers the reference's src/utils.js (bigInt2BytesLE, isOcamNum) and
tools/stringifybigint.js (snarkjs-compatible decimal-string JSON).
"""

from __future__ import annotations

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_bytes_le(a: int, n: int) -> bytes:
    return int(a).to_bytes(n, "little")


def bytes_le_to_int(b: bytes) -> int:
    return int.from_bytes(b, "little")


def is_ocam_num(x) -> bool:
    """Detect the Coda/OCaml `num` triple format [num, num, [u32 limbs...]]
    (src/utils.js:42-49): a 3-element list, first two elements numbers, third
    a list of 32-bit words."""
    return (
        isinstance(x, list)
        and len(x) == 3
        and isinstance(x[0], (int, float))
        and isinstance(x[1], (int, float))
        and isinstance(x[2], list)
    )


def parse_bigint(x) -> int:
    """Parse snarkjs-style decimal strings, ints, hex strings, or OCaml num
    triples into a Python int.

    OCaml num semantics mirror src/mnt6753.js:492-513 (setF1): the third
    element is a little-endian u32 word list; trailing negative words are
    padding and stripped; remaining words coerce mod 2^32.
    """
    if isinstance(x, int):
        return x
    if isinstance(x, str):
        s = x.strip()
        if s.startswith("0x") or s.startswith("0X"):
            return int(s, 16)
        return int(s)
    if is_ocam_num(x):
        limbs = list(x[2])
        while limbs and limbs[-1] < 0:
            limbs.pop()
        acc = 0
        for i, l in enumerate(limbs):
            acc |= (int(l) & 0xFFFFFFFF) << (32 * i)
        return acc
    raise TypeError(f"cannot parse bigint from {type(x)}")


def stringify(x) -> str:
    return str(int(x))


# ---------------------------------------------------------------------------
# numpy limb packing: python ints <-> uint32 [L, B] arrays (limb-major)
# ---------------------------------------------------------------------------

def ints_to_limbs(values, n_limbs: int) -> np.ndarray:
    """Pack an iterable of non-negative ints into a uint32 [n_limbs, B] array
    of 16-bit limbs (limb-major so the batch axis rides TPU lanes)."""
    values = list(values)
    B = len(values)
    out = np.empty((n_limbs, B), dtype=np.uint32)
    for j, v in enumerate(values):
        v = int(v)
        for i in range(n_limbs):
            out[i, j] = (v >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def ints_to_limbs_fast(values, n_limbs: int) -> np.ndarray:
    """ints_to_limbs for large batches: serialize through int.to_bytes and
    the (native-accelerated) bytes_to_limbs path instead of a per-limb
    Python loop — ~50x at 2^20 elements."""
    n8 = 2 * n_limbs
    data = b"".join(int(v).to_bytes(n8, "little") for v in values)
    return bytes_to_limbs(data, n8, n_limbs)


def limbs_to_ints(arr) -> list[int]:
    """Inverse of ints_to_limbs; accepts any uint integer array [L, B]."""
    a = np.asarray(arr)
    L, B = a.shape
    out = []
    for j in range(B):
        acc = 0
        for i in range(L):
            acc |= int(a[i, j]) << (LIMB_BITS * i)
        out.append(acc)
    return out


def bytes_to_limbs(data: bytes, elem_bytes: int, n_limbs: int) -> np.ndarray:
    """Vectorized: flat little-endian fixed-width elements -> uint32 [L, B].

    This is the hot host-side marshalling path (witness/pkey upload); uses
    the native C++ marshal library (csrc/marshal.cpp) when built, else a
    numpy reshape.  elem_bytes must be even.
    """
    assert len(data) % elem_bytes == 0
    from . import native
    out = native.bytes_to_planes(data, elem_bytes, n_limbs)
    if out is not None:
        return out
    b = np.frombuffer(data, dtype=np.uint8).reshape(-1, elem_bytes)
    u16 = b[:, 0::2].astype(np.uint32) | (b[:, 1::2].astype(np.uint32) << 8)
    B, halfwords = u16.shape
    out = np.zeros((n_limbs, B), dtype=np.uint32)
    k = min(halfwords, n_limbs)
    out[:k] = u16[:, :k].T
    return np.ascontiguousarray(out)


def limbs_to_bytes(arr, elem_bytes: int) -> bytes:
    """Inverse of bytes_to_limbs: uint32 [L, B] -> flat LE bytes."""
    from . import native
    out = native.planes_to_bytes(arr, elem_bytes)
    if out is not None:
        return out
    a = np.asarray(arr, dtype=np.uint32)
    L, B = a.shape
    u16 = a.T.astype(np.uint16)  # [B, L]
    full = np.zeros((B, elem_bytes // 2), dtype=np.uint16)
    k = min(L, elem_bytes // 2)
    full[:, :k] = u16[:, :k]
    return full.tobytes()
