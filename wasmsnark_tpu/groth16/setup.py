"""Groth16 trusted setup (test/tooling use), curve-generic, device-accelerated.

The reference consumes keys produced by old snarkjs ("groth" protocol) via
tools/buildpkey.js; its committed multi-MB key blobs are stripped from the
snapshot (.MISSING_LARGE_BLOBS), so e2e prover tests generate their own:
an R1CS -> QAP-in-evaluation-basis -> pkey/vk pipeline compatible with the
reference binary format and verifier equation.

Conventions matched to the reference prover (src/bn128.js:580-720):
  * polsA/polsB store the R1CS A/B matrix entries keyed by constraint index
    (evaluation basis on the 2^k domain) — constructLC then yields A(x), B(x)
    evaluations directly;
  * H consumed by the prover is the upper coefficient half of A*B, which
    equals (A*B - C)/Z for Z = x^N - 1 given A*B = C on the domain, so
    hExps[j] = [tau^j * Z(tau) / delta] G1;
  * like old snarkjs, one binding constraint (s_i)*(0) = 0 is appended per
    public signal (including ONE) so public-input A-polynomials are nonzero.

Scale: the point arrays (≈ 5N points at N signals/constraints) are produced
by the batched fixed-base engine (ops/fixed_base.py) — one device program
per section instead of N host ladders — so a 2^20-constraint key
materializes in seconds and streams to disk in the reference binary layout.
Host-side scalar work uses Montgomery-trick batch inversion for the
Lagrange denominators.

Any curve module with the standard surface (Fr, G1, G2, ntt_spec, fp/fr
specs) works — BN128 by default, and BLS12-381 (where the reference builds
the full WASM module but never wires a prover, SURVEY.md §2.2) through
`setup(r1cs, module=bls12381())`.
"""

from __future__ import annotations

import dataclasses
import random

import numpy as np

from ..models.bn128 import bn128, R
from .pkey import write_pkey, write_witness


@dataclasses.dataclass
class R1CS:
    """Constraints as (A, B, C) dicts {signal_idx: Fr coef}; signal 0 is ONE."""
    n_signals: int
    n_public: int  # public *outputs/inputs* excluding ONE
    constraints: list  # [(dictA, dictB, dictC)]


def square_chain_circuit(k: int) -> R1CS:
    """Prove knowledge of x with x^(2^k) = out.

    signals: [1, out, x, s_1, ..., s_{k-1}]  (s_i = x^(2^i))
    constraints: s_{i+1} = s_i * s_i  (the last one writes `out`).
    """
    n_signals = k + 2
    cons = []
    for i in range(k):
        src = 2 if i == 0 else 2 + i
        dst = 1 if i == k - 1 else 3 + i
        cons.append(({src: 1}, {src: 1}, {dst: 1}))
    return R1CS(n_signals=n_signals, n_public=1, constraints=cons)


def square_chain_witness(r1cs_k: int, x: int, r: int = R):
    s = [x % r]
    for _ in range(r1cs_k):
        s.append(s[-1] * s[-1] % r)
    out = s[-1]
    return [1, out, s[0]] + s[1:-1]


def _batch_inv(vals, q):
    """Montgomery-trick batch inversion: 3 muls/elem + one pow."""
    n = len(vals)
    pref = [1] * (n + 1)
    for i, v in enumerate(vals):
        pref[i + 1] = pref[i] * v % q
    inv = pow(pref[n], -1, q)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = pref[i] * inv % q
        inv = inv * vals[i] % q
    return out


def _device_sections(m, scalar_sets):
    """scalar_sets: list of (name, 'g1'|'g2', [int scalars]).  Returns
    {name: affine Montgomery planes} computed on device via the fixed-base
    engine, in batches bounded for HBM."""
    import jax
    from ..ops.fp import FpDevice
    from ..ops.towers import FpAdapter, F2Device
    from ..ops.curve import JacobianDevice
    from ..ops.fixed_base import FixedBase
    from ..utils.serialize import ints_to_limbs_fast

    fr_bits = m.fr_spec.n_limbs * 16
    Fp = FpDevice(m.fp_spec)
    a1 = FpAdapter(Fp)

    def pack_comp(vals):
        return Fp.pack_mont(vals)

    engines = {}

    def engine(kind):
        if kind not in engines:
            if kind == "g1":
                engines[kind] = FixedBase(
                    JacobianDevice(a1), m.G1, m.g1_gen, pack_comp, fr_bits)
            else:
                engines[kind] = FixedBase(
                    JacobianDevice(F2Device(a1, a1.neg)), m.G2, m.g2_gen,
                    pack_comp, fr_bits)
        return engines[kind]

    out = {}
    CHUNK = 1 << 18
    for name, kind, scalars in scalar_sets:
        eng = engine(kind)
        parts = []
        for lo in range(0, len(scalars), CHUNK):
            sl = ints_to_limbs_fast(scalars[lo:lo + CHUNK], m.fr_spec.n_limbs)
            aff = eng.points_affine(sl)
            parts.append(jax.tree.map(np.asarray, aff))
        if len(parts) == 1:
            out[name] = parts[0]
        else:
            out[name] = jax.tree.map(
                lambda *xs: np.concatenate(xs, axis=-1), *parts)
    return out


def setup(r1cs: R1CS, seed: int = 42, module=None, accel: bool | None = None):
    """Run the trusted setup; returns (pkey_bytes, vk_dict, toxic) with the
    toxic waste exposed for test assertions only.

    accel: True -> generate the point sections on device (fixed-base batch
    engine); False -> host oracle ladders; None -> auto (device for big
    circuits)."""
    m = module if module is not None else bn128()
    R = m.Fr.q
    rng = random.Random(seed)

    # binding constraints for public signals (old snarkjs convention)
    constraints = list(r1cs.constraints)
    for i in range(r1cs.n_public + 1):
        constraints.append(({i: 1}, {}, {}))
    n_cons = len(constraints)
    bits = max(1, (n_cons - 1).bit_length())
    domain = 1 << bits
    assert domain <= 1 << m.ntt_spec.max_bits

    tau = rng.randrange(1, R)
    alfa = rng.randrange(1, R)
    beta = rng.randrange(1, R)
    gamma = rng.randrange(1, R)
    delta = rng.randrange(1, R)

    # Lagrange values L_c(tau) = w^c (tau^N - 1) / (N (tau - w^c))
    w = m.ntt_spec.roots[bits]
    z_tau = (pow(tau, domain, R) - 1) % R
    n_inv = pow(domain, -1, R)
    wcs = []
    wc = 1
    for _ in range(n_cons):
        wcs.append(wc)
        wc = wc * w % R
    denom_inv = _batch_inv([(tau - wc) % R for wc in wcs], R)
    lag = [wcs[c] * z_tau % R * n_inv % R * denom_inv[c] % R
           for c in range(n_cons)]

    # QAP evaluations at tau per signal
    a_tau = [0] * r1cs.n_signals
    b_tau = [0] * r1cs.n_signals
    c_tau = [0] * r1cs.n_signals
    pols_a = [dict() for _ in range(r1cs.n_signals)]
    pols_b = [dict() for _ in range(r1cs.n_signals)]
    for cidx, (A, B, C) in enumerate(constraints):
        for s, v in A.items():
            a_tau[s] = (a_tau[s] + v * lag[cidx]) % R
            pols_a[s][cidx] = v % R
        for s, v in B.items():
            b_tau[s] = (b_tau[s] + v * lag[cidx]) % R
            pols_b[s][cidx] = v % R
        for s, v in C.items():
            c_tau[s] = (c_tau[s] + v * lag[cidx]) % R

    G1, G2 = m.G1, m.G2
    g1, g2 = m.g1_gen, m.g2_gen

    def g1pt(k):
        p = G1.times_scalar(g1, k % R)
        return None if G1.is_zero(p) else G1.affine(p)[:2]

    def g2pt(k):
        p = G2.times_scalar(g2, k % R)
        return None if G2.is_zero(p) else G2.affine(p)[:2]

    dinv = pow(delta, -1, R)
    ginv = pow(gamma, -1, R)

    k_c = [
        (beta * a_tau[i] + alfa * b_tau[i] + c_tau[i]) % R * dinv % R
        for i in range(r1cs.n_public + 1, r1cs.n_signals)
    ]
    k_h = []
    tj = 1
    zd = z_tau * dinv % R
    for _ in range(domain):
        k_h.append(tj * zd % R)
        tj = tj * tau % R

    if accel is None:
        accel = (r1cs.n_signals + domain) >= (1 << 12)

    if accel:
        planes = _device_sections(m, [
            ("a", "g1", a_tau),
            ("b1", "g1", b_tau),
            ("b2", "g2", b_tau),
            ("c", "g1", k_c),
            ("h", "g1", k_h),
        ])
        points_a = planes["a"]
        points_b1 = planes["b1"]
        points_b2 = planes["b2"]
        points_c = planes["c"]
        h_exps = planes["h"]
    else:
        points_a = [g1pt(a_tau[i]) for i in range(r1cs.n_signals)]
        points_b1 = [g1pt(b_tau[i]) for i in range(r1cs.n_signals)]
        points_b2 = [g2pt(b_tau[i]) for i in range(r1cs.n_signals)]
        points_c = [g1pt(k) for k in k_c]
        h_exps = [g1pt(k) for k in k_h]

    ic = [
        g1pt((beta * a_tau[i] + alfa * b_tau[i] + c_tau[i]) % R * ginv % R)
        for i in range(r1cs.n_public + 1)
    ]

    pkey = write_pkey(
        m.fp_spec, m.fr_spec,
        n_public=r1cs.n_public, domain_size=domain,
        alfa1=g1pt(alfa), beta1=g1pt(beta), delta1=g1pt(delta),
        beta2=g2pt(beta), delta2=g2pt(delta),
        pols_a=pols_a, pols_b=pols_b,
        points_a=points_a, points_b1=points_b1, points_b2=points_b2,
        points_c=points_c, h_exps=h_exps,
    )

    def g1_json(pt):
        return [str(pt[0]), str(pt[1]), "1"] if pt else ["0", "1", "0"]

    def g2_json(pt):
        if not pt:
            return [["0", "0"], ["1", "0"], ["0", "0"]]
        return [[str(pt[0][0]), str(pt[0][1])],
                [str(pt[1][0]), str(pt[1][1])],
                ["1", "0"]]

    vk = {
        "protocol": "groth",
        "nPublic": r1cs.n_public,
        "vk_alfa_1": g1_json(g1pt(alfa)),
        "vk_beta_2": g2_json(g2pt(beta)),
        "vk_gamma_2": g2_json(g2pt(gamma)),
        "vk_delta_2": g2_json(g2pt(delta)),
        "IC": [g1_json(p) for p in ic],
    }
    toxic = dict(tau=tau, alfa=alfa, beta=beta, gamma=gamma, delta=delta)
    return pkey, vk, toxic
