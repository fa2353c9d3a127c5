"""Groth16 prover for BN128 — the device pipeline of src/bn128.js:580-720.

Stage map (reference -> here):

  CALC_H worker command (bn128.js:126-166)   -> calc_h(): one jitted device
    toMontgomeryN, pol_constructLC x2,          program: to_mont, two
    ifft, fft(odd), interleave, mulN,           constructLC scatter kernels,
    ifft(2N), fromMontgomeryN                   NTT pipeline on limb planes
  5 x g1/g2_multiexp over worker pool        -> 5 MSM device programs, each
    (bn128.js:607-622)                          folded to ONE point on
                                                device; all dispatched
                                                before any host read, so
                                                the device queue stays full
                                                (the async analogue of the
                                                reference's 5 concurrent
                                                promises)
  main-thread proof assembly                 -> host oracle group ops
    (bn128.js:642-704)                          (a dozen scalar muls)

Multi-chip: pass a jax.sharding.Mesh and every MSM runs point-axis sharded
(parallel/mesh.py shard_map + ICI partial-sum fold — the reference's
chunk-per-worker MSM, src/bn128.js:353-415) and the CALC_H pipeline carries
a domain-axis sharding so GSPMD inserts the NTT collectives.

Randomization parity: r and s are 32 *unreduced* random bytes and the
r*s term uses their full 512-bit product (bn128.js:642-663, 700-702), so
proofs are distribution-identical with wasmsnark's.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..models.bn128 import bn128
from ..ops.fp import FpDevice
from ..ops.towers import FpAdapter, F2Device
from ..ops.curve import JacobianDevice
from ..ops.msm import MSMDevice
from ..ops.ntt import NTTDevice
from ..ops.pol import construct_lc
from ..utils.serialize import bytes_le_to_int
from .pkey import parse_pkey, read_witness, ProvingKey


def _module(curve: str):
    if curve == "bn128":
        return bn128()
    if curve == "bls12381":
        from ..models.bls12381 import bls12381
        return bls12381()
    raise ValueError(f"unknown curve {curve!r}")


class Groth16Prover:
    """Holds device kernel objects + jit caches for one curve module.

    Curve-generic over the jacobian-a0 families: "bn128" (the reference's
    production prover) and "bls12381" (the reference builds the full module
    but never wires a prover for it, SURVEY.md §2.2 — here the same pipeline
    serves both since every kernel is specialized by FieldSpec)."""

    def __init__(self, msm_window_bits: int | None = None,
                 curve: str = "bn128", mesh=None, artifacts=None):
        self.m = _module(curve)
        self.Fp = FpDevice(self.m.fp_spec)
        self.Fr = FpDevice(self.m.fr_spec)
        self.ntt = NTTDevice(self.m.ntt_spec, self.Fr)
        a1 = FpAdapter(self.Fp)
        self.G1d = JacobianDevice(a1)
        self.G2d = JacobianDevice(F2Device(a1, a1.neg))
        self.window_bits = msm_window_bits
        self.mesh = mesh
        # {name: jax.export.Exported} from artifacts.load_bundle: programs
        # whose input signatures match skip tracing + lowering entirely
        # (the build/*_wasm.js delivery guarantee); mismatches fall through
        # to the normal jit path.
        self._artifacts = artifacts or {}
        # set to a dict to capture jax.export.Exported programs as they
        # are built (tools/build_artifacts.py)
        self._export_capture = None
        self._jit_cache = {}
        # id -> (bytes ref, ProvingKey): repeated proves with the same key
        # bytes skip the multi-hundred-MB reparse (strong ref pins the id)
        self._pk_cache = {}

    def _resolve(self, name, args, build):
        """Artifact-or-jit program resolution: a matching exported program
        wins; otherwise build (and optionally capture an export of) the
        jitted program."""
        exp = self._artifacts.get(name)
        if exp is not None:
            from ..artifacts import exported_matches, wrap_exported
            if exported_matches(exp, args):
                ck = ("exp", name)
                if ck not in self._jit_cache:
                    self._jit_cache[ck] = wrap_exported(exp, self.mesh)
                return self._jit_cache[ck]
        if name not in self._jit_cache:
            self._jit_cache[name] = build()
        prog = self._jit_cache[name]
        if self._export_capture is not None \
                and name not in self._export_capture:
            from jax import export
            self._export_capture[name] = export.export(prog)(*args)
        return prog

    def _window_for(self, n: int) -> int:
        """Window width scales with MSM size (bucket-fold cost must amortize
        over N points — the analogue of the reference's fixed w=7 tuning at
        src/bn128.js:109, picked per size)."""
        if self.window_bits:
            return self.window_bits
        return 16 if n >= (1 << 16) else 12 if n >= (1 << 12) else 8 \
            if n >= (1 << 7) else 4

    def _msm(self, curve_key, scalars, points):
        """Dispatch one MSM folded to a single Jacobian point ON DEVICE.
        Returns device arrays (no host sync) — read with _point_host()."""
        n = scalars.shape[-1]
        c = self._window_for(n)
        name = f"msm_{curve_key}_c{c}" + ("_mesh" if self.mesh is not None
                                          else "")

        def build():
            dev = self.G1d if curve_key == "g1" else self.G2d
            # group_windows=None -> HBM-aware auto-sizing with equalized
            # groups (ops/msm.py _auto_gw): one 17-window group at 2^20 G1,
            # narrower equalized groups for the 2x-wider G2 leaves
            msm = MSMDevice(dev, window_bits=c, group_windows=None)
            if self.mesh is not None:
                from ..parallel.mesh import msm_sharded_point
                return msm_sharded_point(msm, self.mesh)
            return jax.jit(msm.msm_point)

        return self._resolve(name, (scalars, points), build)(scalars, points)

    # -- CALC_H (device) ------------------------------------------------------

    def _calc_h_args(self, pk: ProvingKey):
        """Device-resident runtime inputs for the CALC_H program: the pkey's
        QAP tables (lc_arrays) + the three NTT plans.  Uploaded once per
        proving key / domain (like the point planes) so the jitted program
        carries NO multi-MB constants — at 2^20 the baked-constant form
        serialized to hundreds of MB, breaking remote-compile transports
        (HTTP 413) and stalling XLA constant folding."""
        args = getattr(pk, "_calc_h_dev", None)
        if args is None:
            from ..ops.pol import lc_arrays
            bits = pk.domain_size.bit_length() - 1
            args = jax.device_put((
                lc_arrays(pk.pols_a),
                lc_arrays(pk.pols_b),
                self.ntt.plan(bits, inverse=True),
                self.ntt.plan(bits, odd=True),
                self.ntt.plan(bits + 1, inverse=True),
            ))
            object.__setattr__(pk, "_calc_h_dev", args)
        return args

    def calc_h(self, pk: ProvingKey, signals):
        """signals: [L, nSignals] canonical limb planes.  Returns [L, domain]
        canonical H coefficients (upper half of A*B), on device."""
        # the QAP tables are runtime inputs, so the program is generic in
        # everything but shapes — name it by the shapes
        key = (f"calc_h_d{pk.domain_size}_s{pk.n_signals}"
               f"_a{pk.pols_a.sig_idx.shape[0]}_b{pk.pols_b.sig_idx.shape[0]}")

        def build():
            Fr, ntt = self.Fr, self.ntt

            def run(sig, lca, lcb, pinv, podd, pinv2):
                sig_m = Fr.to_mont(sig)
                ea = construct_lc(Fr, lca, sig_m)
                eb = construct_lc(Fr, lcb, sig_m)
                ca = ntt.ifft(ea, plan=pinv)
                cb = ntt.ifft(eb, plan=pinv)
                oa = ntt.fft(ca, odd=True, plan=podd)
                ob = ntt.fft(cb, odd=True, plan=podd)
                L, n = ea.shape
                a2 = jnp.stack([ea, oa], axis=-1).reshape(L, 2 * n)
                b2 = jnp.stack([eb, ob], axis=-1).reshape(L, 2 * n)
                c2 = Fr.mont_mul(a2, b2)
                cc = ntt.ifft(c2, plan=pinv2)
                return Fr.from_mont(cc[:, n:])

            if self.mesh is not None:
                # domain-axis sharding: GSPMD inserts the collectives
                # between butterfly super-stages (SURVEY.md §2.5)
                from jax.sharding import NamedSharding, PartitionSpec as P
                ax = self.mesh.axis_names[0]
                sh = NamedSharding(self.mesh, P(None, ax))

                def sharded(sig, lca, lcb, pinv, podd, pinv2):
                    return jax.lax.with_sharding_constraint(
                        run(sig, lca, lcb, pinv, podd, pinv2), sh)

                return jax.jit(sharded)
            return jax.jit(run)

        sig = jnp.asarray(signals)
        args = (sig,) + self._calc_h_args(pk)
        return self._resolve(key, args, build)(*args)

    # -- proof ----------------------------------------------------------------

    def prove(self, witness, pkey, rng=None) -> dict:
        m = self.m
        if isinstance(pkey, ProvingKey):
            pk = pkey
        elif id(pkey) in self._pk_cache:
            pk = self._pk_cache[id(pkey)][1]
        else:
            pk = parse_pkey(pkey, m.fp_spec, m.fr_spec)
            if len(self._pk_cache) >= 4:
                self._pk_cache.clear()
            self._pk_cache[id(pkey)] = (pkey, pk)
        if isinstance(witness, (bytes, bytearray)):
            signals = read_witness(bytes(witness), m.fr_spec)
        else:
            from ..utils.serialize import ints_to_limbs_fast
            signals = ints_to_limbs_fast(
                [int(v) % m.Fr.q for v in witness], m.fr_spec.n_limbs)
        assert signals.shape[1] == pk.n_signals

        # point planes live on device across prove() calls (one upload per
        # proving key — the analogue of the reference workers keeping the
        # pkey slices resident in their WASM memories, bn128.js:353-415)
        # All four G1 sections are zero-padded to one common length at
        # upload, so every G1 MSM runs the SAME compiled program (zero
        # points (0,0) and zero scalar digits are absorbed by the complete
        # group law / empty buckets).  One compile instead of three — on
        # TPU each MSM compile is a large one-time cost, and the driver's
        # multichip dryrun pays it per program.
        dev = getattr(pk, "_device_points", None)
        if dev is None:
            g1_names = ("points_a", "points_b1", "points_c", "h_exps")
            n_pad = max(np.asarray(jax.tree.leaves(getattr(pk, nm))[0]
                                   ).shape[-1] for nm in g1_names)

            def pad_pts(tree):
                return jax.tree.map(
                    lambda a: np.concatenate(
                        [np.asarray(a), np.zeros(
                            a.shape[:-1] + (n_pad - a.shape[-1],), a.dtype)],
                        axis=-1) if a.shape[-1] < n_pad else a, tree)

            dev = {nm: jax.device_put(pad_pts(getattr(pk, nm)))
                   for nm in g1_names}
            dev["points_b2"] = jax.device_put(pk.points_b2)
            dev["n_pad"] = n_pad
            object.__setattr__(pk, "_device_points", dev)
        n_pad = dev["n_pad"]

        def pad_sc(s):
            if s.shape[-1] >= n_pad:
                return s
            return jnp.concatenate(
                [s, jnp.zeros(s.shape[:-1] + (n_pad - s.shape[-1],),
                              s.dtype)], axis=-1)

        # ---- dispatch ALL device work before any host read ----
        sig_dev = jnp.asarray(signals)
        h = self.calc_h(pk, sig_dev)
        d_a = self._msm("g1", pad_sc(sig_dev), dev["points_a"])
        d_b1 = self._msm("g1", pad_sc(sig_dev), dev["points_b1"])
        d_b2 = self._msm("g2", sig_dev, dev["points_b2"])
        d_c = self._msm("g1", pad_sc(sig_dev[:, pk.n_public + 1:]),
                        dev["points_c"])
        d_h = self._msm("g1", pad_sc(h), dev["h_exps"])

        # ---- single sync point: read back 5 Jacobian points ----
        pi_a = self._g1_host(d_a)
        pib1 = self._g1_host(d_b1)
        pi_b = self._g2_host(d_b2)
        pi_c = self._g1_host(d_c)
        p_h = self._g1_host(d_h)

        # ---- randomized assembly (bn128.js:642-704) ----
        G1, G2 = m.G1, m.G2
        if rng is None:
            rnd = os.urandom
        elif callable(rng):
            rnd = rng
        else:
            import random as _r
            _rr = _r.Random(rng)
            rnd = lambda n: _rr.randbytes(n)
        r = bytes_le_to_int(rnd(32))
        s = bytes_le_to_int(rnd(32))

        alfa1 = G1.from_affine(*pk.alfa1)
        beta1 = G1.from_affine(*pk.beta1)
        delta1 = G1.from_affine(*pk.delta1)
        beta2 = G2.from_affine(*pk.beta2)
        delta2 = G2.from_affine(*pk.delta2)

        pi_a = G1.add(pi_a, alfa1)
        pi_a = G1.add(pi_a, G1.times_scalar(delta1, r))

        pi_b = G2.add(pi_b, beta2)
        pi_b = G2.add(pi_b, G2.times_scalar(delta2, s))

        pib1 = G1.add(pib1, beta1)
        pib1 = G1.add(pib1, G1.times_scalar(delta1, s))

        pi_c = G1.add(pi_c, p_h)
        pi_c = G1.add(pi_c, G1.times_scalar(pi_a, s))
        pi_c = G1.add(pi_c, G1.times_scalar(pib1, r))
        pi_c = G1.add(pi_c, G1.neg(G1.times_scalar(delta1, r * s)))

        pa = G1.affine(pi_a)
        pb = G2.affine(pi_b)
        pc = G1.affine(pi_c)
        return {
            "pi_a": [str(pa[0]), str(pa[1]), str(pa[2])],
            "pi_b": [[str(pb[0][0]), str(pb[0][1])],
                     [str(pb[1][0]), str(pb[1][1])],
                     [str(pb[2][0]), str(pb[2][1])]],
            "pi_c": [str(pc[0]), str(pc[1]), str(pc[2])],
            "protocol": "groth",
        }

    # -- device -> host point unmarshalling -----------------------------------

    def _g1_host(self, p):
        """Device Jacobian point (leaves [L]) -> host oracle point."""
        F = self.Fp
        return tuple(F.unpack_mont(np.asarray(c)[:, None])[0] for c in p)

    def _g2_host(self, p):
        F = self.Fp
        return tuple(
            tuple(F.unpack_mont(np.asarray(cc)[:, None])[0] for cc in c)
            for c in p)


@functools.lru_cache(maxsize=8)
def _prover(window_bits, curve) -> Groth16Prover:
    return Groth16Prover(window_bits, curve=curve)


def groth16_gen_proof(witness, pkey, *, rng=None, msm_window_bits=None,
                      curve: str = "bn128"):
    """Module-level entry used by the curve runtimes."""
    return _prover(msm_window_bits, curve).prove(witness, pkey, rng=rng)
