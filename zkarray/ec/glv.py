"""GLV endomorphism-accelerated scalar multiplication.

Reference analog: ec/src/scalar_mul/glv.rs:12-166 — scalar decomposition
k = k1 + λ·k2 via the LLL-reduced lattice basis (rational rounding), then a
joint double-and-add over the half-length scalars with φ(P) = (β·x, y).

Decomposition is host-side Python-int math (exact rational rounding, one pass
per batch element); the joint Straus ladder runs batched on device with half
the serial depth of plain double-and-add.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.core import limbs as lb
from zkarray.ec import sw
from zkarray.ec.sw import AffinePoints, JacobianPoints, SWCurveSpec
from zkarray.ff import fp


class GLVSpec:
    def __init__(self, curve: SWCurveSpec, endo_coeff: int, lam: int, decomp):
        """decomp: [(sign, abs), ...] 2x2 row-major [n11, n12, n21, n22]."""
        self.curve = curve
        self.endo_coeff = endo_coeff
        self.lam = lam
        self.decomp = [(s if isinstance(s, bool) else s >= 0, abs(v)) for s, v in decomp]

    def __hash__(self):
        return hash((self.curve, self.endo_coeff, self.lam))

    def __eq__(self, o):
        return isinstance(o, GLVSpec) and (o.curve, o.lam) == (self.curve, self.lam)

    def decompose(self, k: int) -> Tuple[int, int]:
        """k ≡ k1 + λ·k2 (mod r); returns signed (k1, k2), |ki| ≈ √r.

        Reference: GLVConfig::scalar_decomposition (glv.rs:29-100)."""
        r = self.curve.scalar.modulus
        sgn = lambda t: t[1] if t[0] else -t[1]
        n11, n12, n21, n22 = (sgn(t) for t in self.decomp)

        def round_div(a, b):
            d, m = divmod(a, b)
            return d + (1 if 2 * m > b else 0)

        beta_1 = round_div(k * n22, r)
        beta_2 = round_div(k * (-n12), r)
        b1 = beta_1 * n11 + beta_2 * n21
        b2 = beta_1 * n12 + beta_2 * n22
        k1 = k - b1
        k2 = -b2
        assert (k1 + self.lam * k2 - k) % r == 0
        return k1, k2


def endomorphism(g: GLVSpec, A: AffinePoints) -> AffinePoints:
    """φ(x, y) = (β·x, y) (reference glv.rs endomorphism_affine)."""
    f = g.curve.base
    return AffinePoints(
        fp.mont_mul(f, A.x, fp.const_array(f, g.endo_coeff, ())), A.y, A.inf
    )


def glv_mul(g: GLVSpec, A: AffinePoints, scalars) -> JacobianPoints:
    """Batched k_i·P_i via GLV: decompose on host, joint ladder on device.

    ``scalars``: list of Python ints (host) — decomposition requires exact
    rational rounding.
    """
    curve = g.curve
    f = curve.base
    halfbits = (curve.scalar.bits + 1) // 2 + 2
    k1s, k2s, s1s, s2s = [], [], [], []
    for k in scalars:
        k1, k2 = g.decompose(int(k) % curve.scalar.modulus)
        s1s.append(k1 < 0)
        s2s.append(k2 < 0)
        k1s.append(abs(k1))
        k2s.append(abs(k2))
    L = curve.scalar.num_limbs
    k1a = jnp.asarray(lb.ints_to_limbs_np(k1s, L))
    k2a = jnp.asarray(lb.ints_to_limbs_np(k2s, L))
    s1 = jnp.asarray(np.asarray(s1s))
    s2 = jnp.asarray(np.asarray(s2s))
    return _glv_ladder(g, A, k1a, k2a, s1, s2, halfbits)


@functools.partial(jax.jit, static_argnums=(0, 6))
def _glv_ladder(g: GLVSpec, A, k1, k2, s1, s2, nbits: int) -> JacobianPoints:
    curve = g.curve
    f = curve.base
    batch = A.x.shape[1:]
    # sign-adjusted bases: P' = ±P, Q' = ±φ(P)
    P = AffinePoints(A.x, fp.select(s1, fp.neg(f, A.y), A.y), A.inf)
    phiA = endomorphism(g, A)
    Q = AffinePoints(phiA.x, fp.select(s2, fp.neg(f, phiA.y), phiA.y), phiA.inf)
    # table: P+Q for the (1,1) digit
    PQ = sw.to_affine(
        curve, sw.jac_add_mixed(curve, sw.from_affine(curve, P), Q)
    )

    limb_tab = jnp.asarray(
        np.asarray([(nbits - 1 - i) // 16 for i in range(nbits)], dtype=np.int32)
    )
    shift_tab = jnp.asarray(
        np.asarray([(nbits - 1 - i) % 16 for i in range(nbits)], dtype=np.int32)
    )

    def body(acc, ls):
        limb, shift = ls
        b1 = (jnp.take(k1, limb, axis=0) >> shift) & 1
        b2 = (jnp.take(k2, limb, axis=0) >> shift) & 1
        acc = sw.jac_double(curve, acc)
        # select addend among {P, Q, P+Q} (and skip when both bits 0)
        both = (b1 == 1) & (b2 == 1)
        only1 = (b1 == 1) & (b2 == 0)
        addend = AffinePoints(
            fp.select(both, PQ.x, fp.select(only1, P.x, Q.x)),
            fp.select(both, PQ.y, fp.select(only1, P.y, Q.y)),
            jnp.where(both, PQ.inf, jnp.where(only1, P.inf, Q.inf)),
        )
        added = sw.jac_add_mixed(curve, acc, addend)
        skip = (b1 == 0) & (b2 == 0)
        return sw._select_jac(~skip, added, acc), None

    acc0 = sw.jac_zero(curve, batch)
    acc, _ = jax.lax.scan(body, acc0, (limb_tab, shift_tab))
    return acc


# ---- standard GLV parameter sets (reference curves/*/src/curves/g1.rs) ----

def bls12_381_g1_glv():
    from zkarray.curves import bls12_381 as b

    return GLVSpec(
        b.G1,
        endo_coeff=793479390729215512621379701633421447060886740281060493010456487427281649075476305620758731620350,
        lam=52435875175126190479447740508185965837461563690374988244538805122978187051009,
        decomp=[
            (True, 228988810152649578064853576960394133504),
            (True, 1),
            (False, 1),
            (True, 228988810152649578064853576960394133503),
        ],
    )


def bn254_g1_glv():
    from zkarray.curves import bn254 as b

    return GLVSpec(
        b.G1,
        endo_coeff=21888242871839275220042445260109153167277707414472061641714758635765020556616,
        lam=21888242871839275217838484774961031246154997185409878258781734729429964517155,
        decomp=[
            (False, 147946756881789319000765030803803410728),
            (True, 9931322734385697763),
            (False, 9931322734385697763),
            (False, 147946756881789319010696353538189108491),
        ],
    )


def bls12_377_g1_glv():
    from zkarray.curves import bls12_377 as b

    return GLVSpec(
        b.G1,
        endo_coeff=258664426012969093929703085429980814127835149614277183275038967946009968870203535512256352201271898244626862047231,
        lam=8444461749428370424248824938781546531284005582649182570233710176290576793600,
        decomp=[
            (True, 91893752504881257701523279626832445441),
            (True, 1),
            (False, 1),
            (True, 91893752504881257701523279626832445440),
        ],
    )


def bw6_761_g1_glv():
    from zkarray.curves import bw6_761 as b

    return GLVSpec(
        b.G1,
        endo_coeff=4922464560225523242118178942575080391082002530232324381063048548642823052024664478336818169867474395270858391911405337707247735739826664939444490469542109391530482826728203582549674992333383150446779312029624171857054392282775648,
        lam=258664426012969093929703085429980814127835149614277183275038967946009968870203535512256352201271898244626862047231,
        decomp=[
            (True, 293634935485640680722085584138834120324914961969255022593),
            (False, 293634935485640680722085584138834120315328839056164388863),
            (True, 293634935485640680722085584138834120315328839056164388863),
            (True, 587269870971281361444171168277668240640243801025419411456),
        ],
    )


def pallas_glv():
    from zkarray.curves import zoo

    return GLVSpec(
        zoo.PALLAS,
        endo_coeff=20444556541222657078399132219657928148671392403212669005631716460534733845831,
        lam=26005156700822196841419187675678338661165322343552424574062261873906994770353,
        decomp=[
            (False, 98231058071100081932162823354453065728),
            (True, 98231058071186745657228807397848383489),
            (False, 196462116142286827589391630752301449217),
            (False, 98231058071100081932162823354453065728),
        ],
    )


def vesta_glv():
    from zkarray.curves import zoo

    return GLVSpec(
        zoo.VESTA,
        endo_coeff=26005156700822196841419187675678338661165322343552424574062261873906994770353,
        lam=20444556541222657078399132219657928148671392403212669005631716460534733845831,
        decomp=[
            (False, 98231058071100081932162823354453065729),
            (True, 98231058071186745657228807397848383488),
            (False, 196462116142286827589391630752301449217),
            (False, 98231058071100081932162823354453065729),
        ],
    )


# ---------------------------------------------------------------------------
# extension-field (G2) GLV — reference implements GLVConfig for G2 too
# (curves/bls12_381/src/curves/g2.rs:193-222, bls12_377/g2.rs, bn254/g2.rs)
# ---------------------------------------------------------------------------

class GLVSpecExt:
    """GLV for an ExtCurveSpec (SW curve over Fq2/Fq3): the endomorphism is
    x ↦ ENDO·x with ENDO a host extension-field constant."""

    def __init__(self, curve, endo_host, lam: int, decomp):
        self.curve = curve
        self.endo_host = endo_host
        self.lam = lam
        self.decomp = [
            (s if isinstance(s, bool) else s >= 0, abs(v)) for s, v in decomp
        ]

    def __hash__(self):
        return hash((self.curve, self.lam))

    def __eq__(self, o):
        return isinstance(o, GLVSpecExt) and (o.curve, o.lam) == (self.curve, self.lam)

    # identical lattice math to GLVSpec.decompose (glv.rs:29-100)
    def decompose(self, k: int):
        r = self.curve.scalar.modulus
        sgn = lambda t: t[1] if t[0] else -t[1]
        n11, n12, n21, n22 = (sgn(t) for t in self.decomp)

        def round_div(a, b):
            d, m = divmod(a, b)
            return d + (1 if 2 * m > b else 0)

        beta_1 = round_div(k * n22, r)
        beta_2 = round_div(k * (-n12), r)
        b1 = beta_1 * n11 + beta_2 * n21
        b2 = beta_1 * n12 + beta_2 * n22
        k1 = k - b1
        k2 = -b2
        assert (k1 + self.lam * k2 - k) % r == 0
        return k1, k2


def endomorphism_ext(g: GLVSpecExt, A):
    """φ(x, y) = (ENDO·x, y) on an extension-field curve."""
    from zkarray.ec import sw_ext

    F = g.curve.ops
    ex = F.mul(A.x, F.const(g.endo_host, F.batch_shape_of(A.x)))
    return sw_ext.ExtAffine(ex, A.y, A.inf)


def glv_mul_ext(g: GLVSpecExt, A, scalars):
    """Batched k_i·P_i on a G2-style curve via GLV (host decomposition +
    device joint Straus ladder). Returns ExtJacobian."""
    from zkarray.ec import sw_ext

    curve = g.curve
    halfbits = (curve.scalar.bits + 1) // 2 + 2
    k1s, k2s, s1s, s2s = [], [], [], []
    for k in scalars:
        k1, k2 = g.decompose(int(k) % curve.scalar.modulus)
        s1s.append(k1 < 0)
        s2s.append(k2 < 0)
        k1s.append(abs(k1))
        k2s.append(abs(k2))
    L = curve.scalar.num_limbs
    k1a = jnp.asarray(lb.ints_to_limbs_np(k1s, L))
    k2a = jnp.asarray(lb.ints_to_limbs_np(k2s, L))
    s1 = jnp.asarray(np.asarray(s1s))
    s2 = jnp.asarray(np.asarray(s2s))
    return _glv_ladder_ext(g, A, k1a, k2a, s1, s2, halfbits)


@functools.partial(jax.jit, static_argnums=(0, 6))
def _glv_ladder_ext(g: GLVSpecExt, A, k1, k2, s1, s2, nbits: int):
    from zkarray.ec import sw_ext

    curve = g.curve
    F = curve.ops
    batch = F.batch_shape_of(A.x)
    P = sw_ext.ExtAffine(A.x, F.select(s1, F.neg(A.y), A.y), A.inf)
    phiA = endomorphism_ext(g, A)
    Q = sw_ext.ExtAffine(phiA.x, F.select(s2, F.neg(phiA.y), phiA.y), phiA.inf)
    PQ = sw_ext.to_affine(
        curve, sw_ext.add(curve, sw_ext.from_affine(curve, P), sw_ext.from_affine(curve, Q))
    )

    limb_tab = jnp.asarray(
        np.asarray([(nbits - 1 - i) // 16 for i in range(nbits)], dtype=np.int32)
    )
    shift_tab = jnp.asarray(
        np.asarray([(nbits - 1 - i) % 16 for i in range(nbits)], dtype=np.int32)
    )

    def sel_aff(mask, a, b):
        return sw_ext.ExtAffine(
            F.select(mask, a.x, b.x),
            F.select(mask, a.y, b.y),
            jnp.where(mask, a.inf, b.inf),
        )

    def body(acc, ls):
        limb, shift = ls
        b1 = (jnp.take(k1, limb, axis=0) >> shift) & 1
        b2 = (jnp.take(k2, limb, axis=0) >> shift) & 1
        acc = sw_ext.double(curve, acc)
        both = (b1 == 1) & (b2 == 1)
        only1 = (b1 == 1) & (b2 == 0)
        addend = sel_aff(both, PQ, sel_aff(only1, P, Q))
        added = sw_ext.add(curve, acc, sw_ext.from_affine(curve, addend))
        skip = (b1 == 0) & (b2 == 0)
        return sw_ext._sel(curve, ~skip, added, acc), None

    acc0 = sw_ext.zero(curve, batch)
    acc, _ = jax.lax.scan(body, acc0, (limb_tab, shift_tab))
    return acc


def bls12_381_g2_glv() -> GLVSpecExt:
    """Reference: curves/bls12_381/src/curves/g2.rs:193-222."""
    from zkarray.curves import bls12_381 as b

    return GLVSpecExt(
        b.G2,
        endo_host=(
            793479390729215512621379701633421447060886740281060493010456487427281649075476305620758731620350,
            0,
        ),
        lam=228988810152649578064853576960394133503,
        decomp=[
            (False, 228988810152649578064853576960394133503),
            (True, 1),
            (False, 1),
            (False, 228988810152649578064853576960394133504),
        ],
    )
