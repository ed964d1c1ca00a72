"""Cyclotomic-subgroup fast arithmetic for pairing target fields.

Reference analog: ark-ff's CyclotomicMultSubgroup (ff/src/fields/
cyclotomic.rs:11-124) — fast inverse (= conjugate for quadratic-topped
towers: fp4.rs:67-76, fp6_2over3.rs:115-124, fp12_2over3over2.rs:127-133)
and the Granger–Scott cyclotomic square for degree-12 towers
(fp12_2over3over2.rs:134-215, "Faster Squaring in the Cyclotomic Subgroup
of Sixth Degree Extensions", Granger & Scott 2009).

After the easy part of the final exponentiation the Miller value lies in
the cyclotomic subgroup (order Φ_12(p)); there a squaring decomposes into
three Fp4 squarings on the coefficient pairs (z0,z1), (z2,z3), (z4,z5) —
9 Fp2 multiplications instead of a full Fp12 square's 12+. All functions
are batched over planar limb arrays like the rest of the tower layer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def char_sq_mod_6_is_one(modulus: int) -> bool:
    """Applicability predicate for the Granger–Scott square (reference
    fp12_2over3over2.rs:112-125): p^2 ≡ 1 (mod 6)."""
    return (modulus * modulus) % 6 == 1


def gs_cyclotomic_sqr(fq12, f):
    """Granger–Scott cyclotomic square in an Fp12 = 2over3over2 tower.

    ``f`` must be in the cyclotomic subgroup (e.g. any final-exp output or
    post-easy-part Miller value). 9 Fp2 muls; the coefficient shuffle
    (r0,r4,r3,r2,r1,r5) matches the reference's z-ordering so results are
    bit-identical to arkworks' cyclotomic_square_in_place.
    """
    fq6 = fq12.base
    B = fq6.base  # Fp2 ops
    nr = fq6.mul_nonresidue  # ×(Fp6 nonresidue), an Fp2->Fp2 map

    r0, r4, r3 = f[0][0], f[0][1], f[0][2]
    r2, r1, r5 = f[1][0], f[1][1], f[1][2]

    # three Fp4 squarings (a + b·y)² — all six Fp2 products are independent,
    # so batch them through one fused prime-level mul (towers._mul_many)
    def fp4_ops(a, b):
        return [(a, b), (B.add(a, b), B.add(nr(b), a))]

    m01, s01, m23, s23, m45, s45 = fq6._mul_many(
        fp4_ops(r0, r1) + fp4_ops(r2, r3) + fp4_ops(r4, r5)
    )

    def fp4_out(tmp, smul):
        return B.sub(B.sub(smul, tmp), nr(tmp)), B.double(tmp)

    t0, t1 = fp4_out(m01, s01)
    t2, t3 = fp4_out(m23, s23)
    t4, t5 = fp4_out(m45, s45)

    # z0 = 3·t0 − 2·r0 ; z1 = 3·t1 + 2·r1
    z0 = B.add(B.double(B.sub(t0, r0)), t0)
    z1 = B.add(B.double(B.add(t1, r1)), t1)
    # z2 = 3·(ξ·t5) + 2·r2 ; z3 = 3·t4 − 2·r3
    xt5 = nr(t5)
    z2 = B.add(B.double(B.add(xt5, r2)), xt5)
    z3 = B.add(B.double(B.sub(t4, r3)), t4)
    # z4 = 3·t2 − 2·r4 ; z5 = 3·t3 + 2·r5
    z4 = B.add(B.double(B.sub(t2, r4)), t2)
    z5 = B.add(B.double(B.add(t3, r5)), t3)

    c0 = fq6._stack([z0, z4, z3])
    c1 = fq6._stack([z2, z1, z5])
    return fq12._stack([c0, c1])


def cyclotomic_sqr(ext, f):
    """Best cyclotomic square for a quadratic-topped tower: Granger–Scott
    when the tower is 2over3over2 and p^2 ≡ 1 mod 6, else a plain square
    (the reference's default: cyclotomic.rs:37-40)."""
    if (
        ext.deg == 2
        and getattr(ext.base, "deg", 0) == 3
        and getattr(ext.base.base, "deg", 0) == 2
        and char_sq_mod_6_is_one(ext.spec.modulus)
    ):
        return gs_cyclotomic_sqr(ext, f)
    return ext.sqr(f)


def cyclotomic_inverse(ext, f):
    """Conjugate = inverse inside the cyclotomic subgroup (INVERSE_IS_FAST
    for quadratic extensions; reference cyclotomic.rs:16-17)."""
    return ext.conjugate(f)


def find_naf(e: int):
    """Signed NAF digits, LSB first (reference ff/src/biginteger/
    arithmetic.rs find_naf)."""
    digits = []
    while e > 0:
        if e & 1:
            z = 2 - (e % 4)
            e -= z
            digits.append(z)
        else:
            digits.append(0)
        e >>= 1
    return digits


@functools.partial(jax.jit, static_argnums=(0, 2))
def cyclotomic_exp(ext, f, e: int):
    """f^e for static e ≥ 0 via a lax.scan NAF ladder with cyclotomic
    squarings and conjugate-for-negative-digit (reference
    cyclotomic.rs:77-124). ``f`` must be in the cyclotomic subgroup.

    Jitted so its persistent-cache entry carries the function name: the
    eager scan's cache write deterministically segfaulted
    executable.serialize() (round 4) and the jaxcache denylist keys on
    module names."""
    if e == 0:
        return ext.one(ext.batch_shape_of(f))
    batch = ext.batch_shape_of(f)
    naf = find_naf(e)[::-1]  # MSB first
    finv = cyclotomic_inverse(ext, f)
    digits = jnp.asarray(np.asarray(naf, dtype=np.int32))

    def body(r, d):
        r = cyclotomic_sqr(ext, r)
        rp = ext.mul(r, f)
        rn = ext.mul(r, finv)
        r = ext.select(
            jnp.broadcast_to(d > 0, batch),
            rp,
            ext.select(jnp.broadcast_to(d < 0, batch), rn, r),
        )
        return r, None

    r, _ = jax.lax.scan(body, ext.one(batch), digits)
    return r


@functools.partial(jax.jit, static_argnums=(0, 2))
def cyclotomic_exp_binary(ext, f, e: int):
    """f^e via plain binary square-and-multiply with cyclotomic squarings —
    1 mul/bit in the scan body (cheaper than the NAF ladder's 2 under XLA's
    execute-both-branches select) — use when e has dense bits."""
    if e == 0:
        return ext.one(ext.batch_shape_of(f))
    batch = ext.batch_shape_of(f)
    bits = jnp.asarray(np.asarray([int(b) for b in bin(e)[2:]], dtype=np.uint32))

    def body(r, bit):
        r = cyclotomic_sqr(ext, r)
        rm = ext.mul(r, f)
        return ext.select(jnp.broadcast_to(bit == 1, batch), rm, r), None

    r, _ = jax.lax.scan(body, ext.one(batch), bits)
    return r
