"""Extension-field towers as leading-axis coefficient stacks.

Reference analog: ark-ff's QuadExtField/CubicExtField models and tower
configs (ff/src/fields/models/{quadratic_extension.rs:25-162,
cubic_extension.rs, fp2.rs, fp6_3over2.rs, fp12_2over3over2.rs}). An Fp12
element is an array of shape (2, 3, 2, L, *batch); each level's ops recurse
into the base level. Multiplication uses Karatsuba (quad) and the 6-mul
Toom-style schedule (cubic), squaring uses the complex / CH-SQR2 methods —
the same algebraic schedules as the reference, batched over planar limbs.

Frobenius coefficient tables are derived generically at construction time via
host-side tower arithmetic (tower_host.py) instead of shipped literals.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.core.fieldspec import FieldSpec
from zkarray.ff import fp
from zkarray.ff.tower_host import HostExt, HostPrime


class PrimeOps:
    """Bottom of the tower: the prime field (shape prefix ())."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.deg_abs = 1
        self.shape = ()
        self.host = HostPrime(spec.modulus)
        self.name = spec.name

    def __hash__(self):
        return hash(("prime", self.spec))

    def __eq__(self, o):
        return isinstance(o, PrimeOps) and o.spec == self.spec

    # array ops — a, b: (L, *batch)
    def add(self, a, b):
        return fp.add(self.spec, a, b)

    def sub(self, a, b):
        return fp.sub(self.spec, a, b)

    def neg(self, a):
        return fp.neg(self.spec, a)

    def double(self, a):
        return fp.double(self.spec, a)

    def mul(self, a, b):
        return fp.mont_mul(self.spec, a, b)

    def sqr(self, a):
        return fp.mont_sqr(self.spec, a)

    def inv(self, a):
        return fp.inv(self.spec, a)

    def batch_inv(self, a):
        return fp.batch_inv(self.spec, a)

    def zero(self, batch_shape=()):
        return fp.zero(self.spec, batch_shape)

    def one(self, batch_shape=()):
        return fp.one(self.spec, batch_shape)

    def const(self, host_elem: int, batch_shape=()):
        return fp.const_array(self.spec, host_elem, batch_shape)

    def mul_const(self, a, host_elem: int):
        if host_elem % self.spec.modulus == self.spec.modulus - 1:
            return fp.neg(self.spec, a)
        return fp.mont_mul(self.spec, a, fp.const_array(self.spec, host_elem, ()))

    def frobenius(self, a, i: int):
        return a  # identity on the prime field

    def is_zero(self, a):
        return fp.is_zero(self.spec, a)

    def eq(self, a, b):
        return fp.eq(a, b)

    def select(self, mask, a, b):
        return fp.select(mask, a, b)

    def batch_shape_of(self, a):
        return a.shape[1:]

    def to_ints(self, a):
        return fp.to_ints(self.spec, a)

    def from_ints(self, xs):
        return fp.from_ints(self.spec, xs)


class ExtOps:
    """Degree-``deg`` extension of ``base`` by u^deg = nonresidue.

    Arrays: (deg,) + base.shape + (L, *batch). ``nonresidue_host`` is a host
    element of the base field (canonical nested tuples / int).
    """

    def __init__(
        self,
        name: str,
        base,
        deg: int,
        nonresidue_host,
        mul_nonresidue_hook: Optional[Callable] = None,
    ):
        assert deg in (2, 3)
        self.name = name
        self.base = base
        self.deg = deg
        self.deg_abs = deg * base.deg_abs
        self.shape = (deg,) + base.shape
        self.spec = base.spec  # bottom prime spec
        self.nonresidue_host = nonresidue_host
        self._nr_hook = mul_nonresidue_hook
        self.host = HostExt(base.host, deg, nonresidue_host)
        # Frobenius tables: C_j[i] = β^{j (p^i - 1)/deg} (base elems), j < deg
        p = self.spec.modulus
        self._frob = []
        for i in range(self.deg_abs):
            c1 = self.host.frobenius_c1(i)
            row = [base.host.one()]
            for j in range(1, deg):
                prev = row[-1]
                row.append(
                    base.host.mul(prev, c1)
                    if not isinstance(base.host, HostPrime)
                    else (prev * c1) % p
                )
            self._frob.append(row)

    def __hash__(self):
        return hash(("ext", self.name, self.base, self.deg))

    def __eq__(self, o):
        return (
            isinstance(o, ExtOps)
            and o.name == self.name
            and o.deg == self.deg
            and o.base == self.base
        )

    # ---- structural helpers ----

    def _stack(self, parts):
        return jnp.stack(parts, axis=0)

    def zero(self, batch_shape=()):
        z = self.base.zero(batch_shape)
        return self._stack([z] * self.deg)

    def one(self, batch_shape=()):
        parts = [self.base.one(batch_shape)] + [
            self.base.zero(batch_shape) for _ in range(self.deg - 1)
        ]
        return self._stack(parts)

    def const(self, host_elem, batch_shape=()):
        return self._stack(
            [self.base.const(c, batch_shape) for c in host_elem]
        )

    def batch_shape_of(self, a):
        return self.base.batch_shape_of(a[0])

    def to_ints(self, a):
        """-> list over coeff-lex order of canonical int lists."""
        return [self.base.to_ints(a[j]) for j in range(self.deg)]

    # ---- linear ops ----

    def add(self, a, b):
        return self._stack([self.base.add(a[j], b[j]) for j in range(self.deg)])

    def sub(self, a, b):
        return self._stack([self.base.sub(a[j], b[j]) for j in range(self.deg)])

    def neg(self, a):
        return self._stack([self.base.neg(a[j]) for j in range(self.deg)])

    def double(self, a):
        return self._stack([self.base.double(a[j]) for j in range(self.deg)])

    def mul_base(self, a, s):
        """a · s with s a base-field array."""
        return self._stack([self.base.mul(a[j], s) for j in range(self.deg)])

    def mul_nonresidue(self, x):
        """x · β for x a BASE-field array (hot path in mul/sqr).

        Reference: mul_base_field_by_nonresidue hooks (fp2.rs / fp6_3over2.rs).
        """
        if self._nr_hook is not None:
            return self._nr_hook(self.base, x)
        return self.base.mul_const(x, self.nonresidue_host) if isinstance(
            self.base, PrimeOps
        ) else self.base.mul(x, self.base.const(self.nonresidue_host, self.base.batch_shape_of(x)))

    def mul_const(self, a, host_elem):
        """a · c for a host constant c of THIS field (generic)."""
        c = self.const(host_elem, self.batch_shape_of(a))
        return self.mul(a, c)

    # ---- multiplication / squaring ----

    def _mul_many(self, pairs):
        """Batch k base-level products into ONE recursive multiplication by
        stacking operands on a fresh batch axis. Bottoms out in a single
        fused mont_mul over k·batch lanes instead of k separate unrolled
        CIOS graphs — the "few, bigger jit units" rule; a full Fp12 mul
        becomes one 18·n-lane Fp2-level → 54·n-lane prime-level mul chain
        instead of 54 individual muls (compile-time AND VPU-occupancy win).
        """
        B = self.base
        ax = len(B.shape) + 1  # position after coeff axes + limb axis

        # Align every operand to one common batch shape BEFORE stacking:
        # mixed batches (e.g. a () - batch curve constant times an (n,)
        # batch coordinate) would otherwise cross-broadcast inside the
        # fused mul into an (n, n) batch — silently wrong shapes.
        ops = [p[i] for p in pairs for i in (0, 1)]
        batch = jnp.broadcast_shapes(*(o.shape[ax:] for o in ops))

        def bc(x):
            lead = x.shape[:ax]
            cur = x.shape[ax:]
            x = x.reshape(lead + cur + (1,) * (len(batch) - len(cur)))
            return jnp.broadcast_to(x, lead + batch)

        xs = jnp.stack([bc(p[0]) for p in pairs], axis=ax)
        ys = jnp.stack([bc(p[1]) for p in pairs], axis=ax)
        prod = B.mul(xs, ys)
        return [jnp.take(prod, i, axis=ax) for i in range(len(pairs))]

    def mul(self, a, b):
        B = self.base
        if self.deg == 2:
            # Karatsuba (reference quadratic_extension.rs mul)
            v0, v1, v01 = self._mul_many(
                [
                    (a[0], b[0]),
                    (a[1], b[1]),
                    (B.add(a[0], a[1]), B.add(b[0], b[1])),
                ]
            )
            c0 = B.add(v0, self.mul_nonresidue(v1))
            c1 = B.sub(B.sub(v01, v0), v1)
            return self._stack([c0, c1])
        # cubic: 6-mul Toom-style (reference cubic_extension.rs mul)
        v0, v1, v2, m12, m01, m02 = self._mul_many(
            [
                (a[0], b[0]),
                (a[1], b[1]),
                (a[2], b[2]),
                (B.add(a[1], a[2]), B.add(b[1], b[2])),
                (B.add(a[0], a[1]), B.add(b[0], b[1])),
                (B.add(a[0], a[2]), B.add(b[0], b[2])),
            ]
        )
        t0 = B.sub(B.sub(m12, v1), v2)
        c0 = B.add(v0, self.mul_nonresidue(t0))
        t1 = B.sub(B.sub(m01, v0), v1)
        c1 = B.add(t1, self.mul_nonresidue(v2))
        t2 = B.sub(B.sub(m02, v0), v2)
        c2 = B.add(t2, v1)
        return self._stack([c0, c1, c2])

    def sqr(self, a):
        B = self.base
        if self.deg == 2:
            # complex-style: 2 base muls (reference quad ext square_in_place)
            v, t = self._mul_many(
                [
                    (a[0], a[1]),
                    (B.add(a[0], a[1]), B.add(a[0], self.mul_nonresidue(a[1]))),
                ]
            )
            c0 = B.sub(B.sub(t, v), self.mul_nonresidue(v))
            c1 = B.double(v)
            return self._stack([c0, c1])
        # CH-SQR2 (reference cubic_extension.rs square_in_place)
        m = B.add(B.sub(a[0], a[1]), a[2])
        s0, ab, s2, bc, s4 = self._mul_many(
            [(a[0], a[0]), (a[0], a[1]), (m, m), (a[1], a[2]), (a[2], a[2])]
        )
        s1 = B.double(ab)
        s3 = B.double(bc)
        c0 = B.add(s0, self.mul_nonresidue(s3))
        c1 = B.add(s1, self.mul_nonresidue(s4))
        c2 = B.sub(B.add(B.add(s1, s2), s3), B.add(s0, s4))
        return self._stack([c0, c1, c2])

    # ---- inversion ----

    def inv(self, a):
        B = self.base
        if self.deg == 2:
            # norm = c0^2 - β c1^2 (reference quadratic_extension.rs norm)
            norm = B.sub(B.sqr(a[0]), self.mul_nonresidue(B.sqr(a[1])))
            ninv = B.inv(norm)
            return self._stack([B.mul(a[0], ninv), B.neg(B.mul(a[1], ninv))])
        # cubic (reference cubic_extension.rs inverse)
        t0 = B.sqr(a[0])
        t1 = B.sqr(a[1])
        t2 = B.sqr(a[2])
        t3 = B.mul(a[0], a[1])
        t4 = B.mul(a[0], a[2])
        t5 = B.mul(a[1], a[2])
        n0 = B.sub(t0, self.mul_nonresidue(t5))
        n1 = B.sub(self.mul_nonresidue(t2), t3)
        n2 = B.sub(t1, t4)
        # det = a0·n0 + β(a2·n1 + a1·n2)
        det = B.add(
            B.mul(a[0], n0),
            self.mul_nonresidue(B.add(B.mul(a[2], n1), B.mul(a[1], n2))),
        )
        dinv = B.inv(det)
        return self._stack(
            [B.mul(n0, dinv), B.mul(n1, dinv), B.mul(n2, dinv)]
        )

    # ---- frobenius / conjugation ----

    def frobenius(self, a, i: int):
        """a^(p^i). Reference: frobenius_map with coefficient tables."""
        i = i % self.deg_abs
        parts = []
        for j in range(self.deg):
            cj = self.base.frobenius(a[j], i)
            coeff = self._frob[i][j]
            if j > 0:
                cj = (
                    self.base.mul_const(cj, coeff)
                    if isinstance(self.base, PrimeOps)
                    else self.base.mul(
                        cj, self.base.const(coeff, self.base.batch_shape_of(cj))
                    )
                )
            parts.append(cj)
        return self._stack(parts)

    def conjugate(self, a):
        """Quadratic conjugate (a0, -a1) — also the cyclotomic inverse."""
        assert self.deg == 2
        return self._stack([a[0], self.base.neg(a[1])])

    # ---- predicates ----

    def is_zero(self, a):
        m = self.base.is_zero(a[0])
        for j in range(1, self.deg):
            m = m & self.base.is_zero(a[j])
        return m

    def eq(self, a, b):
        m = self.base.eq(a[0], b[0])
        for j in range(1, self.deg):
            m = m & self.base.eq(a[j], b[j])
        return m

    def select(self, mask, a, b):
        return self._stack(
            [self.base.select(mask, a[j], b[j]) for j in range(self.deg)]
        )

    def from_ints(self, nested):
        """Nested lists (coeff-major) of canonical ints -> device array."""
        return self._stack([self.base.from_ints(c) for c in nested])


def quad_sqrt(F2: "ExtOps", a):
    """Batched square root in a quadratic extension Fp2 = Fp[u]/(u² − β)
    over a PRIME base field. Returns ``(root, is_square mask)``; root is 0
    where ``a`` is not a square.

    Reference analog: Field::sqrt via SqrtPrecomputation is generic over the
    extension (ff/src/fields/sqrt.rs:86-216) but runs the divergent
    Tonelli–Shanks loop in Fp2 itself; here the classic norm trick reduces
    to TWO prime-field sqrts (fixed structure, batch-friendly):
    with n = a0² − β·a1² and d = √n, x0 = √((a0+d)/2) (or √((a0−d)/2) —
    either consistent choice works) and x1 = a1/(2·x0). The returned root is
    verified by squaring, so non-squares are reported exactly.
    """
    from zkarray.ff import fp as _fp

    assert F2.deg == 2 and isinstance(F2.base, PrimeOps)
    spec = F2.spec
    p = spec.modulus
    beta = F2.nonresidue_host
    a0, a1 = a[0], a[1]
    batch = a0.shape[1:]

    n = _fp.sub(
        spec,
        _fp.mont_sqr(spec, a0),
        _fp.mont_mul(
            spec, _fp.mont_sqr(spec, a1), _fp.const_array(spec, beta % p, ())
        ),
    )
    d, _ = _fp.sqrt(spec, n)
    half = _fp.const_array(spec, pow(2, -1, p), ())
    t1 = _fp.mont_mul(spec, _fp.add(spec, a0, d), half)
    r1, ok1 = _fp.sqrt(spec, t1)
    t2 = _fp.mont_mul(spec, _fp.sub(spec, a0, d), half)
    r2, _ok2 = _fp.sqrt(spec, t2)
    x0 = _fp.select(ok1, r1, r2)
    x1 = _fp.mont_mul(spec, a1, _fp.inv(spec, _fp.double(spec, x0)))

    # a1 == 0: a = a0 ∈ Fp — root is (√a0, 0), or (0, √(a0/β)) since
    # (x1·u)² = β·x1².
    ra, a0_sq = _fp.sqrt(spec, a0)
    rb, _ = _fp.sqrt(
        spec, _fp.mont_mul(spec, a0, _fp.const_array(spec, pow(beta % p, -1, p), ()))
    )
    a1z = _fp.is_zero(spec, a1)
    z = _fp.zero(spec, batch)
    c0 = _fp.select(a1z, _fp.select(a0_sq, ra, z), x0)
    c1 = _fp.select(a1z, _fp.select(a0_sq, z, rb), x1)
    cand = jnp.stack([c0, c1])

    ok = F2.eq(F2.sqr(cand), a)
    return F2.select(ok, cand, F2.zero(batch)), ok
