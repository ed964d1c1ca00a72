"""GT (pairing output) as an additive prime-order group.

Reference analog: ark-ec's PairingOutput (ec/src/pairing.rs:130-331) — a
wrapper over the target field that presents the multiplicative subgroup of
order r additively: zero = 1, add = field mul, double = cyclotomic square,
neg = cyclotomic (conjugate) inverse, scalar mul = cyclotomic exp. This
makes GT usable wherever a PrimeGroup is expected — notably GT MSM.

TPU shape: a GT batch is just a target-field coefficient stack; every group
op below is one batched tower op. ``GTGroup`` is a hashable jit-static
config wrapping the tower ExtOps + the scalar field spec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.core.fieldspec import LIMB_BITS
from zkarray.ff import cyclotomic as cyc


class GTGroup:
    """Additive-group view of the cyclotomic subgroup of a pairing target
    field. ``ext`` is the target tower ExtOps (Fp12/Fp6/Fp4), ``scalar`` the
    r-order scalar FieldSpec."""

    def __init__(self, ext, scalar):
        self.ext = ext
        self.scalar = scalar
        self.name = f"gt({ext.name})"

    def __hash__(self):
        return hash(("gt", self.ext, self.scalar))

    def __eq__(self, o):
        return (
            isinstance(o, GTGroup) and o.ext == self.ext and o.scalar == self.scalar
        )

    # --- group ops (additive notation; reference pairing.rs:186-235) ---

    def zero(self, batch_shape=()):
        return self.ext.one(batch_shape)

    def is_zero(self, a):
        return self.ext.eq(a, self.ext.one(self.ext.batch_shape_of(a)))

    def add(self, a, b):
        return self.ext.mul(a, b)

    def neg(self, a):
        return cyc.cyclotomic_inverse(self.ext, a)

    def sub(self, a, b):
        return self.ext.mul(a, self.neg(b))

    def double(self, a):
        return cyc.cyclotomic_sqr(self.ext, a)

    def select(self, mask, a, b):
        return self.ext.select(mask, a, b)

    def eq(self, a, b):
        return self.ext.eq(a, b)

    def mul_const(self, a, e: int):
        """a · e for a static integer e (host-unrolled NAF ladder)."""
        return cyc.cyclotomic_exp(self.ext, a, e % self.scalar.modulus)


@functools.partial(jax.jit, static_argnums=0)
def gt_mul_scalar(gt: GTGroup, a, scalars: jnp.ndarray):
    """a · s for device scalars (canonical limbs (Ls, *batch)) — a
    double-and-add ladder over the scalar bits (reference
    pairing.rs:237-252 mul_bigint)."""
    ext = gt.ext
    batch = ext.batch_shape_of(a)
    Ls = gt.scalar.num_limbs

    def body(r, bitrow):
        r = gt.double(r)
        rm = gt.add(r, a)
        return ext.select(jnp.broadcast_to(bitrow == 1, batch), rm, r), None

    nbits = Ls * LIMB_BITS
    rows = []
    for i in range(nbits - 1, -1, -1):
        limb, off = divmod(i, LIMB_BITS)
        rows.append((scalars[limb] >> off) & 1)
    bits = jnp.stack(rows)
    r, _ = jax.lax.scan(body, gt.zero(batch), bits)
    return r


@functools.partial(jax.jit, static_argnums=(0, 3))
def gt_msm(gt: GTGroup, points, scalars: jnp.ndarray, c: int = 3):
    """Σ scalars_i · points_i over GT — windowed Pippenger with one-hot
    bucket accumulation (bucket count 2^c is small; the GT batch axis is the
    last coefficient axis). ``points``: target-field stack with trailing
    batch axis (n,); ``scalars``: canonical limbs (Ls, n).

    Reference: PairingOutput inherits VariableBaseMSM's default
    (ec/src/pairing.rs:254-262, scalar_mul/variable_base/mod.rs:37-77).
    """
    ext = gt.ext
    n = scalars.shape[-1]
    Ls = gt.scalar.num_limbs
    nbits = gt.scalar.bits
    W = (nbits + c - 1) // c

    # unsigned window digits (W, n) — GT muls are costly, keep it simple
    digs = []
    for w in range(W):
        bitpos = w * c
        limb, off = divmod(bitpos, LIMB_BITS)
        raw = scalars[limb] >> off
        if off + c > LIMB_BITS and limb + 1 < Ls:
            raw = raw | (scalars[limb + 1] << (LIMB_BITS - off))
        digs.append(raw & np.uint32((1 << c) - 1))
    digits = jnp.stack(digs)  # (W, n) uint32

    B = (1 << c) - 1  # buckets 1..B

    def win_body(total, d):
        # total = total·2^c then add this window's bucket-weighted sum.
        # The whole body is ONE lax.scan step traced once — the round-4
        # version unrolled all W windows into a single graph whose XLA
        # compile exceeded 40 GB / 25 min (the same disease the field core
        # had before its round-2 scan compression).
        for _ in range(c):
            total = gt.double(total)
        # bucket[b] = product of points with digit b+1 (log-tree over n)
        onehot = d[None, :] == jnp.arange(1, B + 1, dtype=jnp.uint32)[:, None]
        pts = jnp.broadcast_to(
            points[..., None, :], points.shape[:-1] + (B, n)
        )
        one = gt.zero((B, n))
        sel = ext.select(onehot, pts, one)  # (…, B, n)
        m = n
        while m > 1:
            h = m // 2
            red = gt.add(sel[..., :h], sel[..., h : 2 * h])
            if m % 2:
                red = jnp.concatenate([red, sel[..., 2 * h :]], axis=-1)
                m = h + 1
            else:
                m = h
            sel = red
        buckets = sel[..., 0]  # (…, B)
        # suffix-sum: Σ (b+1)·bucket_b
        run = gt.zero(())
        acc = gt.zero(())
        for b in range(B - 1, -1, -1):
            run = gt.add(run, buckets[..., b])
            acc = gt.add(acc, run)
        return gt.add(total, acc), None

    total, _ = jax.lax.scan(win_body, gt.zero(()), digits[::-1])
    return total


# Public names; the gt_-prefixed jit identities keep their persistent-cache
# module names on zkarray/jaxcache.py's serialize-crash denylist (the
# BN254 Fp12 scan-ladder executables are the observed crash class).
mul_scalar = gt_mul_scalar
msm = gt_msm
