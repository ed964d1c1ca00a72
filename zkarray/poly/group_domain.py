"""FFT over group elements — the DomainCoeff abstraction.

Reference analog: ark-poly's `DomainCoeff<F>` blanket trait
(poly/src/domain/mod.rs:332-362): anything with Add/Sub/Zero and
MulAssign<F> can be FFT'd — in particular elliptic-curve point vectors
(used by KZG-style commitment schemes to FFT over G1).

TPU shape: values are pytrees (e.g. sw.JacobianPoints); an ops adapter
provides batched add/sub/zero/select and ``scale_rows`` (multiply each
element by a per-position static field scalar — for curve points a
double-and-add scan over the scalar's bits). The transform is the same
in-order DIT as the field NTT (domain.py:_fft_core), with the butterfly's
twiddle multiply replaced by the adapter's scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.ec import sw
from zkarray.ff import fp
from zkarray.poly.domain import Radix2Domain, _bitrev_perm


class SWJacobianCoeff:
    """DomainCoeff ops for a batch of SW Jacobian points (JacobianPoints
    pytree with batch axis last)."""

    def __init__(self, curve):
        self.curve = curve

    def zero(self, batch_shape):
        return sw.jac_zero(self.curve, batch_shape)

    def add(self, a, b):
        return sw.jac_add(self.curve, a, b)

    def sub(self, a, b):
        return sw.jac_add(self.curve, a, sw.jac_neg(self.curve, b))

    def take(self, a, idx):
        return sw.JacobianPoints(
            a.x[:, idx], a.y[:, idx], a.z[:, idx]
        )

    def concat(self, a, b):
        return sw.JacobianPoints(
            jnp.concatenate([a.x, b.x], axis=1),
            jnp.concatenate([a.y, b.y], axis=1),
            jnp.concatenate([a.z, b.z], axis=1),
        )

    def select(self, mask, a, b):
        return sw.JacobianPoints(
            fp.select(mask, a.x, b.x),
            fp.select(mask, a.y, b.y),
            fp.select(mask, a.z, b.z),
        )

    def scale_rows(self, a, scalars_int):
        """a[i] · k_i for host-int scalars (len == batch), double-and-add
        over the canonical bits of the k_i (all scalars share one ladder;
        a bit matrix selects per element)."""
        ks = [int(k) % self.curve.scalar.modulus for k in scalars_int]
        nbits = max(max(k.bit_length() for k in ks), 1)
        bits = np.zeros((nbits, len(ks)), dtype=bool)
        for j, k in enumerate(ks):
            for b in range(nbits):
                bits[nbits - 1 - b, j] = (k >> b) & 1
        bits_d = jnp.asarray(bits)
        batch = a.x.shape[1:]

        def body(acc, row):
            acc = sw.jac_double(self.curve, acc)
            added = sw.jac_add(self.curve, acc, a)
            return self.select(row, added, acc), None

        acc, _ = jax.lax.scan(body, self.zero(batch), bits_d)
        return acc


def fft_group(dom: Radix2Domain, gops, values, inverse: bool = False):
    """In-order radix-2 (i)FFT of a group-element vector on ``dom``.

    ``values``: ops pytree with batch axis of length dom.size. Matches the
    reference's `fft`/`ifft` over DomainCoeff (coset offsets act through
    scalar multiplication; ifft folds in n^{-1}).
    """
    n = dom.size
    p = dom.spec.modulus
    if inverse:
        w = dom.group_gen_inv_int
    else:
        w = dom.group_gen_int
    if not inverse and dom.offset_int != 1:
        values = gops.scale_rows(
            values, [pow(dom.offset_int, j, p) for j in range(n)]
        )
    log_n = n.bit_length() - 1
    x = gops.take(values, jnp.asarray(_bitrev_perm(log_n)))
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        # twiddle for the hi half of each block ((j%half)·n/m-th root power),
        # 1 elsewhere; DIT butterfly (lo, hi) -> (lo + w·hi, lo − w·hi)
        wtab = [
            pow(w, (j % m - half) * (n // m), p) if (j % m) >= half else 1
            for j in range(n)
        ]
        lo_idx = np.asarray(
            [j for j in range(n) if (j % m) < half], dtype=np.int32
        )
        hi_idx = lo_idx + half
        t = gops.scale_rows(x, wtab)
        lo = gops.take(t, jnp.asarray(lo_idx))
        hi = gops.take(t, jnp.asarray(hi_idx))
        summ = gops.add(lo, hi)
        diff = gops.sub(lo, hi)
        # scatter back: out[lo_idx] = summ, out[hi_idx] = diff
        order = np.empty(n, dtype=np.int32)
        order[lo_idx] = np.arange(n // 2)
        order[hi_idx] = n // 2 + np.arange(n // 2)
        x = gops.take(gops.concat(summ, diff), jnp.asarray(order))
    if inverse:
        ninv = pow(n, -1, p)
        scal = [ninv] * n
        if dom.offset_int != 1:
            scal = [
                ninv * pow(dom.offset_inv_int, j, p) % p for j in range(n)
            ]
        x = gops.scale_rows(x, scal)
    return x
