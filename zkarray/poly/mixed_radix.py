"""Mixed-radix evaluation domains: sizes 2^a · q^b for fields with a small
multiplicative subgroup (e.g. MNT6-753, q = 5).

Reference analog: MixedRadixEvaluationDomain (poly/src/domain/
mixed_radix.rs:29-632). Algorithm here: recursive Cooley–Tukey n = n1·n2
splits (the same four-step structure as the distributed NTT), with
power-of-two parts hitting the fast radix-2 core and small odd radix parts
evaluated by a naive DFT block (q² muls, fully batched).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.core.fieldspec import FieldSpec
from zkarray.ff import fp
from zkarray.poly.domain import _fft_core, distribute_powers, power_table


def _naive_dft(spec, A, n, w_int):
    """DFT over axis 1 of (L, n, *rest) by direct summation (small n)."""
    pt = power_table(spec, w_int, n)  # (L, n)
    idx = (np.arange(n)[:, None] * np.arange(n)[None, :]) % n  # [k, j]
    T = jnp.take(pt, jnp.asarray(idx.astype(np.int32)).reshape(-1), axis=1).reshape(
        spec.num_limbs, n, n
    )
    rest = A.shape[2:]
    r1 = (1,) * len(rest)
    out = None
    for j in range(n):
        tj = T[:, :, j].reshape((spec.num_limbs, n) + r1)
        term = fp.mont_mul(spec, tj, A[:, j][:, None])
        out = term if out is None else fp.add(spec, out, term)
    return out


def _fft_any(spec, A, n, w_int):
    """DFT over axis 1 of (L, n, *rest), any n = 2^a · q^b."""
    if n == 1:
        return A
    if n & (n - 1) == 0:
        return _fft_core(spec, A, n, w_int, None)
    if n <= 32:
        return _naive_dft(spec, A, n, w_int)
    # split n = n1 · n2 with n1 = 2^a (if any) else smallest prime factor
    a = (n & -n).bit_length() - 1
    if a > 0:
        n1 = 1 << a
    else:
        n1 = 3
        while n % n1:
            n1 += 2
    n2 = n // n1
    p = spec.modulus
    L = A.shape[0]
    rest = A.shape[2:]
    A2 = A.reshape((L, n1, n2) + rest)
    B = _fft_any(spec, A2, n1, pow(w_int, n2, p))  # over i1
    # twiddles w^{k1·i2}
    idx = (np.arange(n1)[:, None] * np.arange(n2)[None, :]) % n
    pt = power_table(spec, w_int, n)
    T = jnp.take(pt, jnp.asarray(idx.astype(np.int32)).reshape(-1), axis=1).reshape(
        (L, n1, n2) + (1,) * len(rest)
    )
    C = fp.mont_mul(spec, B, T)
    Ct = jnp.moveaxis(C, 2, 1)  # (L, n2, n1, *rest)
    E = _fft_any(spec, Ct, n2, pow(w_int, n1, p))  # over i2 → [k2, k1]
    return E.reshape((L, n) + rest)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _mixed_fft(spec, arr, n, w_int, scale_int):
    out = _fft_any(spec, arr.reshape(spec.num_limbs, n, 1), n, w_int)[:, :, 0]
    if scale_int is not None:
        out = fp.mont_mul(spec, out, fp.const_array(spec, scale_int, (1,)))
    return out


def best_mixed_domain_size(spec: FieldSpec, target: int) -> int:
    """Smallest 2^a·q^b >= target supported by the field (reference
    mixed_radix.rs best_mixed_domain_size)."""
    q = spec.small_subgroup_base
    if q is None:
        raise ValueError("field has no small subgroup")
    best = None
    for b in range(spec.small_subgroup_base_adicity + 1):
        qb = q**b
        need = -(-target // qb)
        a = max(0, (need - 1).bit_length())
        if a > spec.two_adicity:
            continue
        size = (1 << a) * qb
        if size >= target and (best is None or size < best):
            best = size
    if best is None:
        raise ValueError(f"no mixed domain of size >= {target}")
    return best


class MixedRadixDomain:
    """Coset offset·<g> with |<g>| = 2^a · q^b."""

    def __init__(self, spec: FieldSpec, size: int, offset_int: int = 1):
        p = spec.modulus
        n = size
        a = (n & -n).bit_length() - 1
        rest = n >> a
        q = spec.small_subgroup_base
        b = 0
        if q is not None:
            while rest % q == 0:
                rest //= q
                b += 1
        if rest != 1:
            raise ValueError(f"size {size} is not 2^a·q^b for this field")
        self.spec = spec
        self.size = size
        self.group_gen_int = spec.root_of_unity(size)
        self.group_gen_inv_int = pow(self.group_gen_int, -1, p)
        self.size_inv_int = pow(size, -1, p)
        self.offset_int = offset_int % p
        self.offset_inv_int = pow(self.offset_int, -1, p)
        self.offset_pow_size_int = pow(self.offset_int, size, p)

    def fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        spec, n = self.spec, self.size
        m = coeffs.shape[1]
        if m < n:
            coeffs = jnp.pad(coeffs, ((0, 0), (0, n - m)))
        if self.offset_int != 1:
            coeffs = distribute_powers(spec, coeffs, self.offset_int)
        return _mixed_fft(spec, coeffs, n, self.group_gen_int, None)

    def ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        spec, n = self.spec, self.size
        out = _mixed_fft(spec, evals, n, self.group_gen_inv_int, self.size_inv_int)
        if self.offset_int != 1:
            out = distribute_powers(spec, out, self.offset_inv_int)
        return out

    def elements(self) -> jnp.ndarray:
        t = power_table(self.spec, self.group_gen_int, self.size)
        if self.offset_int != 1:
            t = fp.mont_mul(
                self.spec, t, fp.const_array(self.spec, self.offset_int, (1,))
            )
        return t
