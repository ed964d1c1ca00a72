"""Radix-2 evaluation domains and the batched NTT.

Reference analog: ark-poly's Radix2EvaluationDomain + FFT engine
(poly/src/domain/radix2/{mod.rs:22-164, fft.rs:14-381}) and the
EvaluationDomain trait (poly/src/domain/mod.rs:31-329). The reference runs an
iterative Cooley–Tukey with rayon-parallel chunked butterflies; here every
butterfly stage is one batched field op over the whole (L, n) planar limb
array (XLA vectorizes over lanes), with the twiddle table built on device in
log-depth doubling steps and all per-domain scalars (group_gen, size_inv,
offset) precomputed as Python ints at domain construction.

Output convention matches the reference: ``fft(coeffs)[k] = f(offset·g^k)``
with g the size-n root of unity, natural order.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from zkarray.core.fieldspec import FieldSpec
from zkarray.ff import fp


def _bitrev_perm(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.int32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def power_table(spec: FieldSpec, w_int: int, n: int) -> jnp.ndarray:
    """(L, n) Montgomery-form table [w^0, w^1, ..., w^(n-1)].

    Log-depth doubling: T_{2m} = [T_m, T_m · w^m], with w^m host-computed
    constants (reference: roots_of_unity recursive doubling,
    poly/src/domain/radix2/fft.rs:156-187).
    """
    p = spec.modulus
    t = fp.one(spec, (1,))
    m = 1
    while m < n:
        shift = fp.const_array(spec, pow(w_int, m, p), (min(m, n - m),))
        t = jnp.concatenate([t, fp.mont_mul(spec, t[:, : n - m], shift)], axis=1)
        m *= 2
    return t


@functools.partial(jax.jit, static_argnums=(0, 2))
def distribute_powers(spec: FieldSpec, arr: jnp.ndarray, c_int: int) -> jnp.ndarray:
    """arr[j] *= c^j (coset twist; reference poly/src/domain/mod.rs:115-148)."""
    n = arr.shape[1]
    return fp.mont_mul(spec, arr, power_table(spec, c_int, n))


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def twiddle_table(spec: FieldSpec, w_int: int, n1: int, n2: int) -> jnp.ndarray:
    """(L, n1, n2) table T[k1, i2] = w^{k1·i2} in n1·n2 field muls.

    Log-depth doubling over the k1 axis with a VECTOR base b[i2] = w^{i2}:
    T_{2m} = [T_m, T_m · b^m] — no O(n)-element gather (an index-built
    table costs ~9 ns/element on this TPU's gather engine; at 2^24 that is
    150 ms of pure index overhead vs one extra mul pass here)."""
    base = power_table(spec, w_int, n2)  # (L, n2)
    T = fp.one(spec, (1, n2))
    bpow = base[:, None, :]
    m = 1
    while m < n1:
        T = jnp.concatenate(
            [T, fp.mont_mul(spec, T[:, : n1 - m], bpow)], axis=1
        )
        bpow = fp.mont_sqr(spec, bpow)
        m *= 2
    return T


# Above this size the flat radix-2 ladder's early stages slice the minor
# (lane) axis at widths < 128 — measured lane-misaligned copies dominate.
# The four-step split keeps every butterfly's minor axis >= sqrt(n)/2.
FOURSTEP_MIN = 1 << 16
# Above this, chunked EXECUTION (fft_fourstep_big) keeps peak HBM at
# in + out + one working block.
FOURSTEP_BIG = 1 << 23


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def fft_fourstep_core(
    spec: FieldSpec, x: jnp.ndarray, n1: int, n2: int, w_int: int,
    scale_int: Optional[int] = None,
) -> jnp.ndarray:
    """Single-device four-step (Bailey) NTT: (L, n) flat, i = i1·n2 + i2 →
    (L, n) natural order. Reference: the cache-blocked view of
    poly/src/domain/radix2/fft.rs:213-295's stage ladder.

    HBM discipline (2^24 = 1 GB per array copy on this chip): the
    k1-twiddle multiply runs chunked in-place over a fori_loop carry —
    building the full (L, n1, n2) table OOM'd the v5-lite HBM (measured
    round 4)."""
    L = x.shape[0]
    n = n1 * n2
    p = spec.modulus
    A = x.reshape(L, n1, n2)
    B = _fft_core(spec, A, n1, pow(w_int, n2, p), None)  # over i1, rest (n2,)

    # C[k1, i2] = B[k1, i2] · w^{k1·i2}, chunked over k1 (CH chunks): the
    # chunk's twiddle block T[k1] = base^{k1} advances by ∘ w^{m·i2} between
    # chunks; updates land in-place in the donated carry.
    CH = 8 if n1 % 8 == 0 and n1 >= 64 else 1
    m = n1 // CH
    T0 = twiddle_table(spec, w_int, m, n2)  # (L, m, n2), n/CH elements
    step = power_table(spec, pow(w_int, m, p), n2)[:, None, :]  # w^{m·i2}

    def body(c, carry):
        Bc, Tc = carry
        blk = jax.lax.dynamic_slice(Bc, (0, c * m, 0), (L, m, n2))
        blk = fp.mont_mul(spec, blk, Tc)
        Bc = jax.lax.dynamic_update_slice(Bc, blk, (0, c * m, 0))
        return Bc, fp.mont_mul(spec, Tc, step)

    if CH == 1:
        C = fp.mont_mul(spec, B, twiddle_table(spec, w_int, n1, n2))
    else:
        C, _ = jax.lax.fori_loop(0, CH, body, (B, T0))
    Ct = C.transpose(0, 2, 1)  # (L, n2, n1)
    E = _fft_core(spec, Ct, n2, pow(w_int, n1, p), scale_int)  # [k2, k1]
    return E.reshape(L, n)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5))
def fft_fourstep_big(
    spec: FieldSpec, x: jnp.ndarray, n1: int, n2: int, w_int: int,
    scale_int: Optional[int] = None,
) -> jnp.ndarray:
    """Four-step NTT with CHUNKED EXECUTION for sizes where even two spare
    full-array temporaries blow HBM (2^24 = 1 GB/copy; this chip holds
    ~3 GB of live arrays). Both sub-FFT passes run column-block by
    column-block inside fori_loops whose carry is updated in place, so the
    peak is in + out + one ~n/CH working set. Same math as
    fft_fourstep_core."""
    L = x.shape[0]
    n = n1 * n2
    p = spec.modulus
    CH = 8
    assert n2 % CH == 0 and n1 % CH == 0
    m2 = n2 // CH
    m1 = n1 // CH
    w1 = pow(w_int, n2, p)
    w2 = pow(w_int, n1, p)
    A = x.reshape(L, n1, n2)

    # pass 1: size-n1 FFT over axis 1 for each i2-block, then the k1-twiddle
    # T[k1, i2] = w^{k1·i2} built per block (log-depth doubling over k1)
    def body1(c, out):
        blk = jax.lax.dynamic_slice(A, (0, 0, c * m2), (L, n1, m2))
        blk = _fft_core(spec, blk, n1, w1, None)
        base = jax.lax.dynamic_slice(
            full_base, (0, c * m2), (L, m2)
        )  # w^{i2} for the block
        T = fp.one(spec, (1, m2))
        bpow = base[:, None, :]
        mlen = 1
        while mlen < n1:
            T = jnp.concatenate(
                [T, fp.mont_mul(spec, T[:, : n1 - mlen], bpow)], axis=1
            )
            bpow = fp.mont_sqr(spec, bpow)
            mlen *= 2
        blk = fp.mont_mul(spec, blk, T)
        return jax.lax.dynamic_update_slice(out, blk, (0, 0, c * m2))

    full_base = power_table(spec, w_int, n2)  # (L, n2)
    C = jax.lax.fori_loop(0, CH, body1, jnp.zeros_like(A))
    Ct = C.transpose(0, 2, 1)  # (L, n2, n1)

    # pass 2: size-n2 FFT over axis 1 for each k1-block
    def body2(c, out):
        blk = jax.lax.dynamic_slice(Ct, (0, 0, c * m1), (L, n2, m1))
        blk = _fft_core(spec, blk, n2, w2, scale_int)
        return jax.lax.dynamic_update_slice(out, blk, (0, 0, c * m1))

    E = jax.lax.fori_loop(0, CH, body2, jnp.zeros_like(Ct))
    return E.reshape(L, n)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _fft_core(
    spec: FieldSpec, arr: jnp.ndarray, n: int, w_int: int, scale_int: Optional[int]
) -> jnp.ndarray:
    """In-order → in-order radix-2 NTT over axis 1 of (L, n, *rest) with root
    w (DIT after bit-reversal); ``rest`` axes are independent batch transforms
    (used by the four-step distributed NTT). If scale_int is given, outputs
    are scaled by it (fuses n^{-1} into the inverse transform)."""
    L = arr.shape[0]
    rest = arr.shape[2:]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    tw = power_table(spec, w_int, max(n // 2, 1))
    x = jnp.take(arr, jnp.asarray(_bitrev_perm(log_n)), axis=1)
    r1 = (1,) * len(rest)
    from zkarray.kernels import mont as _km

    rflat = 1
    for d in rest:
        rflat *= int(d)
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        if (
            half % 8 == 0
            and rflat % 128 == 0
            and _km.use_pallas((n, rflat), min_batch=4096)
        ):
            # fused in-place stage kernel: one read + one write of the
            # array instead of slice → mul → add/sub → concatenate
            xr = x.reshape(L, n // m, 2, half, rflat)
            wb = jnp.broadcast_to(
                tw[:, :: n // m, None], (L, half, 128)
            )
            xr = _km.butterfly_dit_inplace(spec, xr, wb, n // m, half, rflat)
            x = xr.reshape((L, n) + rest)
            continue
        xs = x.reshape((L, n // m, m) + rest)
        lo = jax.lax.slice_in_dim(xs, 0, half, axis=2)
        hi = jax.lax.slice_in_dim(xs, half, m, axis=2)
        w_stage = tw[:, :: n // m].reshape((L, 1, half) + r1)
        t = fp.mont_mul(spec, hi, w_stage)
        x = jnp.concatenate([fp.add(spec, lo, t), fp.sub(spec, lo, t)], axis=2)
        x = x.reshape((L, n) + rest)
    if scale_int is not None:
        x = fp.mont_mul(spec, x, fp.const_array(spec, scale_int, r1)[:, None])
    return x


class Radix2Domain:
    """Multiplicative coset offset·<g> of size n = 2^k.

    Reference: Radix2EvaluationDomain (poly/src/domain/radix2/mod.rs:22-164).
    """

    def __init__(self, spec: FieldSpec, size: int, offset_int: int = 1):
        if size < 1 or size & (size - 1):
            raise ValueError("domain size must be a power of two")
        log_n = size.bit_length() - 1
        if log_n > spec.two_adicity:
            raise ValueError(
                f"size 2^{log_n} exceeds 2-adicity {spec.two_adicity} of {spec.name}"
            )
        p = spec.modulus
        self.spec = spec
        self.size = size
        self.log_size = log_n
        self.group_gen_int = spec.root_of_unity(size) if size > 1 else 1
        self.group_gen_inv_int = pow(self.group_gen_int, -1, p)
        self.size_inv_int = pow(size, -1, p)
        self.offset_int = offset_int % p
        self.offset_inv_int = pow(self.offset_int, -1, p)
        self.offset_pow_size_int = pow(self.offset_int, size, p)

    def get_coset(self, offset_int: int) -> "Radix2Domain":
        return Radix2Domain(self.spec, self.size, offset_int)

    # ---- transforms ----

    def fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Coefficients (L, m) m <= n → evaluations (L, n) on the coset.

        Degree-aware: when the (power-of-two-padded) coefficient count m2
        satisfies 4·m2 <= n, evaluation costs O(n·log m2) instead of
        O(n·log n) (reference degree_aware_fft_in_place,
        poly/src/domain/radix2/fft.rs:29-71): the n-point grid splits into
        n/m2 cosets w_n^j·<w_m2>; each coset evaluation is a size-m2 FFT of
        the coeffs twisted by powers of w_n^j — n/m2 batched transforms.
        """
        spec, n = self.spec, self.size
        m = coeffs.shape[1]
        if m > n:
            raise ValueError("too many coefficients for domain")
        m2 = 1 << max(0, (m - 1)).bit_length()
        if 4 * m2 <= n and m2 >= 1:
            return self._degree_aware_fft(coeffs, m2)
        if m < n:
            coeffs = jnp.pad(coeffs, ((0, 0), (0, n - m)))
        if self.offset_int != 1:
            coeffs = distribute_powers(spec, coeffs, self.offset_int)
        if n >= FOURSTEP_BIG:
            n1 = 1 << ((n.bit_length() - 1) // 2)
            return fft_fourstep_big(
                spec, coeffs, n1, n // n1, self.group_gen_int, None
            )
        if n >= FOURSTEP_MIN:
            n1 = 1 << ((n.bit_length() - 1) // 2)
            return fft_fourstep_core(
                spec, coeffs, n1, n // n1, self.group_gen_int, None
            )
        return _fft_core(spec, coeffs, n, self.group_gen_int, None)

    def _degree_aware_fft(self, coeffs: jnp.ndarray, m2: int) -> jnp.ndarray:
        spec, n, p = self.spec, self.size, self.spec.modulus
        m = coeffs.shape[1]
        if m < m2:
            coeffs = jnp.pad(coeffs, ((0, 0), (0, m2 - m)))
        if self.offset_int != 1:
            coeffs = distribute_powers(spec, coeffs, self.offset_int)
        k = n // m2
        # twist table T[j, i] = w_n^{j·i}, j < k, i < m2 — gathered from the
        # full power table (indices j·i < n are all distinct mod n reads)
        full = power_table(spec, self.group_gen_int, n)  # (L, n)
        ji = (
            np.arange(k, dtype=np.int64)[:, None]
            * np.arange(m2, dtype=np.int64)[None, :]
        ) % n
        T = full[:, jnp.asarray(ji.astype(np.int32))]  # (L, k, m2)
        tw = fp.mont_mul(spec, T, coeffs[:, None, :])  # (L, k, m2)
        # batched size-m2 FFTs along axis 1 with rest axis k
        w_m2 = pow(self.group_gen_int, k, p)
        evals = _fft_core(
            spec, jnp.swapaxes(tw, 1, 2), m2, w_m2, None
        )  # (L, m2, k): evals[:, t, j] = f(w^j·w_m2^t) = f(w^{t·k + j})
        return evals.reshape(spec.num_limbs, n)

    def ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        """Evaluations on the coset → coefficients (L, n)."""
        spec, n = self.spec, self.size
        if evals.shape[1] != n:
            raise ValueError("evaluation count must equal domain size")
        if n >= FOURSTEP_BIG:
            n1 = 1 << ((n.bit_length() - 1) // 2)
            out = fft_fourstep_big(
                spec, evals, n1, n // n1, self.group_gen_inv_int,
                self.size_inv_int,
            )
        elif n >= FOURSTEP_MIN:
            n1 = 1 << ((n.bit_length() - 1) // 2)
            out = fft_fourstep_core(
                spec, evals, n1, n // n1, self.group_gen_inv_int,
                self.size_inv_int,
            )
        else:
            out = _fft_core(
                spec, evals, n, self.group_gen_inv_int, self.size_inv_int
            )
        if self.offset_int != 1:
            out = distribute_powers(spec, out, self.offset_inv_int)
        return out

    # ---- domain queries (reference: poly/src/domain/mod.rs) ----

    def elements(self) -> jnp.ndarray:
        """(L, n) table [offset·g^0, ..., offset·g^(n-1)]."""
        t = power_table(self.spec, self.group_gen_int, self.size)
        if self.offset_int != 1:
            t = fp.mont_mul(
                self.spec, t, fp.const_array(self.spec, self.offset_int, (1,))
            )
        return t

    def evaluate_vanishing_polynomial(self, tau: jnp.ndarray) -> jnp.ndarray:
        """Z(tau) = tau^n - offset^n, batched over tau."""
        spec = self.spec
        tn = fp.pow_const(spec, tau, self.size)
        return fp.sub(
            spec, tn, fp.const_array(spec, self.offset_pow_size_int, tau.shape[1:])
        )

    def evaluate_all_lagrange_coefficients(self, tau: jnp.ndarray) -> jnp.ndarray:
        """L_i(tau) for all i — O(n) with batch inversion (reference:
        poly/src/domain/mod.rs:183-260). tau: (L,) single element → (L, n)."""
        spec, n = self.spec, self.size
        tau = tau.reshape(spec.num_limbs, 1)
        elems = self.elements()  # r_i = offset·g^i
        # Z(tau) = tau^n - offset^n ; L_i(tau) = Z(tau) · r_i / (n·offset^n·(tau - r_i))
        z = self.evaluate_vanishing_polynomial(tau)  # (L,1)
        diffs = fp.sub(spec, jnp.broadcast_to(tau, elems.shape), elems)
        inv_diffs = fp.batch_inv(spec, diffs)
        # c = Z(tau) / (n·offset^n) — host constant multiplies
        c_int = pow(
            (self.size * self.offset_pow_size_int) % spec.modulus, -1, spec.modulus
        )
        zc = fp.mont_mul(spec, z, fp.const_array(spec, c_int, (1,)))
        li = fp.mont_mul(spec, fp.mont_mul(spec, zc, elems), inv_diffs)
        # At tau = r_i the formula is 0/0; exact hit → L_i = 1, others 0.
        hit = fp.eq(jnp.broadcast_to(tau, elems.shape), elems)  # (n,)
        any_hit = jnp.any(hit)
        exact = fp.select(hit, fp.one(spec, (n,)), fp.zero(spec, (n,)))
        return fp.select(jnp.broadcast_to(any_hit, (n,)), exact, li)

    def mul_polynomials_in_evaluation_domain(self, a, b):
        return fp.mont_mul(self.spec, a, b)

    # ---- vanishing / filter polynomials (reference mod.rs:213-271) ----

    def vanishing_polynomial(self):
        """Z(X) = X^n − offset^n as sparse (degrees, coeffs)."""
        from zkarray.poly import sparse

        p = self.spec.modulus
        return sparse.uv_from_terms(
            self.spec, [(0, (-self.offset_pow_size_int) % p), (self.size, 1)]
        )

    def filter_polynomial(self, subdomain: "Radix2Domain"):
        """Dense coeffs of the polynomial that is 1 on ``subdomain`` and 0 on
        the rest of this domain (reference filter_polynomial,
        poly/src/domain/mod.rs:238-259). Closed form: both vanishing polys
        are binomials, so the quotient is Σ_i b^{k-1-i}·X^{iM} with
        b = offset_S^M, k = n/M — no long division needed."""
        p = self.spec.modulus
        N, M = self.size, subdomain.size
        if N % M:
            raise ValueError("subdomain size must divide domain size")
        k = N // M
        b = subdomain.offset_pow_size_int
        if pow(b, k, p) != self.offset_pow_size_int:
            raise ValueError("subdomain is not contained in this domain")
        scale = (M * b) % p * pow(N % p, -1, p) % p
        terms = [(i * M, pow(b, k - 1 - i, p) * scale % p) for i in range(k)]
        from zkarray.poly import sparse

        degrees, coeffs = sparse.uv_from_terms(self.spec, terms)
        return sparse.uv_to_dense(self.spec, degrees, coeffs, (k - 1) * M + 1)

    def evaluate_filter_polynomial(self, subdomain: "Radix2Domain", tau):
        """Filter polynomial evaluated at tau (batched), reference
        mod.rs:261-271."""
        spec = self.spec
        v_sub = subdomain.evaluate_vanishing_polynomial(tau)
        v_self = self.evaluate_vanishing_polynomial(tau)
        c_int = (subdomain.size * pow(self.size, -1, spec.modulus)) % spec.modulus
        val = fp.mont_mul(
            spec,
            fp.mont_mul(spec, fp.const_array(spec, c_int, ()), v_self),
            fp.inv(spec, v_sub),
        )
        on_sub = fp.is_zero(spec, v_sub)
        return fp.select(on_sub, fp.one(spec, val.shape[1:]), val)

    def reindex_by_subdomain(self, other: "Radix2Domain", index: int) -> int:
        """Index translation when the first |S| elements are a subdomain's
        (reference mod.rs:288-310)."""
        assert self.size >= other.size
        period = self.size // other.size
        if index < other.size:
            return index * period
        i = index - other.size
        x = period - 1
        return i + (i // x) + 1

    def __repr__(self):
        return f"Radix2Domain({self.spec.name}, 2^{self.log_size}, offset={self.offset_int})"


def GeneralDomain(spec: FieldSpec, min_size: int, offset_int: int = 1):
    """Pick the best domain for >= min_size evaluations: radix-2 when the
    2-adicity allows, otherwise a mixed-radix domain (reference:
    GeneralEvaluationDomain, poly/src/domain/general.rs:49-65)."""
    n = 1 << max(0, (min_size - 1)).bit_length()
    if n.bit_length() - 1 <= spec.two_adicity:
        return Radix2Domain(spec, n, offset_int)
    from zkarray.poly.mixed_radix import MixedRadixDomain, best_mixed_domain_size

    return MixedRadixDomain(spec, best_mixed_domain_size(spec, min_size), offset_int)
