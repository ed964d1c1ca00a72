"""Array-sliced mont_mul prototype vs round-1 SSA-list version: compile + run + correctness."""
import time, functools
import jax, jax.numpy as jnp, numpy as np
import sys; sys.path.insert(0, '/root/repo')
from zkarray.ff import fp
from zkarray.curves import bls12_381
from zkarray.core.fieldspec import LIMB_BITS, LIMB_MASK

spec = bls12_381.FQ   # 381-bit, L=24
L = spec.num_limbs
print("L =", L)

pnp = fp._np_const(spec, "p")

def pad_rows(row, lead, total):
    # row: (R, batch) -> (total, batch) with `lead` zero rows before
    R = row.shape[0]
    cfg = [(lead, total - lead - R)] + [(0, 0)] * (row.ndim - 1)
    return jnp.pad(row, cfg)

def mont_mul_v2(spec, a, b):
    L = spec.num_limbs
    batch = a.shape[1:]
    K = 2 * L + 1
    p_c = jnp.asarray(fp._np_const(spec, "p"))[(...,) + (None,) * len(batch)]
    inv16 = np.uint32(spec.inv16)
    cols = jnp.zeros((K,) + batch, dtype=jnp.uint32)
    for i in range(L):
        prod = a[i][None] * b          # (L, batch)
        cols = cols + pad_rows(prod & LIMB_MASK, i, K) + pad_rows(prod >> LIMB_BITS, i + 1, K)
    # CIOS reduction, serial over i, carry tracked separately
    carry = jnp.zeros(batch, dtype=jnp.uint32)
    for i in range(L):
        ci = cols[i] + carry
        m = (ci * inv16) & LIMB_MASK
        prod = m[None] * p_c           # (L, batch)
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        cols = cols + pad_rows(lo[1:], i + 1, K) + pad_rows(hi, i + 1, K)
        carry = (ci + lo[0]) >> LIMB_BITS
    # result = cols[L:] + carry at position L
    r = cols[L:]
    r = r.at[0].add(carry)
    r = fp.lb.normalize(r, L + 1)
    return fp._cond_sub_p(spec, r)

mont_mul_v2_j = jax.jit(mont_mul_v2, static_argnums=0)

rng = np.random.default_rng(0)
xs = [int(rng.integers(0, 1<<62)) * int(rng.integers(0, 1<<62)) % spec.modulus for _ in range(64)]
ys = [int(rng.integers(0, 1<<62)) ** 6 % spec.modulus for _ in range(64)]
a_small = fp.from_ints(spec, xs); b_small = fp.from_ints(spec, ys)

# correctness vs old
t0=time.perf_counter()
r_old = fp.mont_mul(spec, a_small, b_small)
print(f"old compile+run small: {time.perf_counter()-t0:.2f}s")
t0=time.perf_counter()
r_new = mont_mul_v2_j(spec, a_small, b_small)
print(f"new compile+run small: {time.perf_counter()-t0:.2f}s")
assert np.array_equal(np.asarray(r_old), np.asarray(r_new)), "MISMATCH"
print("correctness: OK")

def sync(v): return np.asarray(v)

for name, f in [("new", mont_mul_v2_j), ("old", fp.mont_mul)]:
    for logn in (20,):
        N = 1 << logn
        A = jnp.asarray(rng.integers(0, 1<<16, size=(L, N), dtype=np.uint32))
        B = jnp.asarray(rng.integers(0, 1<<16, size=(L, N), dtype=np.uint32))
        t0 = time.perf_counter()
        out = f(spec, A, B); sync(out[0, :8])
        tc = time.perf_counter() - t0
        # chained timing (5 muls per call to dwarf sync overhead)
        @jax.jit
        def chain(A, B):
            x = A
            for _ in range(8):
                x = f(spec, x, B)
            return x
        sync(chain(A, B)[0, :8])
        t0 = time.perf_counter()
        sync(chain(A, B)[0, :8])
        t = (time.perf_counter() - t0) / 8
        print(f"{name} L={L} N=2^{logn}: compile+first {tc:6.2f}s   per-mul {t*1e3:7.3f} ms  -> {N/t/1e6:7.1f} Mmul/s")
