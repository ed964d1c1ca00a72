"""Pallas CIOS mont_mul kernel prototype: correctness vs fp.mont_mul + throughput."""
import time, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import sys; sys.path.insert(0, '/root/repo')
from zkarray.ff import fp
from zkarray.curves import bls12_381

spec = bls12_381.FQ
L = spec.num_limbs
MASK = np.uint32(0xFFFF)
PC = [int(x) for x in fp._np_const(spec, "p")]   # python-int limb constants
INV16 = np.uint32(spec.inv16)

def kernel(a_ref, b_ref, o_ref):
    a = a_ref[:]   # (L, SB, 128)
    b = b_ref[:]
    shp = a.shape[1:]
    zero = jnp.zeros(shp, jnp.uint32)
    cols = [zero] * (2 * L + 1)
    for i in range(L):
        p = a[i][None] * b            # (L, SB, 128)
        lo = p & MASK
        hi = p >> 16
        for j in range(L):
            cols[i + j] = cols[i + j] + lo[j]
            cols[i + j + 1] = cols[i + j + 1] + hi[j]
    carry = zero
    for i in range(L):
        ci = cols[i] + carry
        m = (ci * INV16) & MASK
        for j in range(L):
            pr = m * np.uint32(PC[j])
            if PC[j]:
                cols[i + j] = cols[i + j] + (pr & MASK)
                cols[i + j + 1] = cols[i + j + 1] + (pr >> 16)
        carry = (cols[i] + carry + ((m * np.uint32(PC[0])) & MASK)) >> 16 if False else (ci + ((m * np.uint32(PC[0])) & MASK)) >> 16
    # normalize high half: cols[L..2L] + carry
    outs = []
    c = carry
    for k in range(L + 1):
        t = cols[L + k] + c
        outs.append(t & MASK)
        c = t >> 16
    # conditional subtract p (r < 2p guaranteed)
    borrow = jnp.zeros(shp, jnp.uint32)
    diffs = []
    for k in range(L + 1):
        pk = np.uint32(PC[k]) if k < L else np.uint32(0)
        t = outs[k] - pk - borrow
        diffs.append(t & MASK)
        borrow = t >> 31
    use_diff = borrow == 0
    for k in range(L):
        o_ref[k] = jnp.where(use_diff, diffs[k], outs[k])

SB = 8
def mont_mul_pallas(a, b):
    # a, b: (L, N) -> reshape (L, N/128/SB blocks)
    N = a.shape[1]
    a3 = a.reshape(L, N // 128, 128)
    b3 = b.reshape(L, N // 128, 128)
    grid = (N // 128 // SB,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, N // 128, 128), jnp.uint32),
        grid=grid,
        in_specs=[pl.BlockSpec((L, SB, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((L, SB, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    )(a3, b3)
    return out.reshape(L, N)

mont_mul_pallas = jax.jit(mont_mul_pallas)

rng = np.random.default_rng(0)
xs = [int.from_bytes(rng.bytes(48), 'little') % spec.modulus for _ in range(1024)]
ys = [int.from_bytes(rng.bytes(48), 'little') % spec.modulus for _ in range(1024)]
a = fp.from_ints(spec, xs); b = fp.from_ints(spec, ys)
t0 = time.perf_counter()
r_pal = mont_mul_pallas(a, b)
print(f"pallas compile+run: {time.perf_counter()-t0:.2f}s")
r_ref = fp.mont_mul(spec, a, b)
ok = np.array_equal(np.asarray(r_pal), np.asarray(r_ref))
print("correctness:", "OK" if ok else "MISMATCH")
assert ok

def sync(v): return np.asarray(v)
N = 1 << 20
A = jnp.asarray(rng.integers(0, 1<<16, size=(L, N), dtype=np.uint32))
B = jnp.asarray(rng.integers(0, 1<<16, size=(L, N), dtype=np.uint32))
@jax.jit
def chain(A, B):
    x = A
    for _ in range(8):
        x = mont_mul_pallas(x, B)
    return x
sync(chain(A, B)[0, :4])
t0 = time.perf_counter()
sync(chain(A, B)[0, :4])
t = (time.perf_counter() - t0) / 8
print(f"pallas mont_mul L={L} N=2^20: {t*1e3:.3f} ms -> {N/t/1e6:.1f} Mmul/s")
