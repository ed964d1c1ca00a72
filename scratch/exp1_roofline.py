"""Measure raw int32 mul/add throughput + current mont_mul cost on the TPU."""
import time, jax, jax.numpy as jnp, numpy as np

dev = jax.devices()[0]
print("device:", dev)

def timeit(f, *args, iters=20, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

# 1) raw elementwise int32 multiply chain (VPU roofline probe)
N = 1 << 22
K = 64  # chained ops to stay compute-bound
a = jnp.arange(N, dtype=jnp.uint32)
b = a + 1

@jax.jit
def chain_mul(a, b):
    x = a
    for _ in range(K):
        x = x * b + a
    return x

t = timeit(chain_mul, a, b)
ops = N * K * 2  # mul+add
print(f"int32 mul+add chain: {t*1e3:.3f} ms -> {ops/t/1e12:.3f} Tops/s (counting mul+add as 2)")

@jax.jit
def chain_add(a, b):
    x = a
    for _ in range(K):
        x = (x + b) ^ a
    return x
t = timeit(chain_add, a, b)
print(f"int32 add+xor chain: {t*1e3:.3f} ms -> {ops/t/1e12:.3f} Tops/s")

# 16-bit masked mul pattern as in mont_mul
@jax.jit
def chain_mul16(a, b):
    x = a & 0xFFFF
    y = b & 0xFFFF
    for _ in range(K):
        p = x * y
        x = (p & 0xFFFF) + (p >> 16)
    return x
t = timeit(chain_mul16, a, b)
print(f"16x16 mul+split chain: {t*1e3:.3f} ms -> {N*K*4/t/1e12:.3f} Tops/s (4 ops/iter)")
