import time, jax, jax.numpy as jnp

def mk(K):
    @jax.jit
    def chain(x, b):
        for i in range(K):
            x = x * b + (x >> 7)
        return x
    return chain

for N_log, K in [(20, 64), (22, 64), (22, 256), (24, 64), (24, 256)]:
    N = 1 << N_log
    x = jnp.arange(N, dtype=jnp.uint32); b = x + 1
    f = mk(K)
    x = f(x, b); jax.block_until_ready(x)  # warm
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x, b)     # dependent chain across calls — cannot cache
    jax.block_until_ready(x)
    t = (time.perf_counter() - t0) / iters
    ops = N * K * 3
    print(f"N=2^{N_log} K={K}: {t*1e3:8.3f} ms  {ops/t/1e12:7.3f} Tops/s")
