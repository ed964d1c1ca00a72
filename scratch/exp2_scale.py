import time, jax, jax.numpy as jnp
def timeit(f, *args, iters=10, warmup=2):
    for _ in range(warmup): jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters): out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

for N_log, K in [(22, 64), (22, 256), (24, 64), (24, 256), (24, 1024)]:
    N = 1 << N_log
    a = jnp.arange(N, dtype=jnp.uint32); b = a + 1
    def mk(K):
        @jax.jit
        def chain(a, b):
            x = a
            for i in range(K):
                x = x * b + (x >> 7)   # dependent chain, not CSE-able
            return x
        return chain
    f = mk(K)
    t = timeit(f, a, b)
    ops = N * K * 3
    print(f"N=2^{N_log} K={K}: {t*1e3:8.3f} ms  {ops/t/1e12:7.3f} Tops/s")
