import time, jax, jax.numpy as jnp, numpy as np

def mk(K):
    @jax.jit
    def chain(x, b):
        for i in range(K):
            x = x * b + (x >> 7)
        return jnp.sum(x)   # scalar output: forces full reduce, cheap transfer
    return chain

def sync(v):
    return np.asarray(v)   # device->host copy = real barrier

for N_log, K in [(22, 64), (22, 256), (24, 64), (24, 256), (24, 1024)]:
    N = 1 << N_log
    x = jnp.arange(N, dtype=jnp.uint32); b = x + 1
    f = mk(K)
    sync(f(x, b))  # warm
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        s = f(x, b)
    sync(s)
    t = (time.perf_counter() - t0) / iters
    ops = N * K * 3
    print(f"N=2^{N_log} K={K}: {t*1e3:8.3f} ms  {ops/t/1e12:7.3f} Tops/s")
