import time, jax, jax.numpy as jnp, numpy as np

def sync(v): return np.asarray(v)
def timeit(f, *args, iters=5):
    sync(f(*args).ravel()[:4] if hasattr(f(*args), 'ravel') else f(*args))
    t0 = time.perf_counter()
    for _ in range(iters): out = f(*args)
    sync(out.ravel()[:4])
    return (time.perf_counter() - t0) / iters

W, N, L, half = 20, 1 << 20, 24, 4096
rng = np.random.default_rng(0)
mag = jnp.asarray(rng.integers(0, half+1, size=(W, N), dtype=np.int32))

@jax.jit
def dosort(mag):
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (W, N))
    k, v = jax.lax.sort_key_val(mag, idx, dimension=1)
    return k + v  # force both

t0 = time.perf_counter(); sync(dosort(mag).ravel()[:4]); print(f"sort compile+run: {time.perf_counter()-t0:.2f}s")
t = timeit(dosort, mag)
print(f"sort (W={W}, N=2^20) int32: {t*1e3:.2f} ms")

# gather: points (L, N) by (W, half) indices -> (L, W, half)
px = jnp.asarray(rng.integers(0, 1<<16, size=(L, N), dtype=np.uint32))
idx = jnp.asarray(rng.integers(0, N, size=(W, half), dtype=np.int32))

@jax.jit
def dogather(px, idx):
    return px[:, idx]  # (L, W, half)
t0 = time.perf_counter(); sync(dogather(px, idx).ravel()[:4]); print(f"gather compile: {time.perf_counter()-t0:.2f}s")
t = timeit(dogather, px, idx)
vol = L * W * half * 4
print(f"gather (L,{W},{half}) from (L,2^20): {t*1e3:.3f} ms  ({vol/t/1e9:.1f} GB/s effective)")

# while_loop iteration overhead: trivial body, 300 iters
@jax.jit
def loop(x):
    def body(c):
        i, x = c
        return i+1, x + 1
    return jax.lax.while_loop(lambda c: c[0] < 300, body, (0, x))[1]
x = jnp.zeros((8, 128), jnp.uint32)
t0 = time.perf_counter(); sync(loop(x)); print(f"while compile: {time.perf_counter()-t0:.2f}s")
t = timeit(loop, x)
print(f"while_loop 300 trivial iters: {t*1e3:.3f} ms -> {t/300*1e6:.1f} us/iter")

# take_along_axis (W,N) by (W,half)
sidx = jnp.asarray(rng.integers(0, N, size=(W, N), dtype=np.int32))
@jax.jit
def dotaa(s, i):
    return jnp.take_along_axis(s, i, axis=1)
sync(dotaa(sidx, idx).ravel()[:4])
t = timeit(dotaa, sidx, idx)
print(f"take_along_axis (W,half) from (W,N): {t*1e3:.3f} ms")
