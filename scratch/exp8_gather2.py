import time, jax, jax.numpy as jnp, numpy as np
def sync(v): return np.asarray(v)
def timeit(f, *args, iters=5):
    out = f(*args); sync(out.ravel()[:4])
    t0 = time.perf_counter()
    for _ in range(iters): out = f(*args)
    sync(out.ravel()[:4])
    return (time.perf_counter() - t0) / iters

rng = np.random.default_rng(0)
N = 1 << 20
M = 20 * 4096  # indices per round (W*half)

for R in (32, 64, 128):
    arr = jnp.asarray(rng.integers(0, 1<<16, size=(N, R), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, N, size=(M,), dtype=np.int32))
    @jax.jit
    def g(arr, idx):
        return jnp.take(arr, idx, axis=0)
    t0=time.perf_counter(); sync(g(arr, idx).ravel()[:4]); tc=time.perf_counter()-t0
    t = timeit(g, arr, idx)
    vol = M * R * 4
    print(f"row gather (N,{R}) rows by {M} idx: compile {tc:5.1f}s  run {t*1e3:7.2f} ms  ({vol/t/1e9:6.1f} GB/s)")

# sorted/monotone indices (the real access pattern)
arr = jnp.asarray(rng.integers(0, 1<<16, size=(N, 64), dtype=np.uint32))
idx_sorted = jnp.sort(jnp.asarray(rng.integers(0, N, size=(M,), dtype=np.int32)))
@jax.jit
def g2(arr, idx): return jnp.take(arr, idx, axis=0)
sync(g2(arr, idx_sorted).ravel()[:4])
t = timeit(g2, arr, idx_sorted)
print(f"row gather (N,64) MONOTONE idx: {t*1e3:7.2f} ms  ({M*64*4/t/1e9:6.1f} GB/s)")

# dynamic_slice contiguous read baseline
@jax.jit
def g3(arr):
    return arr[:M] * 2
sync(g3(arr).ravel()[:4])
t = timeit(g3, arr)
print(f"contiguous read+write {M}x64: {t*1e3:7.2f} ms ({2*M*64*4/t/1e9:6.1f} GB/s)")
