import time, jax, jax.numpy as jnp, numpy as np
def sync(v): return np.asarray(v)

rng = np.random.default_rng(0)
N = 1 << 20
M = 20 * 4096
K = 32  # chain length

arr = jnp.asarray(rng.integers(0, 1<<16, size=(N, 64), dtype=np.uint32))
idx = jnp.asarray(rng.integers(0, N, size=(K, M), dtype=np.int32))

@jax.jit
def g(arr, idx):
    acc = jnp.zeros((M, 64), jnp.uint32)
    for k in range(K):
        acc = acc + jnp.take(arr, idx[k], axis=0)
    return acc
t0=time.perf_counter(); sync(g(arr, idx)[:2,:2]); print(f"compile {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
for _ in range(3): out = g(arr, idx)
sync(out[:2,:2])
t = (time.perf_counter() - t0) / 3 / K
print(f"row gather (N,64) by {M} idx, chained: {t*1e3:.3f} ms/gather ({M*64*4/t/1e9:.1f} GB/s)")

# same for (L, N) axis-1 gather (current layout)
L = 24
arr2 = jnp.asarray(rng.integers(0, 1<<16, size=(L, N), dtype=np.uint32))
@jax.jit
def g2(arr2, idx):
    acc = jnp.zeros((L, M), jnp.uint32)
    for k in range(K):
        acc = acc + arr2[:, idx[k]]
    return acc
sync(g2(arr2, idx)[:2,:2])
t0 = time.perf_counter()
for _ in range(3): out = g2(arr2, idx)
sync(out[:2,:2])
t = (time.perf_counter() - t0) / 3 / K
print(f"axis1 gather (L={L},N) by {M} idx, chained: {t*1e3:.3f} ms/gather ({M*L*4/t/1e9:.1f} GB/s)")

# contiguous baseline chained
@jax.jit
def g3(arr):
    acc = jnp.zeros((M, 64), jnp.uint32)
    for k in range(K):
        acc = acc + arr[k*1000:(k*1000)+M] * np.uint32(k+1)
    return acc
sync(g3(arr)[:2,:2])
t0 = time.perf_counter()
for _ in range(3): out = g3(arr)
sync(out[:2,:2])
t = (time.perf_counter() - t0) / 3 / K
print(f"contiguous {M}x64 read, chained: {t*1e3:.3f} ms ({M*64*4/t/1e9:.1f} GB/s)")
