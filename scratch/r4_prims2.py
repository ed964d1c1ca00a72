"""Round-4 follow-up: slice-gather (T consecutive rows per index) rate,
large-index-count gather scaling, sort scaling."""
import sys, time

sys.path.insert(0, "/root/repo")
from zkarray.jaxcache import setup_cache

jax = setup_cache()
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)


def sync(x):
    return np.asarray(x)


def timeit(f, *args, iters=3):
    out = f(*args)
    sync(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    sync(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    return (time.perf_counter() - t0) / iters


rng = np.random.default_rng(0)
N = 1 << 20
C = 24  # packed coord words per point

rows = jnp.asarray(rng.integers(0, 1 << 32, size=(N, C), dtype=np.uint32))

# 1. slice-gather: M starting indices, each pulls T consecutive rows
for M, T in ((86016, 16), (86016, 32), (86016, 64), (344064, 32)):
    starts = jnp.asarray(rng.integers(0, N - T, size=(M,), dtype=np.int32))

    def slg(rows, starts, T=T, M=M):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,),
        )
        return jax.lax.gather(
            rows, starts[:, None], dn, slice_sizes=(T, C),
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    f = jax.jit(slg)
    t = timeit(f, rows, starts)
    vol = M * T * C * 4
    print(f"slice-gather M={M} T={T}: {t*1e3:8.2f} ms  {vol/t/1e9:7.2f} GB/s  ({t/M*1e9:5.1f} ns/idx)", flush=True)

# 2. big flat gather scaling: 8M and 21M indices
for M in (1 << 23, 21 * (1 << 20)):
    idx = jnp.asarray(rng.integers(0, N, size=(M,), dtype=np.int32))

    @jax.jit
    def g(rows, idx):
        return jnp.take(rows, idx, axis=0)

    t = timeit(g, rows, idx)
    print(f"row gather x {M} idx: {t*1e3:8.2f} ms  {M*C*4/t/1e9:7.2f} GB/s  ({t/M*1e9:5.1f} ns/idx)", flush=True)

# 3. batched per-window gather: (W, N) idx from (N, C) operand, W=6 group
W = 6
idxw = jnp.asarray(rng.integers(0, N, size=(W, N), dtype=np.int32))

@jax.jit
def gw(rows, idxw):
    return jnp.take(rows, idxw.reshape(-1), axis=0).reshape(W, N, C)

t = timeit(gw, rows, idxw)
print(f"window-group gather {W}x2^20 idx: {t*1e3:8.2f} ms  ({t/(W*N)*1e9:5.1f} ns/idx)", flush=True)

# 4. sort cost vs operand width W
for W2 in (17, 21):
    mag = jnp.asarray(rng.integers(0, 8192, size=(W2, N), dtype=np.int32))

    @jax.jit
    def dosort(m):
        i = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], m.shape)
        k, v = jax.lax.sort_key_val(m, i, dimension=1)
        return v

    t = timeit(dosort, mag)
    print(f"sort ({W2}, 2^20): {t*1e3:8.2f} ms", flush=True)

# 5. chained contiguous bandwidth (amortize dispatch)
big = jnp.asarray(rng.integers(0, 1 << 32, size=(64 << 20,), dtype=np.uint32))

@jax.jit
def cpy8(x):
    for _ in range(8):
        x = x + np.uint32(1)
    return x

t = timeit(cpy8, big)
print(f"chained contig 8x256MB: {t*1e3:8.2f} ms  {8*2*big.size*4/t/1e9:7.2f} GB/s", flush=True)
print("done", flush=True)
