import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/zk-test-cache"
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
import jax, jax.numpy as jnp
@jax.jit
def f(x):
    for _ in range(200):
        x = x * 2 + 1
    return x
t0=time.time(); f(jnp.ones((1000,))).block_until_ready(); print(f"{time.time()-t0:.2f}s")
print("cache entries:", len(os.listdir("/tmp/zk-test-cache")) if os.path.isdir("/tmp/zk-test-cache") else "NO DIR")
