import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/zk-test-cache2")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
@jax.jit
def f(x):
    for _ in range(200):
        x = x * 2 + 1
    return x
t0=time.time(); f(jnp.ones((1000,))).block_until_ready(); print(f"first f: {time.time()-t0:.2f}s")
@jax.jit
def g(x):
    for _ in range(201):
        x = x * 3 + 2
    return x
t0=time.time(); g(jnp.ones((1000,))).block_until_ready(); print(f"first g: {time.time()-t0:.2f}s")
t0=time.time(); g(jnp.ones((1001,))).block_until_ready(); print(f"g new shape: {time.time()-t0:.2f}s")
import subprocess
print("cache entries:", len(os.listdir("/tmp/zk-test-cache2")) if os.path.isdir("/tmp/zk-test-cache2") else "NO DIR")
