"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Correctness tests run against Python-int oracles on CPU (fast iteration,
deterministic); the multi-chip sharding tests use the 8 virtual devices.
Benchmarks (bench.py) run on real TPU hardware separately.
"""

import os
import sys

# Must be set before jax is imported anywhere. Force CPU even if the shell
# exports JAX_PLATFORMS (e.g. the axon TPU tunnel): the suite is designed for
# the virtual 8-device CPU mesh; ZKARRAY_TEST_PLATFORM overrides explicitly.
os.environ["JAX_PLATFORMS"] = os.environ.get("ZKARRAY_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compilation cache: compile-heavy suites (unrolled limb
# arithmetic) only pay compile cost once across runs. NOTE: jax 0.9 ignores
# the JAX_COMPILATION_CACHE_DIR env var — jax.config.update is required.
import jax  # noqa: E402

# The axon TPU plugin registers itself in every interpreter via
# sitecustomize. When the suite runs on CPU, drop its backend factory:
# initializing it anyway (jax inits all registered plugins) can hang the
# whole suite if the TPU worker/relay is down — measured round 2 after a
# worker crash. Harmless when the factory is absent.
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # sitecustomize imports jax BEFORE conftest runs, with the shell's
    # JAX_PLATFORMS=axon already baked into jax.config — so the env-var
    # assignment above is NOT enough: force the config value too, or the
    # whole "CPU" suite silently targets the axon TPU tunnel (measured
    # round 2: every jit compiled remotely; a TPU-worker crash then hung
    # backend init and with it every test run).
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from zkarray.jaxcache import setup_cache  # noqa: E402

setup_cache(os.environ.get("ZKARRAY_CACHE_DIR", "/tmp/zkarray-xla-cache"))
