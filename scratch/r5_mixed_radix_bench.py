"""Round-5: one measured mixed-radix NTT number on the real TPU — the
reference's mixed-radix showcase is MNT6-753 (poly/benches/fft.rs:13-20,
sizes 2^4..2^17). MNT6-753 Fr has 2-adicity 15 with a 5^2 small subgroup,
so best_mixed_domain_size picks 2^a·5^b sizes.

Run: python scratch/r5_mixed_radix_bench.py [target_log2]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from zkarray.jaxcache import setup_cache

setup_cache()

import jax.numpy as jnp
import numpy as np

from zkarray.curves import mnt6_753
from zkarray.poly.mixed_radix import MixedRadixDomain, best_mixed_domain_size


def main():
    target = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 16)
    spec = mnt6_753.FR
    n = best_mixed_domain_size(spec, target)
    dom = MixedRadixDomain(spec, n)
    print(f"mnt6_753.Fr mixed-radix domain size {n} (target {target})")
    rng = np.random.default_rng(2)
    a = rng.integers(0, 1 << 16, size=(spec.num_limbs, n), dtype=np.uint32)
    a[-1] = 0  # p has 753 bits = 47·16+1: zero the top limb keeps a < p
    a = jnp.asarray(a)
    t0 = time.perf_counter()
    out = dom.fft(a)
    np.asarray(out[0, :2])
    print(f"compile+first: {time.perf_counter()-t0:.1f}s")
    back = dom.ifft(out)
    ok = bool(np.array_equal(np.asarray(back), np.asarray(a)))
    print(f"roundtrip verified={ok}")
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        out = dom.fft(a)
    np.asarray(out[0, :2])
    dt = (time.perf_counter() - t0) / iters
    print(f"mixed-radix fft n={n}: {dt*1e3:.1f} ms -> {n/dt/1e6:.2f} M elems/s")


if __name__ == "__main__":
    main()
