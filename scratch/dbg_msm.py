import os, time, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/zkarray-xla-cache")
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import random
import numpy as np
from ec_oracle import ec_add, ec_mul
from zkarray.curves import bn254
from zkarray.ec import msm, sw
from zkarray.ff import fp

curve = bn254.G1
a, mod = curve.a_int, curve.base.modulus
r = curve.scalar.modulus
rng = random.Random(13 * 31 + 4)
gen = (curve.gen_x, curve.gen_y)
n, c = 13, 4
pts = [ec_mul(gen, rng.randrange(1, 1 << 40), a, mod) for _ in range(n)]
ks = [0, 1, r - 1, 2, 3] + [rng.randrange(r) for _ in range(n - 5)]
A = curve.affine_from_ints(pts)
s = fp.from_ints(curve.scalar, ks, mont=False)

t0 = time.time()
W = curve.scalar.bits // c + 1 + (1 if curve.scalar.bits % c else 0)
d = msm.signed_digits(curve.scalar, s, c, W)
print(f"digits {time.time()-t0:.1f}s", np.asarray(d).shape)

t0 = time.time()
res = msm.msm(curve, A, s, c)
val = np.asarray(res.zz)
print(f"msm compile+run {time.time()-t0:.1f}s")

t0 = time.time()
aff = sw.xyzz_to_affine(curve, type(res)(*(v.reshape(v.shape + (1,)) for v in res)))
got = curve.affine_to_ints(aff)[0]
print(f"to_affine {time.time()-t0:.1f}s")

def oracle_msm(pts, ks):
    acc = None
    for p, k in zip(pts, ks):
        acc = ec_add(acc, ec_mul(p, k, a, mod), a, mod)
    return acc
exp = oracle_msm(pts, ks)
print("MATCH" if got == exp else f"MISMATCH {got} vs {exp}")
