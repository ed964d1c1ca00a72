import os, time
os.environ['JAX_PLATFORMS']='cpu'
os.environ['ZKARRAY_PALLAS_INTERPRET']='1'
import numpy as np
from zkarray.ff import fp
from zkarray.curves import bls12_381
from zkarray import kernels
spec = bls12_381.FQ
R = pow(2, 384, spec.modulus)
rng = np.random.default_rng(0)
n = 1024
xs = [int.from_bytes(rng.bytes(48),'little') % spec.modulus for _ in range(n)]
ys = [int.from_bytes(rng.bytes(48),'little') % spec.modulus for _ in range(n)]
a = fp.from_ints(spec, xs); b = fp.from_ints(spec, ys)
t0=time.time()
r1 = kernels.mont_mul(spec, a, b)
exp = [(x*y*R) % spec.modulus for x,y in zip(xs,ys)]
assert fp.to_ints(spec, r1, mont=False) == exp, 'mul mismatch'
print(f'mul OK {time.time()-t0:.1f}s')
t0=time.time()
r2 = kernels.mont_sqr(spec, a)
exp2 = [(x*x*R) % spec.modulus for x in xs]
assert fp.to_ints(spec, r2, mont=False) == exp2, 'sqr mismatch'
print(f'sqr OK {time.time()-t0:.1f}s')
t0=time.time()
w = fp.from_ints(spec, ys)
aa, bb = kernels.butterfly_stage(spec, a, b, w)
expa = [(x+y) % spec.modulus for x,y in zip(xs,ys)]
expb = [((x-y)*y) % spec.modulus for x,y in zip(xs,ys)]
assert fp.to_ints(spec, aa) == expa, 'bfly add mismatch'
assert fp.to_ints(spec, bb) == expb, 'bfly mul mismatch'
print(f'butterfly OK {time.time()-t0:.1f}s')
