"""Pallas kernel parity tests (interpreter mode on CPU).

The kernels share their arithmetic body with the XLA path, so parity with
fp.* plus a Python-int oracle check is the whole contract."""

import numpy as np
import pytest

from zkarray.core.fieldspec import FieldSpec
from zkarray.curves import bls12_381, bn254
from zkarray.ff import fp
from zkarray.kernels import butterfly_stage, mont_mul, mont_sqr

# Interpreter-mode kernel runs execute/compile the body eagerly on CPU;
# cost grows superlinearly in limb count (L=24 takes ~10 min on the 2-CPU
# box vs ~6 s at L=16). The body is L-generic, so the default suite covers
# it at L=16 (bls12-381 Fr + bn254 Fq); the L=24 instantiation runs in the
# slow tier and, compiled, in the TPU-gated test below.
SPECS = [bls12_381.G1.scalar, bn254.G1.base]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_pallas_mont_mul_matches_oracle(spec):
    rng = np.random.default_rng(7)
    n = 700  # not a BLOCK multiple: exercises padding
    xs = [int.from_bytes(rng.bytes(48), "little") % spec.modulus for _ in range(n)]
    ys = [int.from_bytes(rng.bytes(48), "little") % spec.modulus for _ in range(n)]
    a = fp.from_ints(spec, xs)
    b = fp.from_ints(spec, ys)
    got = fp.to_ints(spec, mont_mul(spec, a, b))
    want = [(x * y) % spec.modulus for x, y in zip(xs, ys)]
    assert got == want
    # parity with the XLA path
    assert got == fp.to_ints(spec, fp.mont_mul(spec, a, b))


def test_pallas_mont_sqr_matches_oracle():
    spec = bls12_381.G1.scalar
    rng = np.random.default_rng(8)
    xs = [int.from_bytes(rng.bytes(32), "little") % spec.modulus for _ in range(513)]
    a = fp.from_ints(spec, xs)
    got = fp.to_ints(spec, mont_sqr(spec, a))
    assert got == [(x * x) % spec.modulus for x in xs]


def test_pallas_butterfly_matches_fp():
    spec = bls12_381.G1.scalar
    rng = np.random.default_rng(9)
    n = 300
    los = [int.from_bytes(rng.bytes(32), "little") % spec.modulus for _ in range(n)]
    his = [int.from_bytes(rng.bytes(32), "little") % spec.modulus for _ in range(n)]
    ws = [int.from_bytes(rng.bytes(32), "little") % spec.modulus for _ in range(n)]
    lo = fp.from_ints(spec, los)
    hi = fp.from_ints(spec, his)
    w = fp.from_ints(spec, ws)
    a, b = butterfly_stage(spec, lo, hi, w)
    p = spec.modulus
    # DIF/OI butterfly contract: (lo, hi, w) -> (lo + hi, (lo - hi)·w)
    # (reference butterfly_fn_io, poly/src/domain/radix2/fft.rs:190-198)
    want_a = [(l + h) % p for l, h in zip(los, his)]
    want_b = [((l - h) * t) % p for l, h, t in zip(los, his, ws)]
    assert fp.to_ints(spec, a) == want_a
    assert fp.to_ints(spec, b) == want_b


@pytest.mark.slow
@pytest.mark.skipif(
    not __import__("os").environ.get("ZKARRAY_RUN_SLOW"),
    reason="interpreter-mode run of the ~60k-op fused kernel takes minutes "
    "on CPU (every op dispatches eagerly); set ZKARRAY_RUN_SLOW=1. The "
    "compiled kernel is parity-tested on real TPU by "
    "test_pallas_xyzz_add_affine_compiled_tpu.",
)
def test_pallas_xyzz_add_affine_matches_xla_and_oracle(monkeypatch):
    """Fused XYZZ mixed-add kernel (kernels/sw.py) vs the XLA path and the
    Python-int oracle, covering every edge class the kernel selects on:
    generic add, doubling (P == A), cancellation (P == -A), P at infinity,
    A at infinity, and both at infinity."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from ec_oracle import ec_add, ec_mul

    from zkarray.ec import sw
    from zkarray.kernels import sw as ksw

    curve = bls12_381.G1
    mod = curve.base.modulus
    gen = (curve.gen_x, curve.gen_y)
    rng = np.random.default_rng(11)

    n = 64
    p_ints, a_ints = [], []
    for i in range(n):
        k1 = int(rng.integers(1, 1 << 20))
        k2 = int(rng.integers(1, 1 << 20))
        cls = i % 6
        P = ec_mul(gen, k1, curve.a_int, mod)
        if cls == 0:
            A = ec_mul(gen, k2, curve.a_int, mod)      # generic
        elif cls == 1:
            A = P                                       # doubling
        elif cls == 2:
            A = (P[0], (-P[1]) % mod)                   # cancellation
        elif cls == 3:
            P, A = None, ec_mul(gen, k2, curve.a_int, mod)  # P at inf
        elif cls == 4:
            A = None                                    # A at inf
        else:
            P, A = None, None
        p_ints.append(P)
        a_ints.append(A)

    Pa = curve.affine_from_ints(p_ints)
    Pz = sw.xyzz_from_affine(curve, Pa)
    Aa = curve.affine_from_ints(a_ints)

    got_kernel = ksw.xyzz_add_affine(curve, Pz, Aa)  # interpreter on CPU
    got_xla = sw.xyzz_add_affine(curve, Pz, Aa)      # small batch: XLA path

    for v_k, v_x in zip(got_kernel, got_xla):
        assert np.array_equal(np.asarray(v_k), np.asarray(v_x))

    got_pts = curve.affine_to_ints(sw.xyzz_to_affine(curve, got_kernel))
    want = [ec_add(P, A, curve.a_int, mod) for P, A in zip(p_ints, a_ints)]
    assert got_pts == want



@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu",
    reason="compiled-kernel parity needs a real TPU (the CPU backend only "
    "supports pallas interpret mode, covered by the slow-marked test above)",
)
def test_pallas_xyzz_add_affine_compiled_tpu():
    """Compiled-on-TPU smoke+parity for the fused XYZZ kernel at the
    (L, 8, 128) block size, same edge-class coverage."""
    test_pallas_xyzz_add_affine_matches_xla_and_oracle(None)


def _accum_tiles_case():
    """Shared driver: tile-accumulation kernel vs T sequential XLA mixed
    adds on bn254 (L=16 keeps interpreter cost tolerable). Covers the
    presorted-feed contract (signs pre-applied to y, validity mask) and
    generic adds across 2 rounds."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from ec_oracle import ec_mul

    import jax.numpy as jnp
    from zkarray.ec import msm as msm_mod, sw
    from zkarray.ec.sw import AffinePoints
    from zkarray.kernels import sw as ksw

    curve = bn254.G1
    L = curve.base.num_limbs
    mod = curve.base.modulus
    gen = (curve.gen_x, curve.gen_y)
    rng = np.random.default_rng(21)
    nb, T = 1, 2
    n_slots = nb * 1024

    state0 = sw.xyzz_zero(curve, (n_slots,))
    rounds_pts = []
    rounds_pk = []
    for r in range(T):
        pts = [
            ec_mul(gen, int(k), curve.a_int, mod)
            for k in rng.integers(1, 1 << 16, size=n_slots)
        ]
        A = curve.affine_from_ints(pts)
        sign = rng.integers(0, 2, size=n_slots).astype(bool)
        skip = rng.integers(0, 4, size=n_slots) == 0
        rounds_pts.append((A, sign, skip))
        # vword contract: bit0 = valid, bit1 = negate-y
        rounds_pk.append(
            (~skip).astype(np.int32) | (sign.astype(np.int32) << 1)
        )

    # XLA reference: apply the two rounds with sw.xyzz_add_affine
    want = state0
    for A, sign, skip in rounds_pts:
        y = fp.select(jnp.asarray(sign), fp.neg(curve.base, A.y), A.y)
        want = sw.xyzz_add_affine(
            curve, want, AffinePoints(A.x, y, jnp.asarray(skip))
        )

    # kernel: pack streams
    def pack_pairs(a):
        return a[0::2] | (a[1::2] << 16)

    st_p = (
        jnp.concatenate([pack_pairs(v) for v in state0], axis=0)
        .reshape(2 * L, nb, 8, 128)
        .transpose(1, 0, 2, 3)
    )
    cds = []
    for A, _, _ in rounds_pts:
        xy = jnp.concatenate([A.x, A.y], axis=0)
        cds.append(pack_pairs(xy))  # (L, n_slots)
    coords = (
        jnp.stack(cds, axis=1)  # (L, T, n_slots)
        .reshape(L, T, nb, 8, 128)
        .transpose(2, 1, 0, 3, 4)
        .reshape(nb, T * L, 8, 128)
    )
    valid = (
        jnp.asarray(np.stack(rounds_pk))  # (T, n_slots)
        .reshape(T, nb, 8, 128)
        .transpose(1, 0, 2, 3)
    )
    got_p = ksw.xyzz_accum_tiles(curve, st_p, coords, valid, T)
    rows = got_p.transpose(1, 0, 2, 3).reshape(2 * L, n_slots)
    Lp = L // 2

    def unpack(w):
        return jnp.stack([w & 0xFFFF, w >> 16], axis=1).reshape(
            (2 * Lp,) + w.shape[1:]
        )

    got = sw.XYZZPoints(*(unpack(rows[i * Lp : (i + 1) * Lp]) for i in range(4)))
    for v_k, v_x in zip(got, want):
        assert np.array_equal(np.asarray(v_k), np.asarray(v_x))


@pytest.mark.slow
@pytest.mark.skipif(
    not __import__("os").environ.get("ZKARRAY_RUN_SLOW"),
    reason="interpreter-mode tile-accumulation kernel takes minutes on CPU; "
    "set ZKARRAY_RUN_SLOW=1. Compiled parity runs on TPU via "
    "test_accum_tiles_compiled_tpu; end-to-end MSM correctness on TPU is "
    "checked by bench.py's known-answer gate on every run.",
)
def test_accum_tiles_matches_xla():
    _accum_tiles_case()


@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu",
    reason="compiled tile-accumulation parity needs a real TPU",
)
def test_accum_tiles_compiled_tpu():
    _accum_tiles_case()


def test_butterfly_dit_inplace_matches_xla():
    """Fused in-place DIT stage kernel vs the composed fp ops (interpreter
    mode; bls12-381 Fr keeps L=16)."""
    import jax.numpy as jnp
    from zkarray.kernels import mont as km

    spec = bls12_381.G1.scalar
    L = spec.num_limbs
    rng = np.random.default_rng(11)
    C, H, R = 2, 8, 128
    n = C * 2 * H * R

    xs = [int.from_bytes(rng.bytes(32), "little") % spec.modulus for _ in range(n)]
    ws = [int.from_bytes(rng.bytes(32), "little") % spec.modulus for _ in range(H)]
    x = fp.from_ints(spec, xs).reshape(L, C, 2, H, R)
    w = fp.from_ints(spec, ws)  # (L, H)
    wb = jnp.broadcast_to(w[:, :, None], (L, H, 128))

    got = km.butterfly_dit_inplace(spec, x, wb, C, H, R)

    lo, hi = x[:, :, 0], x[:, :, 1]
    t = fp.mont_mul(spec, hi, w[:, None, :, None])
    want_lo = fp.add(spec, lo, t)
    want_hi = fp.sub(spec, lo, t)
    assert np.array_equal(np.asarray(got[:, :, 0]), np.asarray(want_lo))
    assert np.array_equal(np.asarray(got[:, :, 1]), np.asarray(want_hi))
