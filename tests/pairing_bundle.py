"""Session-shared pairing computations for the fast-tier pairing tests.

Compile discipline (round-4 lesson): every distinct (family, batch-width,
combine-flag) pairing call compiles its own Miller ladder — minutes each on
a cold 2-CPU box. All fast-tier assertions therefore derive from ONE
`pairing_each` call per family at a canonical width-4 input, cached here
per process (the reference's test_pairing! suite similarly reuses a single
set of generator pairings, test-templates/src/pairing.rs:2-67).

Canonical pairs (index -> pair):
  0: (G,  H)      generic
  1: (2G, H)      doubled G1 side
  2: (G,  2H)     doubled G2 side
  3: (inf, H)     infinity contributes 1
"""

import functools

import numpy as np
import jax.numpy as jnp


def _cat_g1(sw, parts):
    return sw.AffinePoints(
        jnp.concatenate([p.x for p in parts], axis=1),
        jnp.concatenate([p.y for p in parts], axis=1),
        jnp.concatenate([p.inf for p in parts]),
    )


def _cat_g2(sw_ext, parts):
    return sw_ext.ExtAffine(
        jnp.concatenate([p.x for p in parts], axis=-1),
        jnp.concatenate([p.y for p in parts], axis=-1),
        jnp.concatenate([p.inf for p in parts]),
    )


def _build(curves_mod, pairing_mod, pairing_each, pairing):
    from zkarray.ec import sw, sw_ext

    b = curves_mod
    G = b.G1.generator((1,))
    G2j = sw.from_affine(b.G1, G)
    G_dbl = sw.to_affine(b.G1, sw.jac_double(b.G1, G2j))
    inf1 = sw.AffinePoints(
        jnp.zeros_like(G.x), jnp.zeros_like(G.y), jnp.ones(1, dtype=bool)
    )
    H = b.G2.generator((1,))
    Hj = sw_ext.from_affine(b.G2, H)
    H_dbl = sw_ext.to_affine(b.G2, sw_ext.double(b.G2, Hj))

    P = _cat_g1(sw, [G, G_dbl, G, inf1])
    Q = _cat_g2(sw_ext, [H, H, H_dbl, H])
    gts = pairing_each(b.PAIRING, P, Q)  # width 4, ONE Miller compile
    # combine=True coverage at the SAME width: product over the 4 pairs
    prod = pairing(b.PAIRING, P, Q)
    return {"mod": b, "P": P, "Q": Q, "gts": gts, "prod": prod}


@functools.lru_cache(maxsize=None)
def bls12_381():
    from zkarray.curves import bls12_381 as b
    from zkarray.ec.pairing import bls12

    return _build(b, bls12, bls12.pairing_each, bls12.pairing)


@functools.lru_cache(maxsize=None)
def bn254():
    from zkarray.curves import bn254 as b
    from zkarray.ec.pairing import bn

    return _build(b, bn, bn.pairing_each, bn.pairing)
