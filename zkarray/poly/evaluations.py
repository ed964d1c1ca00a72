"""Evaluations-over-domain algebra.

Reference analog: ark-poly's Evaluations (poly/src/evaluations/univariate/
mod.rs:19-163): pointwise Add/Sub/Mul/Div over a shared domain (Div via batch
inversion) and interpolation via iFFT.
"""

from __future__ import annotations

import jax.numpy as jnp

from zkarray.ff import fp
from zkarray.poly.domain import Radix2Domain


class Evaluations:
    def __init__(self, domain: Radix2Domain, evals: jnp.ndarray):
        assert evals.shape[1] == domain.size
        self.domain = domain
        self.evals = evals

    @classmethod
    def from_coeffs(cls, domain: Radix2Domain, coeffs: jnp.ndarray):
        return cls(domain, domain.fft(coeffs))

    def interpolate(self) -> jnp.ndarray:
        return self.domain.ifft(self.evals)

    def _chk(self, other):
        if self.domain.size != other.domain.size or (
            self.domain.offset_int != other.domain.offset_int
        ):
            raise ValueError("mismatched domains")

    def __add__(self, other):
        self._chk(other)
        return Evaluations(
            self.domain, fp.add(self.domain.spec, self.evals, other.evals)
        )

    def __sub__(self, other):
        self._chk(other)
        return Evaluations(
            self.domain, fp.sub(self.domain.spec, self.evals, other.evals)
        )

    def __mul__(self, other):
        self._chk(other)
        return Evaluations(
            self.domain, fp.mont_mul(self.domain.spec, self.evals, other.evals)
        )

    def __truediv__(self, other):
        self._chk(other)
        inv = fp.batch_inv(self.domain.spec, other.evals)
        return Evaluations(
            self.domain, fp.mont_mul(self.domain.spec, self.evals, inv)
        )
