"""zkarray — a TPU-native ZK algebra framework.

A brand-new, TPU-first framework with the capabilities of arkworks-rs/algebra
(finite fields, elliptic curves, pairings, polynomials/FFTs, canonical
serialization), built from scratch on JAX/XLA/Pallas.

Design (see SURVEY.md §7): the primitive value is a *batch*. A field array is a
planar limb tensor ``uint32[L, *batch]`` holding base-2^16 limbs (L = 4 *
ceil(bits/64), so the Montgomery radix R = 2^(16 L) matches arkworks'
64-bit-limb R exactly). Configs are frozen Python objects holding precomputed
constants — the trace-time analog of arkworks' ``MontConfig`` derive macro
(reference: ff-macros/src/montgomery/mod.rs).
"""

from zkarray.core.fieldspec import FieldSpec
from zkarray.ff import fp

__version__ = "0.1.0"

__all__ = ["FieldSpec", "fp", "__version__"]
