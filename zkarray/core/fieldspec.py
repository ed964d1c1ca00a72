"""Per-field constant precomputation ("the field config compiler").

Reference analog: ark-ff's ``MontConfig`` derive macro
(ff-macros/src/montgomery/mod.rs:24-171) and the const-fns in
ff/src/fields/models/fp/montgomery_backend.rs:15-125, which compute the
Montgomery constants R, R2, INV, the 2-adic root of unity, and the sqrt
precomputation at compile time. Here the same constants are computed once per
field in Python ints at ``FieldSpec`` construction and baked into jitted
kernels as uint32 limb constants.

Representation choice: base-2^16 limbs stored in uint32 lanes, planar layout
``uint32[L, *batch]`` with the limb axis leading. L = 4 * ceil(bits / 64) so
that the Montgomery radix R = 2^(16 L) equals arkworks' 64-bit-limb radix —
Montgomery-form values are numerically identical to the reference's.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple


LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def _limbs_of(x: int, n: int) -> Tuple[int, ...]:
    """Little-endian base-2^16 limbs of ``x`` (n limbs)."""
    return tuple((x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n))


class FieldSpec:
    """All precomputed constants for one prime field.

    Hashable / usable as a jit static argument. Construction cost is Python-int
    arithmetic only (fast even for 753-bit fields).

    Reference parity: MODULUS/GENERATOR/TWO_ADICITY etc. mirror the associated
    consts of ark-ff's ``MontConfig`` (ff/src/fields/models/fp/
    montgomery_backend.rs:15-66) and ``FftField`` (ff/src/fields/
    fft_friendly.rs:3-148).
    """

    def __init__(
        self,
        modulus: int,
        generator: int,
        name: str = "",
        small_subgroup_base: Optional[int] = None,
        small_subgroup_base_adicity: Optional[int] = None,
    ):
        if modulus < 3 or modulus % 2 == 0:
            raise ValueError("modulus must be an odd prime >= 3")
        self.modulus = modulus
        self.generator_int = generator % modulus
        self.name = name or f"Fp{modulus.bit_length()}_{modulus % (1 << 32):#x}"

        self.bits = modulus.bit_length()
        # 64-bit word count (arkworks N) and 16-bit limb count L = 4N, keeping
        # R = 2^(16 L) identical to arkworks' R = 2^(64 N).
        self.n64 = -(-self.bits // 64)
        self.num_limbs = 4 * self.n64
        self.r_bits = LIMB_BITS * self.num_limbs

        p = modulus
        self.r_int = (1 << self.r_bits) % p  # Montgomery R mod p
        self.r2_int = (self.r_int * self.r_int) % p  # R^2 mod p
        # INV = -p^{-1} mod 2^16 (per-limb Montgomery factor; reference
        # computes the 2^64 analog: montgomery_backend.rs:56-66).
        self.inv16 = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

        # 2-adicity: p - 1 = 2^s * t with t odd.
        t = p - 1
        s = 0
        while t % 2 == 0:
            t //= 2
            s += 1
        self.two_adicity = s
        self.trace = t  # odd part of p-1
        self.two_adic_root_int = pow(self.generator_int, t, p)

        # Optional small multiplicative subgroup (mixed-radix FFT support,
        # reference: ff/src/fields/fft_friendly.rs:33-75). q^b || p-1.
        self.small_subgroup_base = small_subgroup_base
        self.small_subgroup_base_adicity = small_subgroup_base_adicity
        self.large_subgroup_root_int: Optional[int] = None
        if small_subgroup_base is not None:
            if small_subgroup_base_adicity is None:
                q, a = small_subgroup_base, 0
                tt = self.trace
                while tt % q == 0:
                    tt //= q
                    a += 1
                self.small_subgroup_base_adicity = a
            full = (1 << self.two_adicity) * (
                self.small_subgroup_base ** self.small_subgroup_base_adicity
            )
            self.large_subgroup_root_int = pow(
                self.generator_int, (p - 1) // full, p
            )

        # sqrt precomputation (reference: ff/src/fields/sqrt.rs:67-216 and the
        # selection logic montgomery_backend.rs:566-597).
        if p % 4 == 3:
            self.sqrt_mode = "3mod4"
            self.sqrt_exp = (p + 1) // 4
            self.sqrt_qnr = None
        elif p % 8 == 5:
            # Atkin case (reference sqrt.rs Case5Mod8;
            # selection: montgomery_backend.rs:566-597)
            self.sqrt_mode = "5mod8"
            self.sqrt_exp = (p + 3) // 8
            self.sqrt_qnr = 2  # 2 is a guaranteed non-residue when p ≡ 5 (mod 8)
        else:
            # Tonelli–Shanks: needs a guaranteed quadratic non-residue. Some
            # reference configs ship a "generator" that is actually a square
            # (harmless there since those fields are never FFT'd); derive a
            # certified QNR independently.
            self.sqrt_mode = "tonelli"
            self.sqrt_exp = (t - 1) // 2
            qnr = self.generator_int
            if pow(qnr, (p - 1) // 2, p) != p - 1:
                qnr = 2
                while pow(qnr, (p - 1) // 2, p) != p - 1:
                    qnr += 1
            self.sqrt_qnr = qnr

        self.mod_minus_one_div_two = (p - 1) // 2

        # Can a CIOS product of canonical inputs skip the top extra limb?
        # True when 2p < 2^(16L) (i.e. p has a spare top bit) — analog of the
        # reference's no-carry/spare-bit predicates (montgomery_backend.rs:
        # 541-553).
        self.has_spare_bit = (p << 1) < (1 << self.r_bits)

    # ---- identity / hashing (spec is a jit static argument) ----

    def __hash__(self):
        return hash((self.modulus, self.generator_int))

    def __eq__(self, other):
        return (
            isinstance(other, FieldSpec)
            and self.modulus == other.modulus
            and self.generator_int == other.generator_int
        )

    def __repr__(self):
        return f"FieldSpec({self.name}, bits={self.bits}, L={self.num_limbs})"

    # ---- limb-constant views ----

    @functools.cached_property
    def modulus_limbs(self) -> Tuple[int, ...]:
        return _limbs_of(self.modulus, self.num_limbs)

    @functools.cached_property
    def r_limbs(self) -> Tuple[int, ...]:
        return _limbs_of(self.r_int, self.num_limbs)

    @functools.cached_property
    def r2_limbs(self) -> Tuple[int, ...]:
        return _limbs_of(self.r2_int, self.num_limbs)

    # ---- host-side integer helpers ----

    def to_mont_int(self, x: int) -> int:
        return (x * self.r_int) % self.modulus

    def from_mont_int(self, x: int) -> int:
        rinv = pow(self.r_int, -1, self.modulus)
        return (x * rinv) % self.modulus

    def root_of_unity(self, n: int) -> int:
        """Canonical n-th root of unity for n | 2^s (* q^a), or raise.

        Reference: FftField::get_root_of_unity (ff/src/fields/
        fft_friendly.rs:78-148).
        """
        if n <= 0:
            raise ValueError("n must be positive")
        # factor n = 2^k * q^a' with remaining factor 1
        k = (n & -n).bit_length() - 1
        rest = n >> k
        if rest == 1:
            if k > self.two_adicity:
                raise ValueError(f"no 2^{k}-th root of unity in {self.name}")
            w = self.two_adic_root_int
            for _ in range(self.two_adicity - k):
                w = (w * w) % self.modulus
            return w
        if self.small_subgroup_base is None:
            raise ValueError(f"domain size {n} unsupported in {self.name}")
        q = self.small_subgroup_base
        a = 0
        while rest % q == 0:
            rest //= q
            a += 1
        if rest != 1 or a > self.small_subgroup_base_adicity or k > self.two_adicity:
            raise ValueError(f"domain size {n} unsupported in {self.name}")
        # w = large_root ^ (2^(s-k) * q^(b-a))
        e = (1 << (self.two_adicity - k)) * (
            q ** (self.small_subgroup_base_adicity - a)
        )
        return pow(self.large_subgroup_root_int, e, self.modulus)
