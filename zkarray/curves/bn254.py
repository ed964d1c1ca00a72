"""BN254 field/curve parameters (standard public constants).

Reference analog: curves/bn254/src/fields/{fr.rs,fq.rs}.
"""

from zkarray.core.fieldspec import FieldSpec

# Scalar field Fr: 254 bits, 2-adicity 28
FR_MODULUS = 21888242871839275222246405745257275088548364400416034343698204186575808495617
FR = FieldSpec(FR_MODULUS, generator=5, name="bn254.Fr")

# Base field Fq: 254 bits, q ≡ 3 (mod 4)
FQ_MODULUS = 21888242871839275222246405745257275088696311157297823662689037894645226208583
FQ = FieldSpec(FQ_MODULUS, generator=3, name="bn254.Fq")

# G1: y^2 = x^3 + 3, generator (1, 2), cofactor 1
# (curves/bn254/src/curves/g1.rs)
from zkarray.ec.sw import SWCurveSpec  # noqa: E402

G1 = SWCurveSpec(
    name="bn254.G1", base=FQ, scalar=FR, a=0, b=3, gen_x=1, gen_y=2, cofactor=1
)
