"""BLS12-381 field/curve parameters (standard public constants).

Reference analog: curves/bls12_381/src/fields/{fr.rs,fq.rs} (MontConfig
attrs: modulus, generator) and curves/bls12_381/src/curves/.
"""

from zkarray.core.fieldspec import FieldSpec

# Scalar field Fr: 255 bits, 2-adicity 32 (curves/bls12_381/src/fields/fr.rs:1-9)
FR_MODULUS = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
FR = FieldSpec(FR_MODULUS, generator=7, name="bls12_381.Fr")

# Base field Fq: 381 bits, q ≡ 3 (mod 4) (curves/bls12_381/src/fields/fq.rs)
FQ_MODULUS = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
FQ = FieldSpec(FQ_MODULUS, generator=2, name="bls12_381.Fq")

# BLS parameter X (curve family parameter; ate loop count)
X = -0xD201000000010000

# G1: y^2 = x^3 + 4 (curves/bls12_381/src/curves/g1.rs)
from zkarray.ec.sw import SWCurveSpec  # noqa: E402

G1 = SWCurveSpec(
    name="bls12_381.G1",
    base=FQ,
    scalar=FR,
    a=0,
    b=4,
    gen_x=0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
    gen_y=0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1,
    cofactor=0x396C8C005555E1568C00AAAB0000AAAB,
)
