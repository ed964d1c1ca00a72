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

# ---- tower: Fq2 = Fq[u]/(u²+1), Fq6 = Fq2[v]/(v³-(9+u)),
#      Fq12 = Fq6[w]/(w²-v)  (curves/bn254/src/fields/)
from zkarray.ff.towers import ExtOps, PrimeOps  # noqa: E402

FQ_OPS = PrimeOps(FQ)
FQ2 = ExtOps("bn254.Fq2", FQ_OPS, 2, FQ_MODULUS - 1)  # β = -1


def _nr6_hook(base_ops, x):
    # x ∈ Fq2 = a + b·u; x·(9+u) = (9a - b) + (a + 9b)·u
    import jax.numpy as jnp

    B = base_ops.base  # Fq ops
    a, b = x[0], x[1]
    a9 = B.add(B.double(B.double(B.double(a))), a)  # 9a
    b9 = B.add(B.double(B.double(B.double(b))), b)
    return jnp.stack([B.sub(a9, b), B.add(a, b9)], axis=0)


FQ6 = ExtOps("bn254.Fq6", FQ2, 3, (9, 1), mul_nonresidue_hook=_nr6_hook)
FQ12 = ExtOps("bn254.Fq12", FQ6, 2, ((0, 0), (1, 0), (0, 0)))  # β = v

# G2: y² = x³ + 3/(9+u) over Fq2, D-twist (curves/bn254/src/curves/g2.rs)
from zkarray.ec.sw_ext import ExtCurveSpec  # noqa: E402

G2 = ExtCurveSpec(
    name="bn254.G2",
    ops=FQ2,
    scalar_spec=FR,
    a_host=(0, 0),
    b_host=(
        19485874751759354771024239261021720505790618469301721065564631296452457478373,
        266929791119991161246907387137283842545076965332900288569378510910307636690,
    ),
    gen_x_host=(
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    ),
    gen_y_host=(
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    ),
    cofactor=0x30644E72E131A029B85045B68181585E06CEECDA572A2489345F2299C0F9FA8D,
)

# Full pairing engine spec (BN family; X = 4965661367192848881, D-twist)
from zkarray.ec.pairing.bn import BnSpec  # noqa: E402

ATE_LOOP_COUNT = [
    0, 0, 0, 1, 0, 1, 0, -1, 0, 0, -1, 0, 0, 0, 1, 0, 0, -1, 0, -1, 0, 0, 0,
    1, 0, -1, 0, 0, 0, 0, -1, 0, 0, 1, 0, -1, 0, 0, 1, 0, 0, 0, 0, 0, -1, 0,
    0, -1, 0, 1, 0, -1, 0, 0, 0, -1, 0, -1, 0, 0, 0, 1, 0, 1, 1,
]

PAIRING = BnSpec(
    name="bn254",
    x=4965661367192848881,
    ate_loop_count=ATE_LOOP_COUNT,
    twist_type="D",
    fq_spec=FQ,
    fq2=FQ2,
    fq6=FQ6,
    fq12=FQ12,
    g1_curve=G1,
    g2_curve=G2,
    twist_mul_by_q_x=(
        21575463638280843010398324269430826099269044274347216827212613867836435027261,
        10307601595873709700152284273816112264069230130616436755625194854815875713954,
    ),
    twist_mul_by_q_y=(
        2821565182194536844548159561693502659359617185244120367078079554186484126554,
        3505843767911556378687030309984248845540243509899259641013678093033130930403,
    ),
)
