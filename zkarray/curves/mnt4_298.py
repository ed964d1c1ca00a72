"""MNT4-298 parameters (standard public constants).

Reference analog: curves/mnt4_298/src/{fields,curves} — the MNT4-298 /
MNT6-298 amicable pair (Fq here = Fr of MNT6-298 and vice versa).
"""

from zkarray.core.fieldspec import FieldSpec
from zkarray.ec.sw import SWCurveSpec
from zkarray.ec.sw_ext import ExtCurveSpec
from zkarray.ff.towers import ExtOps, PrimeOps

# fields (curves/mnt4_298/src/fields/{fq.rs,fr.rs})
FQ_MODULUS = 475922286169261325753349249653048451545124879242694725395555128576210262817955800483758081
FR_MODULUS = 475922286169261325753349249653048451545124878552823515553267735739164647307408490559963137

FQ = FieldSpec(FQ_MODULUS, generator=17, name="mnt4_298.Fq",
               small_subgroup_base=7, small_subgroup_base_adicity=2)
FR = FieldSpec(FR_MODULUS, generator=10, name="mnt4_298.Fr")

FQ_OPS = PrimeOps(FQ)
# Fq2 = Fq[u]/(u² - 17) (fields/fq2.rs NONRESIDUE = 17)
FQ2 = ExtOps("mnt4_298.Fq2", FQ_OPS, 2, 17)
# Fq4 = Fq2[v]/(v² - u) (fields/fq4.rs NONRESIDUE = (0, 1))
FQ4 = ExtOps("mnt4_298.Fq4", FQ2, 2, (0, 1))

# G1: y² = x³ + 2x + b (curves/g1.rs)
G1 = SWCurveSpec(
    name="mnt4_298.G1", base=FQ, scalar=FR,
    a=2,
    b=423894536526684178289416011533888240029318103673896002803341544124054745019340795360841685,
    gen_x=60760244141852568949126569781626075788424196370144486719385562369396875346601926534016838,
    gen_y=363732850702582978263902770815145784459747722357071843971107674179038674942891694705904306,
    cofactor=1,
)

# G2 over Fq2 (curves/g2.rs): a = TWIST_COEFF_A = (34, 0), b = (0, 17·b1)
G2 = ExtCurveSpec(
    name="mnt4_298.G2", ops=FQ2, scalar_spec=FR,
    a_host=(34, 0),
    b_host=(0, 67372828414711144619833451280373307321534573815811166723479321465776723059456513877937430),
    gen_x_host=(
        438374926219350099854919100077809681842783509163790991847867546339851681564223481322252708,
        37620953615500480110935514360923278605464476459712393277679280819942849043649216370485641,
    ),
    gen_y_host=(
        37437409008528968268352521034936931842973546441370663118543015118291998305624025037512482,
        424621479598893882672393190337420680597584695892317197646113820787463109735345923009077489,
    ),
    cofactor=475922286169261325753349249653048451545124879932565935237842521413255878328503110407553025,
)

# pairing engine (curves/mod.rs MNT4Config)
from zkarray.ec.pairing.mnt import MNTSpec  # noqa: E402

ATE_LOOP_COUNT = [
    1, 0, 0, 0, 0, -1, 0, 0, 0, -1, 0, 0, 0, -1, 0, 1, 0, 1, 0, 1, 0, 1, 0,
    1, 0, 0, 1, 0, -1, 0, 1, 0, -1, 0, 0, 0, 0, 0, 1, 0, 1, 0, -1, 0, 0, 0,
    -1, 0, -1, 0, -1, 0, 0, -1, 0, -1, 0, 0, 0, 0, 0, -1, 0, -1, 0, 0, 0, 0,
    1, 0, 1, 0, 1, 0, 0, 1, 0, -1, 0, 1, 0, 0, 0, 0, 0, -1, 0, 0, 0, 1, 0,
    0, -1, 0, 0, -1, 0, 0, 1, 0, 1, 0, -1, 0, 1, 0, 0, 0, 1, 0, 0, -1, 0, 0,
    -1, 0, -1, 0, 1, 0, 0, -1, 0, 0, 1, 0, -1, 0, -1, 0, 1, 0, -1, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
]

PAIRING = MNTSpec(
    name="mnt4_298",
    fq_spec=FQ,
    fq_tw=FQ2,
    fq_target=FQ4,
    g1_curve=G1,
    g2_curve=G2,
    twist_host=(0, 1),
    twist_coeff_a_host=(34, 0),
    ate_loop_count=ATE_LOOP_COUNT,
    ate_is_loop_count_neg=False,
    final_exp_last_chunk_1=1,
    final_exp_w0_abs=689871209842287392837045615510547309923794945,
    final_exp_w0_neg=False,
)
