from zkarray.core.fieldspec import FieldSpec
from zkarray.core import limbs

__all__ = ["FieldSpec", "limbs"]
