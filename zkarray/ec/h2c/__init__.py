from zkarray.ec.h2c.swu import swu_map
from zkarray.ec.h2c.wb import bls12_381_g1_wb_map, hash_to_curve_bls12_381_g1

__all__ = ["swu_map", "bls12_381_g1_wb_map", "hash_to_curve_bls12_381_g1"]
