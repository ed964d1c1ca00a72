"""Curve/field instantiations — pure config data.

Reference analog: the curves/ workspace of 31 crates (curves/README.md), each
of which is field configs via MontConfig derive + curve configs. Here each
module exports FieldSpec (and later CurveSpec) instances; all constants are
standard published curve parameters.
"""
