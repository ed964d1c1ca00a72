from zkarray.poly.domain import Radix2Domain

__all__ = ["Radix2Domain"]
