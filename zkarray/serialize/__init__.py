from zkarray.serialize.canonical import (
    EMPTY_FLAGS,
    SW_FLAG_INFINITY,
    SW_FLAG_NEGATIVE,
    TE_FLAG_NEGATIVE,
    deserialize_fp,
    field_byte_size,
    serialize_fp,
)

__all__ = [
    "EMPTY_FLAGS",
    "SW_FLAG_INFINITY",
    "SW_FLAG_NEGATIVE",
    "TE_FLAG_NEGATIVE",
    "deserialize_fp",
    "field_byte_size",
    "serialize_fp",
]
