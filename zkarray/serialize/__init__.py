from zkarray.serialize.canonical import (
    EMPTY_FLAGS,
    SW_FLAG_INFINITY,
    SW_FLAG_NEGATIVE,
    TE_FLAG_NEGATIVE,
    deserialize_fp,
    field_byte_size,
    serialize_fp,
)
# NOTE: the struct-derive decorator lives in zkarray.serialize.derive as
# `canonical`; it is deliberately NOT re-exported here because the name
# would shadow the `canonical` submodule import used across the codebase.
from zkarray.serialize.derive import Codec
from zkarray.serialize.wrappers import (
    COMPRESSED_CHECKED,
    COMPRESSED_UNCHECKED,
    UNCOMPRESSED_CHECKED,
    UNCOMPRESSED_UNCHECKED,
    Mode,
)

__all__ = [
    "EMPTY_FLAGS",
    "SW_FLAG_INFINITY",
    "SW_FLAG_NEGATIVE",
    "TE_FLAG_NEGATIVE",
    "COMPRESSED_CHECKED",
    "COMPRESSED_UNCHECKED",
    "UNCOMPRESSED_CHECKED",
    "UNCOMPRESSED_UNCHECKED",
    "Codec",
    "Mode",
    "deserialize_fp",
    "field_byte_size",
    "serialize_fp",
]
