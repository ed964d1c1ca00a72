"""Serde-style mode wrappers + hash extension.

Reference analog: serialize/src/serde.rs:12-24 (CompressedChecked /
CompressedUnchecked / UncompressedChecked / UncompressedUnchecked wrappers
choosing the Compress × Validate mode) and CanonicalSerializeHashExt
(serialize/src/lib.rs:265-284): hash = H(serialize(x)).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Any, Callable


@dataclass(frozen=True)
class Mode:
    compress: bool
    validate: bool


COMPRESSED_CHECKED = Mode(True, True)
COMPRESSED_UNCHECKED = Mode(True, False)
UNCOMPRESSED_CHECKED = Mode(False, True)
UNCOMPRESSED_UNCHECKED = Mode(False, False)


def hash_canonical(serialize_fn: Callable[[], "bytes"], hash_name: str = "sha256") -> bytes:
    """H(canonical_bytes) — CanonicalSerializeHashExt (hash / hash_uncompressed)."""
    data = serialize_fn()
    if not isinstance(data, (bytes, bytearray)):
        data = bytes(bytearray(data.reshape(-1)))
    return hashlib.new(hash_name, data).digest()
