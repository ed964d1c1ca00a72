"""Pallas TPU kernels for the hot field ops.

The reference's "drop to a lower level for the hot loop" mechanism is
ark-ff-asm's x86-64 inline-assembly CIOS generator (ff-asm/src/lib.rs:49-120,
enabled per-field at ff/src/fields/models/fp/montgomery_backend.rs:193-212).
The TPU-native analog is this package: Pallas kernels that keep whole limb
blocks VMEM-resident and run the CIOS recurrence as straight-line VPU code,
bypassing any HBM round-trips XLA would insert between composed ops.

Kernels run compiled on TPU and in interpreter mode on CPU (tests).
"""

from zkarray.kernels.mont import (  # noqa: F401
    butterfly_stage,
    mont_mul,
    mont_sqr,
    pallas_enabled,
)
