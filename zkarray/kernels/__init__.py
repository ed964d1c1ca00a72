"""Pallas TPU kernels for the hot field ops.

The reference's "drop to a lower level for the hot loop" mechanism is
ark-ff-asm's x86-64 inline-assembly CIOS generator (ff-asm/src/lib.rs:49-120,
enabled per-field at ff/src/fields/models/fp/montgomery_backend.rs:193-212).
The TPU-native analog is this package: Pallas kernels that keep whole limb
blocks VMEM-resident and run the CIOS recurrence as straight-line VPU code,
bypassing the HBM round-trips XLA inserts between composed ops.

Dispatch: zkarray.ff.fp and zkarray.ec.sw consult ``use_pallas(batch_shape)``
at trace time — TPU backend + batch >= 1024 + ZKARRAY_PALLAS != 0. CPU tests
exercise the identical kernel bodies via ZKARRAY_PALLAS_INTERPRET=1.
"""

from zkarray.kernels.mont import (  # noqa: F401
    butterfly_stage,
    interpret_mode,
    mont_mul,
    mont_sqr,
    pallas_enabled,
    use_pallas,
)
