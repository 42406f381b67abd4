"""Multi-process / rank helpers.

The reference's ``utils/distributed.py`` carried DDP unwrap + NCCL metric
all-reduce + BN-stat broadcast.  In SPMD-jit none of that exists as user
code: gradient/metric reductions are global reductions inside the jitted
step, and BN stats computed over the global (sharded) batch are already
synchronized.  What remains host-side is process identity and optional
multi-host init.
"""

from __future__ import annotations

import jax


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host init (no-op single-host).  The analog of the reference's
    ``torch.distributed.init_process_group`` (``scripts/main.py:59-67``)."""
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def is_main_process() -> bool:
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def local_device_count() -> int:
    return jax.local_device_count()
