"""Multi-process (multi-host) initialization.

TPU-native replacement for MPI_Init + per-rank topology discovery
(reference src/main.cpp:10, src/dimensions.cpp): on a real pod slice
``init_distributed()`` with no arguments lets JAX discover the topology
from the TPU environment; for explicit clusters (or CPU simulation) pass
coordinator/num_processes/process_id.

After initialization, ``jax.devices()`` is the global device list and
``gmrm_tpu.parallel.runner.run_training_sharded`` automatically loads,
computes, and writes only each process's own marker shards.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join this process into the global JAX runtime.

    On TPU pods all arguments are auto-discovered (pass nothing).  For
    manual clusters / CPU simulation pass coordinator ("host:port"),
    num_processes, and process_id.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def is_coordinator() -> bool:
    return jax.process_index() == 0
