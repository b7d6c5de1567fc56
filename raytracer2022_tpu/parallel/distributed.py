"""Multi-host (pod-slice) execution glue.

The reference's whole parallel story is 8 OS threads in one process
(reference: raytracer/src/main.rs:109-162).  The TPU-native equivalent at
pod scale is one process per host, connected by ``jax.distributed``; all
chips of all hosts form one global :class:`jax.sharding.Mesh` and the
existing ``shard_map`` renderers (parallel/mesh.py) run unchanged — the
radiance ``psum`` rides ICI within a slice and DCN across hosts.

Run one process per host with e.g.::

    python -m raytracer2022_tpu.cli --scene cornell_box ... \
        --coordinator host0:12345 --num-processes 2 --process-id $RANK

The same path is CI-testable without TPUs: N CPU processes on localhost
form a fake cluster (tests/test_distributed.py), exactly the strategy
SURVEY.md §4 prescribes.
"""

from __future__ import annotations

from typing import Optional

import jax


def init_distributed(
    coordinator: Optional[str],
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[list] = None,
) -> bool:
    """Join (or skip joining) a multi-process jax cluster.

    No-op returning False when ``coordinator`` is None (single-process).
    After a successful initialize, ``jax.devices()`` spans every host and
    the mesh helpers in parallel/mesh.py operate globally.
    """
    if not coordinator:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def is_primary() -> bool:
    """True on the process that should write images / print reports."""
    return jax.process_index() == 0
