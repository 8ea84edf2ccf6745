"""Multi-host orchestration (no reference counterpart — SURVEY.md §2.7).

The scaling model across a TPU pod slice:

- ``jax.distributed.initialize()`` on every host (coordinator address
  from the env / args), then one global ``Mesh`` over all devices with
  the same ``(dp, sp)`` axes as single-host (``parallel/mesh.py``);
- each host feeds its local shard of the block batch
  (``jax.make_array_from_process_local_data``) — input IO is
  host-local, so reading N shards of a file across N hosts needs no
  cross-host traffic;
- the encode step is the same ``shard_map`` as single-host: the only
  cross-host collective is the 256-bin histogram ``psum`` (rides DCN
  once per batch, 1 KiB);
- per-block compressed frames are fetched host-locally
  (``addressable_shards``) and the ordered container gather happens on
  process 0 (or each host writes its own byte range at offsets from a
  size all-gather).

This module provides the init + host-sharding helpers; correctness of
the sharded compute path is validated on the virtual multi-device mesh
(tests / ``__graft_entry__.dryrun_multichip``), since this environment
exposes a single physical chip.
"""

from __future__ import annotations

import numpy as np


def initialize(coordinator_address=None, num_processes=None,
               process_id=None) -> None:
    """``jax.distributed.initialize`` passthrough (no-op if single)."""
    import jax

    if num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_block_batch(mesh, local_blocks: np.ndarray,
                       local_lengths: np.ndarray):
    """Assemble a process-local block shard into a global dp-sharded
    array pair."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = NamedSharding(mesh, P("dp"))
    blocks = jax.make_array_from_process_local_data(s, local_blocks)
    lengths = jax.make_array_from_process_local_data(s, local_lengths)
    return blocks, lengths


def gather_frames_host_local(arr):
    """Per-host view of the block rows this process owns, as ordered
    ``(first_block_index, rows)`` pieces. Each host then writes its own
    byte range of the container (offsets from a size all-gather), or
    ships its pieces to process 0 — either way no device-level
    cross-host gather is needed."""
    out = []
    for shard in arr.addressable_shards:
        out.append((shard.index[0].start or 0, np.asarray(shard.data)))
    out.sort(key=lambda t: t[0])
    return out
