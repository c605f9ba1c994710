"""Multi-host serving dispatch (north star: continuous batching across
hosts; SURVEY.md §6.3/§6.8).

Contract (design + sim-tested here; wall-clock-measured when a 2-host slice
exists — SURVEY.md §8 hard-part 7):

- Every host process runs the same binary: `initialize()` joins the global
  runtime; host 0 is the coordinator.
- The engine jits ONE global-batch step over the global ("dp","tp") mesh.
  Each host feeds its local shard of the batch
  (jax.make_array_from_process_local_data), so cross-host traffic is
  control-plane only — activations never cross DCN outside collectives
  XLA chooses to place there.
- The coordinator's ContinuousBatcher accumulates requests to
  global_batch = B; worker hosts run a lockstep loop: receive their shard
  descriptor, execute the same jitted step (collectives rendezvous), ship
  local outputs back. Transport between hosts is the serving RPC layer
  (HTTP front ends exist per host; shard fan-out uses the same sockets).
- Failure: a dead host breaks the collective -> the step errors on every
  host -> batcher propagates the error to the in-flight batch and the
  health endpoint flips (runtime/distributed.Heartbeat); recovery is
  restart + artifact reload + rejoin (stateless engine).
"""
from __future__ import annotations

import numpy as np


def local_shard_bounds(global_batch: int, process_index: int,
                       process_count: int) -> tuple[int, int]:
    """Contiguous equal split of the global batch across hosts."""
    if global_batch % process_count:
        raise ValueError(f"global batch {global_batch} must divide across "
                         f"{process_count} hosts")
    per = global_batch // process_count
    return process_index * per, (process_index + 1) * per


def make_global_batch(local_arrays, mesh, pspec):
    """Assemble a global jax.Array from per-process local shards."""
    import jax

    return jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(mesh, pspec), np.asarray(local_arrays))


def scaling_efficiency(img_s_1: float, img_s_n: float, n: int) -> float:
    """BASELINE gate helper: measured N-host throughput vs N× single-host."""
    return img_s_n / (n * img_s_1)
