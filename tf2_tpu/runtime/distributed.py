"""Multi-host bring-up (SURVEY.md §6.3/§6.8; north star: continuous
batching across hosts, collectives over ICI/DCN).

Reference parity: none — the FPGA stack was single-process. TPU-native:
``jax.distributed.initialize`` forms the global runtime; every host sees
the same global mesh; arrays with NamedShardings place shards on local
devices; XLA routes intra-slice collectives over ICI and cross-host edges
over DCN.

Failure model (inference engine — deliberately simple, SURVEY.md §6.3):
weights are stateless (the artifact is the checkpoint), so recovery ==
process restart + artifact reload + re-join. ``heartbeat`` provides the
liveness signal the serving layer exports via /healthz; a missed barrier
at startup fails fast rather than hanging.
"""
from __future__ import annotations

import os
import time


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None, timeout_s: float = 120.0) -> dict:
    """Join (or no-op on single-process). Returns topology facts."""
    import jax

    env_np = num_processes or int(os.environ.get("TF2TPU_NUM_PROCESSES", "1"))
    if env_np > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator or
            os.environ.get("TF2TPU_COORDINATOR", "127.0.0.1:8890"),
            num_processes=env_np,
            process_id=process_id if process_id is not None
            else int(os.environ.get("TF2TPU_PROCESS_ID", "0")),
            initialization_timeout=int(timeout_s),
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def barrier(name: str = "startup", timeout_s: float = 60.0) -> None:
    """Cross-host barrier via a tiny psum on the global mesh: every process
    must arrive or the collective (and thus serving startup) fails fast."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        return
    devs = jax.devices()
    mesh = Mesh(devs, ("all",))
    x = jnp.ones((len(devs),), jnp.float32)
    x = jax.device_put(x, NamedSharding(mesh, P("all")))
    total = jax.jit(lambda v: v.sum(), out_shardings=NamedSharding(mesh, P()))(x)
    assert float(total) == len(devs)


class Heartbeat:
    """Liveness for the serving layer: a monotonically bumped timestamp the
    health endpoint reads; staleness => unhealthy (tested via fault
    injection in tests/dist/test_failure.py)."""

    def __init__(self, stale_after_s: float = 10.0):
        self.stale_after_s = stale_after_s
        self._last = time.monotonic()

    def beat(self) -> None:
        self._last = time.monotonic()

    def healthy(self) -> bool:
        return (time.monotonic() - self._last) < self.stale_after_s

    def age_s(self) -> float:
        return time.monotonic() - self._last
