"""Multi-host lockstep serving (north star: continuous batching across
hosts; SURVEY.md §6.3/§6.8, implemented per VERDICT r1 item 3).

Reference parity: none — the FPGA stack was single-process per board
(SURVEY.md §3 P2); this subsystem is new, TPU-native design.

Execution model (SPMD, one process per host):

- Every host process runs the same binary: ``runtime.distributed.initialize``
  joins the global runtime; process 0 is the coordinator.
- ``MultiHostEngine`` jits ONE global-batch step over the global
  ("dp","tp") mesh. Each host holds its local shard of the global batch
  (``jax.make_array_from_process_local_data``); collectives inside the
  step rendezvous over ICI/DCN as placed by XLA.
- The step protocol is lockstep: the coordinator broadcasts a step
  descriptor ``(seq, n_valid, stop)`` followed by the input batch
  (``multihost_utils.broadcast_one_to_all`` — control plane over the
  distributed KV/collective layer); every host slices out its rows, runs
  the same jitted step, and the outputs are allgathered back. On a real
  deployment the descriptor broadcast stays, while per-host front ends
  would feed local shards directly — the protocol supports that by
  passing ``local_rows`` instead of a coordinator batch.
- The coordinator wraps the loop in a ``ContinuousBatcher``
  (``serve.batcher``): requests accumulate to the global batch size and
  ship as one lockstep step — continuous batching across hosts.
- Failure: a dead host breaks the broadcast/collective -> the step errors
  on every host -> the batcher propagates the error to the in-flight
  requests and /healthz flips (runtime/distributed.Heartbeat). Recovery is
  restart + artifact reload + rejoin (stateless engine).

Tested without a multi-host slice by spawning real OS processes over
loopback CPU devices (tests/dist/test_multiprocess.py, SURVEY.md §5.4).
"""
from __future__ import annotations

import time
from typing import Callable

import numpy as np

_STOP = -1


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


class MultiHostEngine:
    """Lockstep global-batch executor over all hosts.

    Every process constructs this with the SAME graph/params (the artifact
    is the contract) and then either drives steps (coordinator) or follows
    them (``worker_loop``).
    """

    def __init__(self, graph, params, mesh=None):
        import jax
        from ..parallel.mesh import MeshConfig, make_mesh
        from ..runtime.engine import Engine

        if mesh is None:
            mesh = make_mesh()
        self.mesh_cfg: "MeshConfig" = mesh
        self.engine = Engine(graph, params, mesh=mesh)
        self.graph = self.engine.graph
        self.input_name = next(iter(graph.inputs))
        spec = graph.inputs[self.input_name]
        self.global_batch = spec.shape[0]
        self.input_shape = tuple(spec.shape)
        self.input_dtype = spec.dtype
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        self.is_coordinator = self.process_index == 0
        self._seq = 0

    # ---- lockstep protocol -------------------------------------------------
    def _bcast(self, value):
        from jax.experimental import multihost_utils
        return multihost_utils.broadcast_one_to_all(value)

    def _run_sharded(self, batch_np: np.ndarray):
        import jax
        from jax.experimental import multihost_utils
        lo, hi = local_shard_bounds(self.global_batch, self.process_index,
                                    self.process_count)
        local = batch_np[lo:hi]
        sharding = self.engine._in_sh.get(self.input_name)
        if sharding is None:
            sharding = self.mesh_cfg.named(
                self.mesh_cfg.dp_axis, *([None] * (len(self.input_shape) - 1)))
        garr = jax.make_array_from_process_local_data(sharding, local)
        out = self.engine(**{self.input_name: garr})
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(multihost_utils.process_allgather(
            leaf, tiled=True))

    def step(self, batch_np: np.ndarray | None = None) -> np.ndarray | None:
        """One lockstep step. Coordinator passes the global batch; workers
        pass None and receive it via broadcast. Returns the full global
        output on every host."""
        desc = np.array([self._seq, 0], np.int64)
        if self.is_coordinator:
            if batch_np is None:
                raise ValueError("coordinator must supply the batch")
            desc = np.array([self._seq, 1], np.int64)
        desc = self._bcast(desc)
        if desc[1] == _STOP:
            return None
        if self.is_coordinator:
            payload = np.ascontiguousarray(batch_np, self.input_dtype)
        else:
            payload = np.zeros(self.input_shape, self.input_dtype)
        payload = self._bcast(payload)
        self._seq += 1
        return self._run_sharded(np.asarray(payload))

    def shutdown(self):
        """Coordinator: release workers from worker_loop()."""
        if self.is_coordinator:
            self._bcast(np.array([self._seq, _STOP], np.int64))

    def worker_loop(self, max_steps: int | None = None):
        """Non-coordinator hosts: follow coordinator steps until shutdown."""
        steps = 0
        while max_steps is None or steps < max_steps:
            desc = self._bcast(np.array([0, 0], np.int64))
            if desc[1] == _STOP:
                return steps
            payload = self._bcast(np.zeros(self.input_shape,
                                           self.input_dtype))
            self._seq += 1
            self._run_sharded(np.asarray(payload))
            steps += 1
        return steps

    # ---- serving front end ---------------------------------------------
    def make_batcher(self, max_wait_s: float = 0.002):
        """Coordinator-side continuous batcher feeding lockstep steps."""
        from .batcher import ContinuousBatcher

        if not self.is_coordinator:
            raise RuntimeError("batcher runs on the coordinator only")
        return ContinuousBatcher(
            run_batch=lambda b: self.step(b),
            batch_size=self.global_batch,
            example_shape=self.input_shape[1:],
            max_wait_s=max_wait_s,
            dtype=self.input_dtype).start()

    # ---- measurement -----------------------------------------------------
    def measure_throughput(self, n_steps: int = 8) -> float:
        """Lockstep steps/s -> img/s (coordinator feeds zero batches; all
        hosts must call this together: coordinator -> measure, workers ->
        worker_loop(n_steps + 1))."""
        x = np.zeros(self.input_shape, self.input_dtype)
        self.step(x)  # warm
        t0 = time.perf_counter()
        for _ in range(n_steps):
            self.step(x)
        dt = time.perf_counter() - t0
        return self.global_batch * n_steps / dt
