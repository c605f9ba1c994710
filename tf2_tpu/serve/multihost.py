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
- The step protocol is lockstep with TWO data planes (VERDICT r2 item 5):
  * coordinator-fed (``step(batch_np)``): the coordinator broadcasts a
    step descriptor followed by the global batch; every host slices out
    its rows. O(global) broadcast traffic — kept for the single-frontend
    continuous batcher.
  * shard-local (``step(local_rows=...)``): ONLY the descriptor is
    broadcast; every host feeds its own shard of the batch (per-host
    front ends), and with ``gather=False`` each host keeps only its own
    output rows — no O(global) data movement outside the jitted step's
    own collectives. This is the scaling path; bench/multihost_sim.py
    measures both.
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
_MODE_GLOBAL = 1   # coordinator broadcasts the full batch
_MODE_LOCAL = 2    # descriptor only; every host feeds its own shard


class StepTimeout(RuntimeError):
    """A lockstep step did not complete within step_timeout_s — the
    liveness signal for a dead peer host (SURVEY.md §6.3: collectives
    block on a missing participant, so fail-fast needs a watchdog)."""


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

    def __init__(self, graph, params, mesh=None,
                 step_timeout_s: float | None = None):
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
        self.step_timeout_s = step_timeout_s
        self._seq = 0

    @property
    def local_batch(self) -> int:
        return self.global_batch // self.process_count

    # ---- lockstep protocol -------------------------------------------------
    def _bcast(self, value):
        from jax.experimental import multihost_utils
        return multihost_utils.broadcast_one_to_all(value)

    def _run_sharded(self, local: np.ndarray, gather: bool):
        import jax
        from jax.experimental import multihost_utils
        sharding = self.engine._in_sh.get(self.input_name)
        if sharding is None:
            sharding = self.mesh_cfg.named(
                self.mesh_cfg.dp_axis, *([None] * (len(self.input_shape) - 1)))
        garr = jax.make_array_from_process_local_data(sharding, local)
        out = self.engine(**{self.input_name: garr})
        leaf = jax.tree_util.tree_leaves(out)[0]
        if gather:
            return np.asarray(multihost_utils.process_allgather(
                leaf, tiled=True))
        return self._local_out(leaf)

    @staticmethod
    def _local_out(garr) -> np.ndarray:
        """This host's output rows, assembled from addressable shards
        (replicated outputs yield the single full copy)."""
        segs = {}
        for s in garr.addressable_shards:
            start = s.index[0].start or 0
            segs.setdefault(start, np.asarray(s.data))
        return np.concatenate([segs[k] for k in sorted(segs)], axis=0)

    def _step_inner(self, batch_np, local_rows, gather: bool):
        mode = _MODE_LOCAL if local_rows is not None else _MODE_GLOBAL
        desc = np.array([self._seq, mode, int(gather)], np.int64)
        if self.is_coordinator and mode == _MODE_GLOBAL and batch_np is None:
            raise ValueError("coordinator must supply batch_np or local_rows")
        desc = self._bcast(desc)
        if desc[1] == _STOP:
            return None
        # the coordinator's descriptor is authoritative (broadcast returns
        # process 0's value): mode/gather must agree on every host
        mode, gather = int(desc[1]), bool(desc[2])
        self._seq += 1
        if mode == _MODE_LOCAL:
            local = np.ascontiguousarray(local_rows, self.input_dtype)
            if local.shape[0] != self.local_batch:
                raise ValueError(f"local_rows batch {local.shape[0]} != "
                                 f"global/{self.process_count} = "
                                 f"{self.local_batch}")
        else:
            if self.is_coordinator:
                payload = np.ascontiguousarray(batch_np, self.input_dtype)
            else:
                payload = np.zeros(self.input_shape, self.input_dtype)
            payload = np.asarray(self._bcast(payload))
            lo, hi = local_shard_bounds(self.global_batch, self.process_index,
                                        self.process_count)
            local = payload[lo:hi]
        return self._run_sharded(local, gather)

    def step(self, batch_np: np.ndarray | None = None, *,
             local_rows: np.ndarray | None = None,
             gather: bool = True) -> np.ndarray | None:
        """One lockstep step.

        Coordinator-fed: pass ``batch_np`` (global batch; broadcast to all
        hosts; every host returns the full gathered output).
        Shard-local: pass ``local_rows`` (this host's rows only; no batch
        broadcast; with gather=False each host returns only its own output
        rows — the scaling configuration).

        With ``step_timeout_s`` set, a step blocked on a dead peer raises
        StepTimeout instead of hanging the serving loop (the watchdog
        thread is abandoned — recovery is process restart + artifact
        reload, runtime/distributed.py's failure model).
        """
        if self.step_timeout_s is None:
            return self._step_inner(batch_np, local_rows, gather)
        import threading
        result: list = []
        err: list = []

        def run():
            try:
                result.append(self._step_inner(batch_np, local_rows, gather))
            except BaseException as e:  # noqa: BLE001 — relayed below
                err.append(e)

        th = threading.Thread(target=run, daemon=True)
        th.start()
        th.join(self.step_timeout_s)
        if th.is_alive():
            raise StepTimeout(
                f"lockstep step {self._seq} stuck > {self.step_timeout_s}s "
                "— peer host presumed dead; restart + rejoin required")
        if err:
            raise err[0]
        return result[0]

    def shutdown(self):
        """Coordinator: release workers from worker_loop()."""
        if self.is_coordinator:
            self._bcast(np.array([self._seq, _STOP, 0], np.int64))

    def worker_loop(self, max_steps: int | None = None,
                    feed: "Callable[[int, int], np.ndarray] | None" = None):
        """Non-coordinator hosts: follow coordinator steps until shutdown.

        ``feed(seq, n_rows)`` supplies this host's shard for shard-local
        steps (per-host front end); defaults to zeros when absent.
        """
        steps = 0
        while max_steps is None or steps < max_steps:
            desc = self._bcast(np.array([0, 0, 0], np.int64))
            if desc[1] == _STOP:
                return steps
            gather = bool(desc[2])
            self._seq += 1
            if desc[1] == _MODE_LOCAL:
                n = self.local_batch
                local = (feed(int(desc[0]), n) if feed is not None
                         else np.zeros((n,) + self.input_shape[1:],
                                       self.input_dtype))
                self._run_sharded(
                    np.ascontiguousarray(local, self.input_dtype), gather)
            else:
                payload = np.asarray(self._bcast(
                    np.zeros(self.input_shape, self.input_dtype)))
                lo, hi = local_shard_bounds(
                    self.global_batch, self.process_index, self.process_count)
                self._run_sharded(payload[lo:hi], gather)
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
    def measure_throughput(self, n_steps: int = 8,
                           shard_local: bool = False) -> float:
        """Lockstep steps/s -> img/s (coordinator drives; all hosts must
        call this together: coordinator -> measure, workers ->
        worker_loop(n_steps + 1)). ``shard_local=True`` measures the
        descriptor-only data plane (no batch broadcast, no output gather) —
        the configuration the scaling gate is about."""
        if shard_local:
            x = np.zeros((self.local_batch,) + self.input_shape[1:],
                         self.input_dtype)
            kw = {"local_rows": x, "gather": False}
            args = ()
        else:
            args = (np.zeros(self.input_shape, self.input_dtype),)
            kw = {}
        self.step(*args, **kw)  # warm
        t0 = time.perf_counter()
        for _ in range(n_steps):
            self.step(*args, **kw)
        dt = time.perf_counter() - t0
        return self.global_batch * n_steps / dt
