"""Fault-injection worker for the mid-stream host-kill test (SURVEY.md
§6.3's promised injection: one host dies mid-stream; the coordinator's
batcher must drain with errors, not wedge).

Usage: python mh_kill_worker.py <pid> <nproc> <port> <outdir>

Process 1 ("the victim") follows exactly ONE lockstep step and then exits
hard via os._exit — simulating a host crash between steps. The coordinator
(process 0) serves through a ContinuousBatcher with a step watchdog:
batch 1 must succeed, batch 2 must surface StepTimeout (or a transport
error) to its futures within the timeout, and the batcher must remain
non-wedged. The coordinator writes verdict.json for the spawning test.
"""
import json
import os
import sys

pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                            int(sys.argv[3]), sys.argv[4])

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from __graft_entry__ import _quantized_resnet  # noqa: E402
from tf2_tpu.parallel.mesh import make_mesh  # noqa: E402
from tf2_tpu.runtime.distributed import Heartbeat  # noqa: E402
from tf2_tpu.serve.multihost import MultiHostEngine, StepTimeout  # noqa: E402

GLOBAL_BATCH = 8

art = _quantized_resnet(batch=GLOBAL_BATCH, image=32, depths=(1, 1, 1, 1),
                        classes=16)
mh = MultiHostEngine(art.graph, art.params, mesh=make_mesh(tp=1),
                     step_timeout_s=30.0)

if mh.is_coordinator:
    hb = Heartbeat(stale_after_s=45.0)
    batcher = mh.make_batcher(max_wait_s=0.001)
    shape = mh.input_shape[1:]
    # batch 1: victim alive — must succeed
    futs1 = [batcher.submit(np.zeros(shape, np.float32))
             for _ in range(GLOBAL_BATCH)]
    ok1 = all(f.result(120) is not None for f in futs1)
    hb.beat()
    # victim exits after its single step; batch 2 must error, not hang
    futs2 = [batcher.submit(np.zeros(shape, np.float32))
             for _ in range(GLOBAL_BATCH)]
    errs = []
    for f in futs2:
        try:
            f.result(90)
            errs.append(None)
        except Exception as e:  # noqa: BLE001 — verdict records the type
            errs.append(type(e).__name__)
    batcher.stop(drain=False)
    verdict = {
        "batch1_ok": bool(ok1),
        "batch2_errors": errs,
        "all_errored": all(e is not None for e in errs),
        "timeout_seen": any(e == "StepTimeout" for e in errs),
        "healthy_after": hb.healthy(),
    }
    with open(os.path.join(outdir, "verdict.json"), "w") as f:
        json.dump(verdict, f)
    print(f"coordinator verdict: {verdict}", flush=True)
    # the victim is dead: exit without the shutdown broadcast (it would
    # block on the missing peer)
    os._exit(0)
else:
    mh.worker_loop(max_steps=1)
    print(f"victim {pid} exiting mid-stream", flush=True)
    os._exit(0)
