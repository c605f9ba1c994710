"""Per-process worker for the multi-host lockstep serving test.

Spawned (not collected) by tests/dist/test_multiprocess.py: each OS process
is one "host" with 2 virtual CPU devices, joined via jax.distributed over
loopback (SURVEY.md §5.4). Usage:

    python mh_worker.py <pid> <nproc> <port> <outdir>

Every process builds the SAME tiny quantized artifact (seed-deterministic —
the artifact is the cross-host contract), wraps it in a MultiHostEngine,
and the coordinator drives two data steps + a throughput measurement while
workers follow in lockstep. The coordinator writes outputs + stats to
<outdir>/result.npz for the spawning test to verify against a
single-process reference.
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
from tf2_tpu.serve.multihost import MultiHostEngine  # noqa: E402

GLOBAL_BATCH = 8

art = _quantized_resnet(batch=GLOBAL_BATCH, image=32, depths=(1, 1, 1, 1),
                        classes=16)
mh = MultiHostEngine(art.graph, art.params, mesh=make_mesh(tp=1))

rng = np.random.default_rng(7)
batches = [rng.standard_normal(mh.input_shape).astype(np.float32)
           for _ in range(2)]

if mh.is_coordinator:
    outs = [mh.step(b) for b in batches]
    img_s = mh.measure_throughput(n_steps=4)
    mh.shutdown()
    np.savez(os.path.join(outdir, "result.npz"), out0=outs[0], out1=outs[1])
    with open(os.path.join(outdir, "stats.json"), "w") as f:
        json.dump({"img_s": img_s, "nproc": nproc,
                   "global_batch": GLOBAL_BATCH,
                   "devices": jax.device_count()}, f)
    print(f"coordinator done: {img_s:.1f} img/s", flush=True)
else:
    steps = mh.worker_loop()
    print(f"worker {pid} done after {steps} steps", flush=True)
