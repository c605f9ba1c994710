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

# Pin each simulated "host" to its own disjoint core: without this, the
# 1-host and 2-host runs share the same physical cores and the scaling
# measurement reads core contention, not protocol overhead (round 2's
# 0.388 "efficiency" was mostly this).
try:
    cores = sorted(os.sched_getaffinity(0))
    if nproc > 1 and len(cores) >= nproc:
        per = len(cores) // nproc
        mine = set(cores[pid * per:(pid + 1) * per])
        os.sched_setaffinity(0, mine)
    elif nproc == 1 and len(cores) > 1:
        # fair baseline: the single host gets ONE host's share (half the
        # cores when the 2-host run splits them), not the whole machine
        os.sched_setaffinity(0, set(cores[:max(1, len(cores) // 2)]))
except (AttributeError, OSError):
    pass  # non-Linux: unpinned sim, numbers are noisier

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
# shard-local plane: host p feeds rows [p*per, (p+1)*per) of a THIRD
# deterministic global batch — parity must hold vs the single-process ref
local_batch = rng.standard_normal(mh.input_shape).astype(np.float32)
lo, hi = (pid * mh.local_batch, (pid + 1) * mh.local_batch)


def feed(seq, n):
    return local_batch[lo:lo + n]


if mh.is_coordinator:
    outs = [mh.step(b) for b in batches]
    # shard-local step with gather: full output for the parity check
    out_local = mh.step(local_rows=local_batch[lo:hi])
    # shard-local without gather: coordinator keeps only its rows
    out_own = mh.step(local_rows=local_batch[lo:hi], gather=False)
    img_s = mh.measure_throughput(n_steps=4)
    img_s_local = mh.measure_throughput(n_steps=4, shard_local=True)
    mh.shutdown()
    np.savez(os.path.join(outdir, "result.npz"), out0=outs[0], out1=outs[1],
             out_local=out_local, out_own=out_own)
    with open(os.path.join(outdir, "stats.json"), "w") as f:
        json.dump({"img_s": img_s, "img_s_local": img_s_local,
                   "nproc": nproc, "global_batch": GLOBAL_BATCH,
                   "local_batch": mh.local_batch,
                   "devices": jax.device_count()}, f)
    print(f"coordinator done: {img_s:.1f} img/s bcast, "
          f"{img_s_local:.1f} img/s shard-local", flush=True)
else:
    steps = mh.worker_loop(feed=feed)
    print(f"worker {pid} done after {steps} steps", flush=True)
