#!/usr/bin/env python
"""Multi-host scaling SIM (CPU loopback; SURVEY.md §5.4, VERDICT r1 item 3).

Runs the lockstep MultiHostEngine at nproc=1 and nproc=2 (2 virtual CPU
devices per "host") and records throughput + scaling efficiency to
MULTIHOST_SIM.json. This measures the PROTOCOL + sharding overhead on
loopback CPU — a lower bound sanity check, NOT the ≥85% 2-host v5e gate
(that needs real hardware; BASELINE.md §1). A sim number well below 1.0 is
expected: CPU "hosts" share cores and Gloo loopback is not ICI/DCN.

Usage: python bench/multihost_sim.py  (writes MULTIHOST_SIM.json)
"""
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
WORKER = os.path.join(REPO, "tests", "dist", "mh_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_sim(nproc: int) -> dict:
    port = _free_port()
    with tempfile.TemporaryDirectory() as td:
        procs = []
        for i in range(nproc):
            env = dict(os.environ)
            env.pop("XLA_FLAGS", None)
            env["JAX_PLATFORMS"] = "cpu"
            env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
            procs.append(subprocess.Popen(
                [sys.executable, WORKER, str(i), str(nproc), str(port), td],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True))
        for p in procs:
            out, _ = p.communicate(timeout=540)
            if p.returncode != 0:
                raise RuntimeError(f"worker failed:\n{out[-2000:]}")
        with open(os.path.join(td, "stats.json")) as f:
            return json.load(f)


def main():
    s1 = run_sim(1)
    s2 = run_sim(2)
    from tf2_tpu.serve.multihost import scaling_efficiency
    eff = scaling_efficiency(s1["img_s"], s2["img_s"], 2)
    eff_local = scaling_efficiency(s1["img_s_local"], s2["img_s_local"], 2)
    result = {
        "sim": "cpu-loopback 2 virtual devices/host, lockstep protocol",
        "img_s_1host": round(s1["img_s"], 2),
        "img_s_2host": round(s2["img_s"], 2),
        "scaling_efficiency_2host_sim": round(eff, 3),
        "img_s_1host_shard_local": round(s1["img_s_local"], 2),
        "img_s_2host_shard_local": round(s2["img_s_local"], 2),
        "scaling_efficiency_2host_shard_local_sim": round(eff_local, 3),
        "note": "protocol overhead sim only; the >=85% gate is for real "
                "2-host v5e (BASELINE.md §1). shard_local = descriptor-only "
                "broadcast, per-host feeds, no output gather (VERDICT r2 "
                "item 5's scaling configuration)",
    }
    out = os.path.join(REPO, "MULTIHOST_SIM.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
