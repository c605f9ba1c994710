"""Multi-host serving sim: REAL OS processes over loopback CPU devices
(SURVEY.md §5.4; VERDICT r1 item 3).

Spawns 2 processes × 2 virtual CPU devices each (a 4-device global mesh
spanning "hosts"), runs the lockstep MultiHostEngine protocol — descriptor
broadcast, per-host shard assembly, sharded quantized forward, output
allgather — and asserts the multi-host outputs match a single-process
engine bit-exactly.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
WORKER = os.path.join(os.path.dirname(__file__), "mh_worker.py")
KILL_WORKER = os.path.join(os.path.dirname(__file__), "mh_kill_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(pid: int, nproc: int, port: int, outdir: str):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port), outdir],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def test_two_process_lockstep_parity(tmp_path):
    port = _free_port()
    procs = [_spawn(i, 2, port, str(tmp_path)) for i in range(2)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        logs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    res = np.load(tmp_path / "result.npz")
    stats = json.loads((tmp_path / "stats.json").read_text())
    assert stats["devices"] == 4, "expected a 4-device global mesh"
    assert stats["img_s"] > 0

    # single-process reference on the same deterministic artifact + inputs
    from __graft_entry__ import _quantized_resnet
    from tf2_tpu.runtime.engine import Engine

    art = _quantized_resnet(batch=8, image=32, depths=(1, 1, 1, 1),
                            classes=16)
    eng = Engine(art.graph, art.params)
    rng = np.random.default_rng(7)
    for key in ("out0", "out1"):
        batch = rng.standard_normal((8,) + art.graph.inputs["image"].shape[1:]
                                    ).astype(np.float32)
        expected = np.asarray(eng.run(image=batch))
        got = res[key]
        assert got.shape == expected.shape
        np.testing.assert_array_equal(
            got, expected,
            err_msg=f"{key}: multi-host output diverged from single-process")

    # shard-local data plane parity: hosts fed their own rows (no batch
    # broadcast); gathered output must still match the single-process ref
    local_batch = rng.standard_normal(
        (8,) + art.graph.inputs["image"].shape[1:]).astype(np.float32)
    expected = np.asarray(eng.run(image=local_batch))
    np.testing.assert_array_equal(
        res["out_local"], expected,
        err_msg="shard-local step diverged from single-process")
    # gather=False: coordinator keeps only its own rows (first half)
    per = stats["local_batch"]
    np.testing.assert_array_equal(
        res["out_own"], expected[:per],
        err_msg="gather=False local rows diverged")
    assert stats["img_s_local"] > 0


def test_host_kill_midstream_drains_batcher(tmp_path):
    """SURVEY.md §6.3 fault injection: one host process dies between
    lockstep steps; the coordinator's continuous batcher must surface the
    failure to every in-flight request (drain with errors) instead of
    wedging the serving loop."""
    port = _free_port()
    env_extra = {}
    procs = []
    for i in range(2):
        env = dict(os.environ, **env_extra)
        env.pop("XLA_FLAGS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, KILL_WORKER, str(i), "2", str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
        assert p.returncode == 0, f"process failed:\n{out[-3000:]}"

    verdict = json.loads((tmp_path / "verdict.json").read_text())
    assert verdict["batch1_ok"], "healthy step failed before injection"
    assert verdict["all_errored"], (
        "batcher wedged or returned results after host death: "
        f"{verdict['batch2_errors']}")
