"""Failure-detection / fault-injection tests (SURVEY.md §6.3): heartbeat
staleness, batcher drain on worker death, stateless artifact recovery."""
import threading
import time

import numpy as np
import pytest

from tf2_tpu.runtime.distributed import Heartbeat, initialize
from tf2_tpu.serve.batcher import ContinuousBatcher


def test_heartbeat_goes_stale():
    hb = Heartbeat(stale_after_s=0.05)
    assert hb.healthy()
    time.sleep(0.08)
    assert not hb.healthy()
    hb.beat()
    assert hb.healthy()


def test_initialize_single_process():
    info = initialize()
    assert info["process_count"] == 1
    assert info["local_devices"] >= 1


def test_batcher_survives_one_failing_batch():
    """Fault injection: the runner dies once mid-stream; queued requests in
    that batch get the exception, the NEXT batch succeeds (drain/requeue
    semantics: callers retry, the batcher itself must not wedge)."""
    state = {"n": 0}

    def flaky(batch):
        state["n"] += 1
        if state["n"] == 1:
            raise RuntimeError("injected worker death")
        return batch + 1

    b = ContinuousBatcher(flaky, batch_size=2, example_shape=(1,),
                          max_wait_s=0.001).start()
    f1 = b.submit(np.zeros((1,), np.float32))
    with pytest.raises(RuntimeError):
        f1.result(5)
    # engine "restarted" (stateless): next request must succeed
    f2 = b.submit(np.zeros((1,), np.float32))
    np.testing.assert_array_equal(f2.result(5), np.ones((1,)))
    b.stop(drain=False)


def test_artifact_reload_is_recovery(tmp_path):
    """Stateless recovery: kill the engine, reload the artifact, identical
    results (the artifact IS the checkpoint — SURVEY.md §6.4)."""
    import jax.numpy as jnp
    from tf2_tpu.graph import execute, init_params
    from tf2_tpu.models import get_model
    from tf2_tpu.transform import (QuantSpec, load_artifact, save_quantized,
                                   transform_model)
    import jax

    g = get_model("squeezenet_v1_1", batch=1, image=32, classes=10)
    params = init_params(g)
    batches = [{"image": jax.random.normal(jax.random.PRNGKey(0),
                                           g.inputs["image"].shape)}]
    art, _, _ = transform_model(g, params, batches, qspec=QuantSpec())
    save_quantized(str(tmp_path / "a"), art)
    x = jnp.ones(g.inputs["image"].shape, jnp.float32)
    y1 = np.asarray(execute(art.graph)(art.params, image=x))
    del art  # "crash"
    g2, p2 = load_artifact(str(tmp_path / "a"))
    y2 = np.asarray(execute(g2)(p2, image=x))
    np.testing.assert_array_equal(y1, y2)
