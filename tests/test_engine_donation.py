"""Input-donation engine mode (runtime/engine.py donate_inputs) and the
quantize-time concat equalization (QuantSpec.equalize_concat)."""
import jax
import jax.numpy as jnp
import numpy as np

from tf2_tpu.graph import execute, init_params
from tf2_tpu.models import get_model
from tf2_tpu.runtime import Engine
from tf2_tpu.transform import QuantSpec, transform_model


def _art(batch=4):
    g = get_model("squeezenet_v1_1", batch=batch, image=32, classes=10)
    params = init_params(g, seed=0)
    calib = [{"image": jax.random.normal(jax.random.PRNGKey(7),
                                         g.inputs["image"].shape)}]
    art, fg, fp = transform_model(g, params, calib,
                                  qspec=QuantSpec(weight_bits=4))
    return art


def test_donated_engine_matches_nondonated():
    art = _art()
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(3),
                                     art.graph.inputs["image"].shape))
    ref = np.asarray(Engine(art.graph, art.params).run(image=x.copy()))
    eng = Engine(art.graph, art.params, donate_inputs=True)
    # fresh host batch each call — the serving pattern donation requires.
    # EXPECTED WARNING: jax reports "Some donated buffers were not
    # usable" — correct and documented (BASELINE.md §4.4): the f32 image
    # cannot alias the tiny logits output, so XLA aliasing is inert;
    # donation's value is client-side buffer lifecycle, not on-chip reuse.
    for _ in range(3):
        out = np.asarray(eng.run(image=x.copy()))
        np.testing.assert_array_equal(out, ref)


def test_equalize_concat_makes_pure_concats():
    g = get_model("googlenet", batch=2, image=64, classes=10)
    params = init_params(g, seed=0)
    calib = [{"image": jax.random.normal(jax.random.PRNGKey(7),
                                         g.inputs["image"].shape)}]
    art, fg, fp = transform_model(
        g, params, calib, qspec=QuantSpec(weight_bits=4,
                                          equalize_concat=True))
    qconcats = [n for n in art.graph.nodes if n.op == "qconcat"]
    assert qconcats, "googlenet must quantize its concats"
    for n in qconcats:
        # single-consumer branch producers are re-calibrated onto the
        # concat's scale -> every rescale is identity
        for si in n.attrs["in_scales"]:
            assert abs(si - n.attrs["out_scale"]) < 1e-12, (
                n.name, n.attrs["in_scales"], n.attrs["out_scale"])
    # and the quantized net still tracks its fp reference (tiny 64px
    # random-weight config: argmax is noise, direction is the signal;
    # the full-size agreement figure lives in ACCURACY.json)
    x = jax.random.normal(jax.random.PRNGKey(5), g.inputs["image"].shape)
    yf = np.asarray(jax.jit(execute(fg))(fp, image=x)).ravel()
    yq = np.asarray(jax.jit(execute(art.graph))(art.params, image=x)).ravel()
    cos = float(yf @ yq / (np.linalg.norm(yf) * np.linalg.norm(yq) + 1e-12))
    assert cos > 0.9, cos
