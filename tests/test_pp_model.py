"""Whole-model (heterogeneous) pipeline partitioning tests
(parallel/pp_model.py, VERDICT r3 #2): the entire MSCAN — stem,
downsamples, blocks, norms, head — partitioned into n cost-balanced
stages with output parity vs the plain forward, on the 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnet_approximater_tpu.models import MSCAN_Classifier
from convnet_approximater_tpu.parallel import (
    build_model_pipeline,
    make_mesh,
    partition_units,
)


def _tiny(num_blocks=(1, 1, 2, 1)):
    model = MSCAN_Classifier(
        num_channels=(8, 16, 24, 32), num_blocks=num_blocks,
        exp_ratios=(2, 2, 2, 2), num_classes=16)
    variables = {"params": model.init(jax.random.key(0)),
                 "state": model.init_state()}
    return model, variables


def test_partition_units_optimal_contiguous():
    # DP must find the optimal contiguous split, not a greedy one
    costs = [9, 1, 1, 1, 8, 1]
    groups = partition_units(costs, 2)
    assert [i for g in groups for i in g] == list(range(6))  # contiguous
    assert max(sum(costs[i] for i in g) for g in groups) == 11  # optimum
    groups3 = partition_units(costs, 3)
    assert max(sum(costs[i] for i in g) for g in groups3) == 9
    with pytest.raises(ValueError):
        partition_units([1.0], 2)


def test_unit_flops_probe_failure_warns_nan():
    """_unit_flops itself: a unit that cannot compile warns (names the
    unit) and returns NaN rather than a silent 0.0."""
    import warnings

    from convnet_approximater_tpu.parallel import pp_model

    def bad_fn(p, s, h):
        raise RuntimeError("boom")

    unit = pp_model.Unit("stem", bad_fn, {}, {})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = pp_model._unit_flops(unit, (2, 8, 8, 3))
    assert np.isnan(out)
    assert any("'stem'" in str(x.message) for x in w)


def test_failed_flop_probe_imputed_not_zeroed(monkeypatch):
    """A unit whose FLOP probe fails (backend without cost_analysis, relay
    hiccup) must warn and be imputed from the measured mean — a silent 0.0
    would degenerate the balance into a one-stage pile-up."""
    import warnings

    from convnet_approximater_tpu.parallel import pp_model

    model, variables = _tiny()
    mesh = make_mesh(data=4, model=2)
    x_shape = (8, 32, 32, 3)

    real = pp_model._unit_flops
    broken = {}

    def flaky(unit, h_shape, dtype=jnp.float32):
        if not broken:  # fail exactly the first (stem) probe
            broken[unit.name] = True
            raise RuntimeError("simulated relay hiccup")
        return real(unit, h_shape, dtype)

    def probe(unit, h_shape, dtype=jnp.float32):
        try:
            return flaky(unit, h_shape, dtype)
        except Exception as e:
            warnings.warn(f"pipeline FLOP probe failed for unit "
                          f"'{unit.name}' ({e}); imputed")
            return float("nan")

    monkeypatch.setattr(pp_model, "_unit_flops", probe)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        apply_fn, report = build_model_pipeline(
            model, variables, x_shape, mesh, num_microbatches=4)
    assert any("FLOP probe failed" in str(x.message) for x in w)
    # both stages must still carry real work (no 0%/100% pile-up) and the
    # shares must be finite
    shares = [r["share"] for r in report]
    assert all(np.isfinite(s) and s > 0.0 for s in shares)
    x = jax.random.normal(jax.random.key(3), (8, 32, 32, 3))
    y_ref, _, _ = model.apply(variables["params"], x,
                              state=variables["state"], training=False)
    y_pp = jax.jit(apply_fn)(variables, x)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)


def test_pipeline_units_compose_to_forward():
    """The sequential composition of pipeline_units IS the model forward."""
    model, variables = _tiny()
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    y_ref, _, _ = model.apply(variables["params"], x,
                              state=variables["state"], training=False)
    h = x
    for unit in model.pipeline_units(variables):
        h = unit.fn(unit.params, unit.state, h)
    np.testing.assert_allclose(np.asarray(h), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_stages", [2, 4])
def test_model_pipeline_parity(n_stages):
    """2- and 4-stage whole-model pipelines reproduce the plain forward."""
    model, variables = _tiny()
    mesh = make_mesh(data=8 // n_stages, model=n_stages)
    x = jax.random.normal(jax.random.key(2), (8, 32, 32, 3))
    y_ref, _, _ = model.apply(variables["params"], x,
                              state=variables["state"], training=False)

    apply_fn, report = build_model_pipeline(
        model, variables, x.shape, mesh, num_microbatches=4)
    assert len(report) == n_stages
    assert abs(sum(r["share"] for r in report) - 1.0) < 1e-6
    y_pp = jax.jit(apply_fn)(variables, x)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)


def test_model_pipeline_differentiable():
    """jax.grad through the pipeline == grad of the plain forward (the
    ppermute rotation's transpose is the inverse rotation)."""
    model, variables = _tiny(num_blocks=(1, 1, 1, 1))
    mesh = make_mesh(data=4, model=2)
    x = jax.random.normal(jax.random.key(3), (4, 32, 32, 3))
    apply_fn, _ = build_model_pipeline(
        model, variables, x.shape, mesh, num_microbatches=2)

    def loss_pp(v):
        return jnp.sum(apply_fn(v, x) ** 2)

    def loss_ref(v):
        y, _, _ = model.apply(v["params"], x, state=v["state"],
                              training=False)
        return jnp.sum(y ** 2)

    g_pp = jax.grad(loss_pp)(variables)
    g_ref = jax.grad(loss_ref)(variables)
    flat_pp = jax.tree_util.tree_leaves(g_pp["params"])
    flat_ref = jax.tree_util.tree_leaves(g_ref["params"])
    assert len(flat_pp) == len(flat_ref)
    for a, b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


@pytest.mark.parametrize("family", ["convnext", "resnet"])
def test_model_pipeline_other_families(family):
    """ConvNeXt and ResNet whole-model pipelines reproduce their plain
    forwards (2 stages on the 8-device mesh)."""
    if family == "convnext":
        from convnet_approximater_tpu.models import ConvNeXt

        model = ConvNeXt(num_classes=8, depths=(1, 1, 1, 1),
                         dims=(8, 12, 16, 24))
    else:
        from convnet_approximater_tpu.models import ResNet

        model = ResNet(depth=18, num_classes=8)
    variables = {"params": model.init(jax.random.key(0)),
                 "state": model.init_state()}
    mesh = make_mesh(data=4, model=2)
    x = jax.random.normal(jax.random.key(1), (4, 32, 32, 3))
    y_ref, _, _ = model.apply(variables["params"], x,
                              state=variables["state"], training=False)
    apply_fn, report = build_model_pipeline(
        model, variables, x.shape, mesh, num_microbatches=2)
    assert len(report) == 2
    y_pp = jax.jit(apply_fn)(variables, x)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)


def test_class_inference_whole_model_pipeline(tmp_path):
    """ClassInference(pipeline_mode='whole') times the whole-model
    pipeline forward (per-stage FLOP shares logged) end to end."""
    from convnet_approximater_tpu.runner import ClassInference, Runner
    from convnet_approximater_tpu.utils import init_cfg, update_cfg

    p = tmp_path / "cfg.py"
    p.write_text("""
model = dict(type="MSCAN_Classifier", num_channels=(8, 16, 24, 32),
             num_blocks=(1, 1, 1, 1), exp_ratios=(2, 2, 2, 2), num_classes=8)
app = dict(type="MscaRep", decomp=1, fix=True)
filters = []
hooks = []
""")
    init_cfg(str(p))
    update_cfg(work_dir=str(tmp_path / "work"), config_name="m", seed=0)
    runner = Runner()
    runner.run()
    ci = ClassInference(checkpoint=runner.output_path, batch_size=8,
                        input_size=(32, 32, 3), pipeline_parallel=2,
                        pipeline_mode="whole")
    ci.run()  # original + approximated, each through the 2-stage pipeline
