"""Pipeline parallelism (`parallel/pp.py`): GPipe over stacked identical
blocks via shard_map + ppermute.  The pipelined result must EQUAL the
sequential composition (exactly for M=n on this CPU mesh; fp-noise when the
microbatch count changes the reduction grouping), it must compose with data
parallelism on a dp x pp mesh, and the MSCAN integration
(`MSCAN.enable_pipeline`) must match the scan-over-blocks forward.

The reference has no pipeline path (its scaling is 1-GPU-per-process DDP,
SURVEY.md §2.8) — this is TPU-native capability beyond it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from convnet_approximater_tpu.parallel import (
    MODEL_AXIS,
    make_mesh,
    pipeline_blocks,
    stack_shardings,
)


def _mlp_stack(L=8, D=16, seed=0):
    rs = np.random.RandomState(seed)
    return {
        "w": jnp.asarray(rs.randn(L, D, D).astype(np.float32) * 0.2),
        "b": jnp.asarray(rs.randn(L, D).astype(np.float32) * 0.1),
    }


def _block(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])


def _sequential(p_stack, x):
    return lax.scan(lambda h, p: (_block(p, h), None), x, p_stack)[0]


def test_pipeline_matches_sequential():
    p_stack = _mlp_stack()
    x = jnp.asarray(np.random.RandomState(1).randn(8, 16).astype(np.float32))
    seq = _sequential(p_stack, x)
    mesh = make_mesh(data=2, model=4)
    out = pipeline_blocks(_block, p_stack, x, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), rtol=1e-6)


def test_pipeline_more_microbatches_than_stages():
    p_stack = _mlp_stack()
    x = jnp.asarray(np.random.RandomState(2).randn(8, 16).astype(np.float32))
    seq = _sequential(p_stack, x)
    mesh = make_mesh(data=2, model=4)
    out = pipeline_blocks(_block, p_stack, x, mesh, num_microbatches=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), rtol=1e-5, atol=1e-6)


def test_pipeline_full_depth_mesh():
    p_stack = _mlp_stack()
    x = jnp.asarray(np.random.RandomState(3).randn(6, 16).astype(np.float32))
    seq = _sequential(p_stack, x)
    mesh = make_mesh(data=1, model=8)
    out = pipeline_blocks(_block, p_stack, x, mesh, num_microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), rtol=1e-6)


def test_pipeline_composes_with_dp_sharded_batch():
    """dp x pp: batch sharded over 'data', block stack over 'model' — the
    shard_map is manual only over the pipeline axis, XLA handles dp."""
    p_stack = _mlp_stack()
    x = jnp.asarray(np.random.RandomState(4).randn(8, 16).astype(np.float32))
    seq = _sequential(p_stack, x)
    mesh = make_mesh(data=4, model=2)
    xd = jax.device_put(x, NamedSharding(mesh, P("data")))
    pd = jax.device_put(p_stack, stack_shardings(p_stack, mesh))

    @jax.jit
    def run(p, x):
        return pipeline_blocks(_block, p, x, mesh)

    out = run(pd, xd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), rtol=1e-6)


def test_pipeline_validation_errors():
    p_stack = _mlp_stack(L=6)
    x = jnp.ones((8, 16), jnp.float32)
    mesh = make_mesh(data=2, model=4)
    with pytest.raises(ValueError, match="don't split"):
        pipeline_blocks(_block, p_stack, x, mesh)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_blocks(_block, _mlp_stack(L=8), jnp.ones((6, 16)), mesh)


def test_mscan_pipeline_matches_scan_forward():
    """A tiny MSCAN whose stage-3 has 4 identical blocks: the pipelined
    forward over a pp=4 axis must equal the scan-over-blocks forward."""
    from convnet_approximater_tpu.models import MSCAN_Classifier

    model = MSCAN_Classifier(
        num_channels=(8, 16, 24, 32), num_blocks=(1, 1, 4, 2),
        exp_ratios=(2, 2, 2, 2), num_classes=16,
    )
    variables = {"params": model.init(jax.random.key(0)),
                 "state": model.init_state()}
    x = jnp.asarray(np.random.RandomState(5).randn(8, 32, 32, 3).astype(np.float32))

    def fwd(params, state, x):
        y, _, _ = model.apply(params, x, state=state, training=False)
        return y

    y_scan = jax.jit(fwd)(variables["params"], variables["state"], x)

    mesh = make_mesh(data=2, model=4)
    model.backbone.enable_pipeline(mesh)  # stage 3 (4 blocks) pipelines;
    # stage 4 (2 blocks) doesn't divide 4 -> falls back to the scan
    y_pp = jax.jit(fwd)(variables["params"], variables["state"], x)
    model.backbone.enable_pipeline(None)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_scan),
                               rtol=2e-5, atol=2e-6)


def _tiny_pp_model():
    from convnet_approximater_tpu.models import MSCAN_Classifier

    model = MSCAN_Classifier(
        num_channels=(8, 16, 24, 32), num_blocks=(1, 1, 4, 2),
        exp_ratios=(2, 2, 2, 2), num_classes=16,
    )
    variables = {"params": model.init(jax.random.key(0)),
                 "state": model.init_state()}
    return model, variables


def test_mscan_pipeline_train_step_matches_scan():
    """Training THROUGH the pipeline: at num_microbatches=1 the loss, grads,
    and updated BN state must equal the scan-over-blocks train step (full
    batch flows as one microbatch, so even batch-stat semantics coincide)."""
    from convnet_approximater_tpu.nn.module import Ctx, _merge_state

    model, variables = _tiny_pp_model()
    x = jnp.asarray(np.random.RandomState(6).randn(8, 32, 32, 3).astype(np.float32))
    labels = jnp.asarray(np.arange(8) % 16)

    def loss_fn(params, state, rng):
        ctx = Ctx(training=True, rng=rng, state=state)
        logits = model(params, x, ctx)
        new_state = _merge_state(state, ctx.state_out)
        one_hot = jax.nn.one_hot(labels, logits.shape[-1])
        loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one_hot, axis=-1))
        return loss, new_state

    rng = jax.random.key(7)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (l_ref, s_ref), g_ref = grad_fn(variables["params"], variables["state"], rng)

    mesh = make_mesh(data=2, model=4)
    model.backbone.enable_pipeline(mesh, num_microbatches=1)
    grad_fn_pp = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (l_pp, s_pp), g_pp = grad_fn_pp(variables["params"], variables["state"], rng)
    model.backbone.enable_pipeline(None)

    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-5)
    for (ka, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_pp),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5, err_msg=str(ka))
    for (ka, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(s_ref),
        jax.tree_util.tree_leaves_with_path(s_pp),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6, err_msg=str(ka))


def test_mscan_pipeline_train_step_microbatched():
    """M=4 GPipe training step: runs, finite loss, BN running stats move."""
    from convnet_approximater_tpu.nn.module import Ctx, _merge_state

    model, variables = _tiny_pp_model()
    x = jnp.asarray(np.random.RandomState(8).randn(8, 32, 32, 3).astype(np.float32))
    mesh = make_mesh(data=2, model=4)
    model.backbone.enable_pipeline(mesh, num_microbatches=4)

    def loss_fn(params, state, rng):
        ctx = Ctx(training=True, rng=rng, state=state)
        logits = model(params, x, ctx)
        return jnp.mean(logits ** 2), _merge_state(state, ctx.state_out)

    (loss, new_state), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(variables["params"], variables["state"], jax.random.key(9))
    model.backbone.enable_pipeline(None)
    assert np.isfinite(float(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.all(jnp.isfinite(g)))
    # some BN state in the pipelined stage must have been updated
    before = jax.tree_util.tree_leaves(variables["state"])
    after = jax.tree_util.tree_leaves(new_state)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )


def test_segnext_pipeline_matches_scan():
    """SegNeXt shares the MSCAN backbone, so `backbone.enable_pipeline`
    pipelines its stages identically (eval parity vs the scan forward)."""
    from convnet_approximater_tpu.segmentation import SegNeXt

    model = SegNeXt(
        num_channels=(8, 16, 24, 32), num_blocks=(1, 1, 4, 2),
        exp_ratios=(2, 2, 2, 2), num_classes=7,
        ham_channels=16, ham_rank=4, ham_iters=2,
    )
    variables = {"params": model.init(jax.random.key(0)),
                 "state": model.init_state()}
    x = jnp.asarray(np.random.RandomState(9).randn(8, 32, 32, 3).astype(np.float32))

    def fwd(params, state, x):
        y, _, _ = model.apply(params, x, state=state, training=False)
        return y

    y_scan = jax.jit(fwd)(variables["params"], variables["state"], x)
    model.backbone.enable_pipeline(make_mesh(data=2, model=4))
    y_pp = jax.jit(fwd)(variables["params"], variables["state"], x)
    model.backbone.enable_pipeline(None)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_scan),
                               rtol=2e-5, atol=2e-6)


def test_class_inference_pipeline_wiring():
    """`ClassInference(pipeline_parallel=n)` enables the backbone pipeline on
    pipeline-capable models and warns-and-ignores on others (TinyNet)."""
    from convnet_approximater_tpu.models import MSCAN_Classifier
    from convnet_approximater_tpu.runner.class_inference import ClassInference

    ci = ClassInference.__new__(ClassInference)  # skip cfg-bound __init__
    ci.pipeline_parallel = 2
    model = MSCAN_Classifier(
        num_channels=(8, 16, 24, 32), num_blocks=(1, 1, 2, 1),
        exp_ratios=(2, 2, 2, 2), num_classes=16,
    )
    ci._maybe_pipeline(model)
    assert model.backbone._pipeline is not None
    mesh, axis, M = model.backbone._pipeline
    assert mesh.shape[axis] == 2 and M is None
    model.backbone.enable_pipeline(None)

    class NoBackbone:
        pass

    ci._maybe_pipeline(NoBackbone())  # warns, no raise

    # ConvNeXt carries the stage engine on the model itself
    from convnet_approximater_tpu.models import ConvNeXt

    cm = ConvNeXt(depths=(1, 1, 2, 1), dims=(8, 16, 24, 32), num_classes=16)
    ci._maybe_pipeline(cm)
    assert cm._pipeline is not None and cm._pipeline[0].shape["model"] == 2
    cm.enable_pipeline(None)

    ci.pipeline_parallel = 3  # doesn't divide the 8 CPU devices
    with pytest.raises(ValueError, match="divide"):
        ci._maybe_pipeline(model)


def test_convnext_pipeline_matches_scan_forward():
    """ConvNeXt shares the stage engine (models/stage_exec.py): a custom
    depths=(1,1,4,2) ConvNeXt pipelines its 4-block stage over pp=4 and
    must equal the scan-over-blocks forward."""
    from convnet_approximater_tpu.models import ConvNeXt

    model = ConvNeXt(depths=(1, 1, 4, 2), dims=(8, 16, 24, 32),
                     num_classes=16, drop_path_rate=0.1)
    params = model.init(jax.random.key(0))
    x = jnp.asarray(np.random.RandomState(5).randn(8, 32, 32, 3).astype(np.float32))

    def fwd(params, x):
        y, _, _ = model.apply(params, x, training=False)
        return y

    y_scan = jax.jit(fwd)(params, x)
    mesh = make_mesh(data=2, model=4)
    model.enable_pipeline(mesh)  # stage 3 (4 blocks) pipelines; others fall back
    y_pp = jax.jit(fwd)(params, x)
    model.enable_pipeline(None)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_scan),
                               rtol=2e-5, atol=2e-6)


def test_convnext_pipeline_train_grads_match_scan():
    """Grads THROUGH the pipelined ConvNeXt stage (M=1) equal the scan's."""
    from convnet_approximater_tpu.models import ConvNeXt

    model = ConvNeXt(depths=(1, 1, 4, 1), dims=(8, 16, 24, 32),
                     num_classes=16)
    params = model.init(jax.random.key(0))
    x = jnp.asarray(np.random.RandomState(6).randn(8, 32, 32, 3).astype(np.float32))

    def loss(p):
        y, _, _ = model.apply(p, x, training=False)
        return jnp.sum(y ** 2)

    g_scan = jax.jit(jax.grad(loss))(params)
    mesh = make_mesh(data=2, model=4)
    model.enable_pipeline(mesh, num_microbatches=1)
    g_pp = jax.jit(jax.grad(loss))(params)
    model.enable_pipeline(None)
    flat1 = jax.tree_util.tree_leaves(g_scan)
    flat2 = jax.tree_util.tree_leaves(g_pp)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)
