"""LowRankExpV4: Tucker-2 factorization (1x1 C->r1, dense kxk core r1->r2,
1x1 r2->N — every factor pure MXU work)."""

import jax
import jax.numpy as jnp
import numpy as np

from convnet_approximater_tpu.core import LowRankExpV3, LowRankExpV4
from convnet_approximater_tpu.deploy import rematerialize_dense
from convnet_approximater_tpu.layers import LowRankExpConvV4
from convnet_approximater_tpu.nn import Conv2d, Ctx

KEY = jax.random.key(0)


def _solve(conv, params, ranks, **kw):
    app = LowRankExpV4(num_bases=(ranks,), **kw)
    sub, sp = app.initialize(conv, dict(params), KEY)
    app.optimize(sub, sp)
    return app.postprocess(sub, sp)


def test_v4_full_rank_exact():
    """(r1, r2) = (C, N) reproduces the conv exactly (orthonormal factors,
    lossless projection)."""
    conv = Conv2d(5, 9, 3, padding=1)
    params = conv.init(KEY)
    x = jax.random.normal(KEY, (2, 12, 12, 5))
    y0 = conv(params, x, Ctx(training=False))
    tgt, tp = _solve(conv, params, (5, 9))
    assert isinstance(tgt, LowRankExpConvV4)
    y = tgt(tp, x, Ctx(training=False))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0),
                               rtol=1e-4, atol=1e-5)


def test_v4_monotone_error_and_param_cut():
    conv = Conv2d(8, 16, 3, padding=1)
    params = conv.init(KEY)
    x = jax.random.normal(jax.random.fold_in(KEY, 1), (2, 10, 10, 8))
    y0 = conv(params, x, Ctx(training=False))
    errs = []
    for r in ((2, 4), (6, 12), (8, 16)):
        tgt, tp = _solve(conv, params, r)
        yr = tgt(tp, x, Ctx(training=False))
        errs.append(float(jnp.max(jnp.abs(yr - y0))))
    assert errs[2] < 1e-4
    assert errs[2] <= errs[1] <= errs[0]
    tgt, tp = _solve(conv, params, (4, 6))
    n_lr = sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(tp))
    n_dense = sum(int(np.prod(a.shape))
                  for a in jax.tree_util.tree_leaves(dict(params)))
    assert n_lr < n_dense  # 8*4 + 9*4*6 + 6*16 + 16 < 16*8*9 + 16


def test_v4_hooi_beats_or_matches_hosvd_init():
    """HOOI sweeps are monotone in retained core energy — more iters never
    lose Frobenius accuracy vs the plain HOSVD init."""
    conv = Conv2d(12, 20, 3, padding=1)
    params = conv.init(jax.random.fold_in(KEY, 5))

    def frob_err(iters):
        tgt, tp = _solve(conv, params, (4, 6), hooi_iters=iters)
        dm, dp = rematerialize_dense(tgt, tp)
        return float(jnp.linalg.norm(dp["weight"].astype(jnp.float32)
                                     - params["weight"]))

    assert frob_err(3) <= frob_err(0) + 1e-6


def test_v4_deeper_mac_cut_than_v3_at_same_error_budget():
    """The Tucker-2 point (r1, r2) = (C/2, N/2) costs FEWER MACs than V3 at
    r = N/2 on a square conv, with comparable structure (both all-dense)."""
    C, N, k, H = 32, 32, 3, 14
    # MACs per output pixel
    v3 = C * k * k * (N // 2) + (N // 2) * N
    v4 = C * (C // 2) + (C // 2) * (N // 2) * k * k + (N // 2) * N
    dense = C * k * k * N
    assert v4 < v3 < dense


def test_v4_stride_and_bias_carry():
    """Stride/padding live on the core conv (the 1x1s are stride-1); the
    source bias carries onto out_conv; bias-less sources carry zeros."""
    conv = Conv2d(4, 6, 5, stride=2, padding=2)
    params = conv.init(KEY)
    x = jax.random.normal(jax.random.fold_in(KEY, 2), (2, 16, 16, 4))
    y0 = conv(params, x, Ctx(training=False))
    tgt, tp = _solve(conv, params, (4, 6))
    y = tgt(tp, x, Ctx(training=False))
    assert y.shape == y0.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(tp["out_conv"]["bias"]),
                                  np.asarray(params["bias"]))
    assert tgt.in_conv.stride == (1, 1)
    assert tgt.core_conv.stride == (2, 2)

    nb = Conv2d(4, 6, 3, padding=1, bias=False)
    nbp = nb.init(KEY)
    tgt2, tp2 = _solve(nb, nbp, (3, 3))
    assert float(jnp.max(jnp.abs(tp2["out_conv"]["bias"]))) == 0.0


def test_v4_rematerialize_dense_exact():
    """never-lose can rebuild the exact dense kernel U_N G U_C^T."""
    conv = Conv2d(6, 10, 3, padding=1)
    params = conv.init(KEY)
    x = jax.random.normal(jax.random.fold_in(KEY, 3), (2, 9, 9, 6))
    tgt, tp = _solve(conv, params, (3, 4))
    y_lr = tgt(tp, x, Ctx(training=False))
    dm, dp = rematerialize_dense(tgt, tp)
    y_d = dm(dp, x, Ctx(training=False))
    np.testing.assert_allclose(np.asarray(y_d), np.asarray(y_lr),
                               rtol=1e-4, atol=1e-5)


def test_v4_auto_rank_energy():
    """energy=1.0 selects full per-mode ranks (exact); a rank-deficient
    kernel triggers a real cut."""
    conv = Conv2d(6, 8, 3, padding=1, bias=False)
    params = dict(conv.init(KEY))
    app = LowRankExpV4(energy=1.0)
    sub, sp = app.initialize(conv, params, KEY)
    assert sub.new_module.num_base == (6, 8)

    # rank-2 on both modes: W = sum of 2 separable channel terms
    w = jnp.zeros((3, 3, 6, 8))
    u1 = jnp.arange(6.0)
    v1 = jnp.ones((8,))
    u2 = jnp.ones((6,))
    v2 = jnp.arange(8.0)
    base = jax.random.normal(jax.random.fold_in(KEY, 4), (3, 3, 2))
    w = (base[..., 0, None, None] * u1[:, None] * v1[None, :]
         + base[..., 1, None, None] * u2[:, None] * v2[None, :])
    app2 = LowRankExpV4(energy=0.999)
    sub2, sp2 = app2.initialize(conv, {"weight": w}, KEY)
    r1, r2 = sub2.new_module.num_base
    assert r1 <= 2 and r2 <= 2


def test_v4_fold_batchnorm_through_out_conv():
    """FOLD_TAILS routes a trailing BN fold into out_conv (the bf16
    serving surface on Tucker-decomposed models)."""
    import convnet_approximater_tpu.nn as nn
    from convnet_approximater_tpu.deploy import fold_batchnorm

    m = nn.Sequential(Conv2d(4, 8, 3, padding=1), nn.BatchNorm2d(8))
    v = {"params": m.init(KEY), "state": m.init_state()}
    # give BN a non-trivial state so the fold is observable
    v["state"]["1"]["mean"] = jnp.linspace(-1, 1, 8)
    v["state"]["1"]["var"] = jnp.linspace(0.5, 2.0, 8)
    tgt, tp = _solve(m[0], dict(v["params"]["0"]), (4, 8))
    m.set_submodule("0", tgt)
    v["params"]["0"] = tp
    x = jax.random.normal(jax.random.fold_in(KEY, 6), (2, 10, 10, 4))
    y_ref, _, _ = m.apply(v["params"], x, state=v["state"], training=False)
    n = fold_batchnorm(m, v)
    assert n == 1
    y, _, _ = m.apply(v["params"], x, state=v["state"], training=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_v4_pipeline_config(tmp_path):
    """Config-driven V4 through the full Runner on AlexNet's conv stack."""
    from convnet_approximater_tpu.runner import Runner
    from convnet_approximater_tpu.utils import init_cfg, update_cfg

    cfg_text = """
model = dict(type="AlexNet", num_classes=10)
app = dict(type="LowRankExpV4", num_bases=((32, 32), (48, 48)))
filters = [dict(type="SimpleConvFilter"),
           dict(type="IndicesFilter", indices=(2, 3))]
hooks = []
"""
    p = tmp_path / "v4.py"
    p.write_text(cfg_text)
    init_cfg(str(p))
    update_cfg(work_dir=str(tmp_path / "work"), config_name="v4", seed=0)
    runner = Runner()
    runner.run()
    assert runner.model.length_switchable == 2
    mods = [runner.model.get_switchable_module(i) for i in range(2)]
    assert all(isinstance(m, LowRankExpConvV4) for m in mods)
    assert [m.num_base for m in mods] == [(32, 32), (48, 48)]
    x = jax.random.normal(KEY, (2, 224, 224, 3))
    y = runner.model(runner.variables["params"], x, Ctx(training=False))
    assert y.shape == (2, 10) and bool(jnp.all(jnp.isfinite(y)))


def test_v4_finetune_reduces_l2_norm(tmp_path):
    """V4 works through the full L2Reconstruct recovery machinery: the
    teacher rebuild re-runs initialize() after rewind() (the rank cursor
    must reset), and training reduces the reconstruction norm."""
    from convnet_approximater_tpu.runner import Runner
    from convnet_approximater_tpu.utils import init_cfg, update_cfg

    cfg_text = """
model = dict(type="AlexNet", num_classes=4)
app = dict(type="LowRankExpV4", num_bases=((16, 24), (24, 16)))
filters = [dict(type="SimpleConvFilter"),
           dict(type="IndicesFilter", indices=(2, 3))]
hooks = [dict(type="L2Reconstruct", priority=50, asym=True, l2_weight=1.0,
    cls_weight=0.0,
    dataset_args=dict(batch_size=8),
    data_config=dict(image_size=(64, 64)),
    optim_args=dict(opt="adamw", lr=5e-3, weight_decay=0.0),
    sche_args=dict(epochs=3),
    other_args=dict(num_classes=4, max_steps_per_epoch=3, max_eval_batches=1,
                    log_interval=100, use_mesh=False),
)]
"""
    p = tmp_path / "v4_ft.py"
    p.write_text(cfg_text)
    init_cfg(str(p))
    update_cfg(work_dir=str(tmp_path / "work"), config_name="v4_ft", seed=0)
    runner = Runner(skip_post=True)
    runner.run()
    csv = open(str(tmp_path / "work" / "summary.csv")).read().strip().split("\n")
    header = csv[0].split(",")
    norm_idx = header.index("train_norm")
    norms = [float(r.split(",")[norm_idx]) for r in csv[1:]]
    assert norms[-1] < norms[0]


def test_v4_data_driven_beats_plain_on_correlated_inputs():
    """Channel-mode whitening minimizes the response error under the
    calibration channel moment; on inputs confined to a low-dim channel
    subspace it must beat the plain kernel-HOOI at the same ranks."""
    from convnet_approximater_tpu.hooks.calibration import (
        channel_second_moment)

    C, k, N = 8, 3, 16
    conv = Conv2d(C, N, k, padding=0, bias=False)
    params = conv.init(KEY)
    # inputs on a 2-dim channel subspace + small noise
    z = jax.random.normal(jax.random.fold_in(KEY, 7), (4, 12, 12, 2))
    mixmat = jax.random.normal(jax.random.fold_in(KEY, 8), (2, C))
    x = jnp.einsum("bhwz,zc->bhwc", z, mixmat)
    x = x + 0.01 * jax.random.normal(jax.random.fold_in(KEY, 9), x.shape)
    y0 = conv(params, x, Ctx(training=False))

    def response_err(app):
        sub, sp = app.initialize(conv, dict(params), KEY)
        app.optimize(sub, sp)
        tgt, tp = app.postprocess(sub, sp)
        y = tgt(tp, x, Ctx(training=False))
        return float(jnp.linalg.norm(y - y0))

    ranks = ((3, 8),)
    e_plain = response_err(LowRankExpV4(num_bases=ranks))
    app_dd = LowRankExpV4(num_bases=ranks, data_driven=True)
    app_dd.set_calibration(0, channel_second_moment(x))
    e_dd = response_err(app_dd)
    assert e_dd < e_plain, (e_dd, e_plain)


def test_v4_calibration_hook_plumbing(tmp_path):
    """CalibrationHook streams the 'channels' stat into a data-driven V4
    through the Runner pipeline (set_calibration per switchable index)."""
    from convnet_approximater_tpu.runner import Runner
    from convnet_approximater_tpu.utils import init_cfg, update_cfg

    cfg_text = """
model = dict(type="AlexNet", num_classes=4)
app = dict(type="LowRankExpV4", num_bases=((16, 16), (16, 16)),
           data_driven=True)
filters = [dict(type="SimpleConvFilter"),
           dict(type="IndicesFilter", indices=(2, 3))]
hooks = [dict(type="CalibrationHook", priority=45, num_batches=1,
              batch_size=2, image_size=(64, 64))]
"""
    p = tmp_path / "v4dd.py"
    p.write_text(cfg_text)
    init_cfg(str(p))
    update_cfg(work_dir=str(tmp_path / "work"), config_name="v4dd", seed=0)
    runner = Runner()
    runner.run()
    assert sorted(runner.app._xcov) == [0, 1]
    # channel moments: (C, C) per site (AlexNet convs 2-3 have C=64, 192)
    assert runner.app._xcov[0].shape == (64, 64)
    assert runner.app._xcov[1].shape == (192, 192)
