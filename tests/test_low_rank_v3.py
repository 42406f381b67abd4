"""LowRankExpV3: channel-rank factorization (dense basis conv + 1x1 mix)."""

import jax
import jax.numpy as jnp
import numpy as np

from convnet_approximater_tpu.core import LowRankExpV3
from convnet_approximater_tpu.deploy import rematerialize_dense
from convnet_approximater_tpu.filters import IndicesFilter, SimpleConvFilter
from convnet_approximater_tpu.layers import LowRankExpConvV3
from convnet_approximater_tpu.nn import Conv2d, Ctx

KEY = jax.random.key(0)


def _solve(conv, params, r):
    app = LowRankExpV3(num_bases=(r,))
    sub, sp = app.initialize(conv, dict(params), KEY)
    app.optimize(sub, sp)
    return app.postprocess(sub, sp)


def test_v3_full_rank_exact():
    """r = min(N, C k^2) reproduces the conv exactly (SVD is lossless)."""
    conv = Conv2d(5, 9, 3, padding=1)
    params = conv.init(KEY)
    x = jax.random.normal(KEY, (2, 12, 12, 5))
    y0 = conv(params, x, Ctx(training=False))
    tgt, tp = _solve(conv, params, 9)
    assert isinstance(tgt, LowRankExpConvV3)
    y = tgt(tp, x, Ctx(training=False))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0),
                               rtol=1e-4, atol=1e-5)


def test_v3_monotone_error_and_param_cut():
    """Error shrinks monotonically with rank; low rank cuts params."""
    conv = Conv2d(8, 16, 3, padding=1)
    params = conv.init(KEY)
    x = jax.random.normal(jax.random.fold_in(KEY, 1), (2, 10, 10, 8))
    y0 = conv(params, x, Ctx(training=False))
    errs = []
    for r in (2, 8, 16):
        tgt, tp = _solve(conv, params, r)
        yr = tgt(tp, x, Ctx(training=False))
        errs.append(float(jnp.max(jnp.abs(yr - y0))))
    assert errs[2] < 1e-4
    assert errs[2] <= errs[1] <= errs[0]
    tgt, tp = _solve(conv, params, 4)
    n_lr = sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(tp))
    n_dense = sum(int(np.prod(a.shape))
                  for a in jax.tree_util.tree_leaves(dict(params)))
    assert n_lr < n_dense  # 8*9*4 + 4*16 + 16 < 16*8*9 + 16


def test_v3_stride_and_bias_carry():
    """Stride lives on the basis conv; the source bias carries onto the
    1x1 mix conv (zero for bias-less sources)."""
    conv = Conv2d(4, 6, 5, stride=2, padding=2)
    params = conv.init(KEY)
    x = jax.random.normal(jax.random.fold_in(KEY, 2), (2, 16, 16, 4))
    y0 = conv(params, x, Ctx(training=False))
    tgt, tp = _solve(conv, params, 6)
    y = tgt(tp, x, Ctx(training=False))
    assert y.shape == y0.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(tp["mix_conv"]["bias"]),
                                  np.asarray(params["bias"]))

    nb = Conv2d(4, 6, 3, padding=1, bias=False)
    nbp = nb.init(KEY)
    tgt2, tp2 = _solve(nb, nbp, 3)
    assert float(jnp.max(jnp.abs(tp2["mix_conv"]["bias"]))) == 0.0


def test_v3_rematerialize_dense_exact():
    """The never-lose arbiter can rebuild the exact dense kernel W = A.B."""
    conv = Conv2d(6, 10, 3, padding=1)
    params = conv.init(KEY)
    x = jax.random.normal(jax.random.fold_in(KEY, 3), (2, 9, 9, 6))
    tgt, tp = _solve(conv, params, 4)
    y_lr = tgt(tp, x, Ctx(training=False))
    dm, dp = rematerialize_dense(tgt, tp)
    y_d = dm(dp, x, Ctx(training=False))
    np.testing.assert_allclose(np.asarray(y_d), np.asarray(y_lr),
                               rtol=1e-5, atol=1e-6)


def test_v3_pipeline_config(tmp_path):
    """Config-driven V3 through the full Runner (registry name, cursor,
    checkpoint save) on AlexNet's conv stack."""
    from convnet_approximater_tpu.runner import Runner
    from convnet_approximater_tpu.utils import init_cfg, update_cfg

    cfg_text = """
model = dict(type="AlexNet", num_classes=10)
app = dict(type="LowRankExpV3", num_bases=(32, 48, 64, 48))
filters = [dict(type="SimpleConvFilter"),
           dict(type="IndicesFilter", indices=(2, 3, 4, 5))]
hooks = []
"""
    p = tmp_path / "v3.py"
    p.write_text(cfg_text)
    init_cfg(str(p))
    update_cfg(work_dir=str(tmp_path / "work"), config_name="v3", seed=0)
    runner = Runner()
    runner.run()
    assert runner.model.length_switchable == 4
    mods = [runner.model.get_switchable_module(i) for i in range(4)]
    assert all(isinstance(m, LowRankExpConvV3) for m in mods)
    assert [m.num_base for m in mods] == [32, 48, 64, 48]
    x = jax.random.normal(KEY, (2, 224, 224, 3))
    y = runner.model(runner.variables["params"], x, Ctx(training=False))
    assert y.shape == (2, 10) and bool(jnp.all(jnp.isfinite(y)))
    import os
    assert any(f.endswith(".ckpt.npz") for f in os.listdir(tmp_path / "work"))


def test_v3_data_driven_beats_plain_svd_on_correlated_inputs():
    """The whitened solve minimizes the RESPONSE error E||y - yhat||^2; on
    inputs confined to a low-dim subspace it must beat the plain kernel-SVD
    at the same rank."""
    from convnet_approximater_tpu.hooks.calibration import patch_second_moment

    C, k, N, r = 8, 3, 16, 3
    conv = Conv2d(C, N, k, padding=0, bias=False)
    params = conv.init(KEY)
    # inputs on a 2-dim channel subspace + small noise -> strongly
    # anisotropic patch covariance
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
        return float(jnp.mean((y - y0) ** 2))

    err_plain = response_err(LowRankExpV3(num_bases=(r,)))
    dd = LowRankExpV3(num_bases=(r,), data_driven=True)
    dd.set_calibration(0, patch_second_moment(x, k, k))
    err_dd = response_err(dd)
    assert err_dd < err_plain * 0.9, (err_dd, err_plain)


def test_v3_calibration_hook_plumbing(tmp_path):
    """CalibrationHook streams PATCH second moments (calibration_stat) into
    a data-driven V3 through the full Runner."""
    from convnet_approximater_tpu.runner import Runner
    from convnet_approximater_tpu.utils import init_cfg, update_cfg

    cfg_text = """
model = dict(type="TinyNetV3", num_classes=4)
app = dict(type="LowRankExpV3", num_bases=(4, 4), data_driven=True)
filters = [dict(type="SimpleConvFilter"), dict(type="IndicesFilter", indices=(2, 3))]
hooks = [dict(type="CalibrationHook", priority=30, num_batches=1,
              batch_size=4, image_size=(16, 16))]
"""
    import convnet_approximater_tpu.nn as nn
    from convnet_approximater_tpu.models import MODEL, SwitchableModel

    if "TinyNetV3" not in MODEL:
        @MODEL.register_module()
        class TinyNetV3(SwitchableModel):
            def __init__(self, num_classes=4, init_cfg=None):
                super().__init__(init_cfg=init_cfg)
                self.features = nn.Sequential(
                    nn.Conv2d(3, 8, 3, padding=1), nn.ReLU(),
                    nn.Conv2d(8, 12, 3, padding=1), nn.ReLU(),
                    nn.Conv2d(12, 12, 3, padding=1), nn.ReLU(),
                )
                self.head = nn.Linear(12, num_classes)

            def __call__(self, params, x, ctx):
                x = self.child("features", params, x, ctx)
                x = x.mean(axis=(1, 2))
                return self.child("head", params, x, ctx)

    p = tmp_path / "v3dd.py"
    p.write_text(cfg_text)
    init_cfg(str(p))
    update_cfg(work_dir=str(tmp_path / "work"), config_name="v3dd", seed=0)
    runner = Runner(skip_post=True)
    runner.run()
    app = runner.app
    assert sorted(app._xcov) == [0, 1]  # both switchables got moments
    assert app._xcov[0].shape == (8 * 9, 8 * 9)  # C*kh*kw for conv 2
    y = runner.model(runner.variables["params"],
                     jax.random.normal(KEY, (2, 16, 16, 3)),
                     Ctx(training=False))
    assert bool(jnp.all(jnp.isfinite(y)))


def test_v3_auto_rank_energy():
    """energy=tau picks the smallest rank retaining tau of the spectrum:
    tau=1.0 is exact full rank, smaller tau gives smaller ranks, and the
    picked rank really does retain >= tau energy."""
    conv = Conv2d(8, 16, 3, padding=1)
    params = conv.init(KEY)
    x = jax.random.normal(KEY, (2, 10, 10, 8))
    y0 = conv(params, x, Ctx(training=False))

    def run(energy):
        app = LowRankExpV3(energy=energy)
        sub, sp = app.initialize(conv, dict(params), KEY)
        app.optimize(sub, sp)
        return app.postprocess(sub, sp)

    tgt_full, tp_full = run(1.0)
    assert tgt_full.num_base == 16  # min(N, C k^2) = N here
    y = tgt_full(tp_full, x, Ctx(training=False))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0),
                               rtol=1e-4, atol=1e-5)

    tgt_lo, _ = run(0.5)
    tgt_hi, _ = run(0.9)
    assert tgt_lo.num_base <= tgt_hi.num_base <= 16
    assert tgt_lo.num_base >= 1

    # retained energy of the picked rank really is >= tau
    import numpy as onp
    W = onp.asarray(params["weight"]).transpose(3, 2, 0, 1).reshape(16, -1)
    s = onp.linalg.svd(W, compute_uv=False) ** 2
    cum = onp.cumsum(s) / onp.sum(s)
    assert cum[tgt_hi.num_base - 1] >= 0.9
    assert tgt_hi.num_base == 1 or cum[tgt_hi.num_base - 2] < 0.9  # smallest such r


def test_v1_auto_bases_energy():
    """LowRankExpV1 shares the auto-rank convention: energy=1.0 gives the
    full d^2 spectrum (exact at SVD init), smaller tau fewer bases."""
    from convnet_approximater_tpu.core import LowRankExpV1
    from convnet_approximater_tpu.layers import LowRankExpConvV1

    conv = Conv2d(4, 6, 5, padding=2)
    params = conv.init(KEY)
    x = jax.random.normal(KEY, (2, 12, 12, 4))
    y0 = conv(params, x, Ctx(training=False))

    def run(tau):
        app = LowRankExpV1(energy=tau, max_iter=0, lmda_length=1,
                           min_lmda=0, max_lmda=0, init_method="svd")
        sub, sp = app.initialize(conv, dict(params), KEY)
        app.optimize(sub, sp)
        return app.postprocess(sub, sp)

    tgt, tp = run(1.0)
    assert isinstance(tgt, LowRankExpConvV1)
    assert tgt.num_base == 24  # full spectrum: min(N*C, d^2) = 24
    y = tgt(tp, x, Ctx(training=False))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0),
                               rtol=1e-3, atol=1e-4)
    tgt_lo, _ = run(0.4)
    tgt_hi, _ = run(0.9)
    assert 1 <= tgt_lo.num_base <= tgt_hi.num_base <= 24
