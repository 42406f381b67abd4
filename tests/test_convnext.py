"""ConvNeXt family + DwSepRep (rank-r separable depthwise re-param)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnet_approximater_tpu.core import DwSepRep
from convnet_approximater_tpu.filters import DepthwiseConvFilter
from convnet_approximater_tpu.layers import CascadeConv, ParallelConv
from convnet_approximater_tpu.models import ConvNeXt
from convnet_approximater_tpu.nn import Conv2d, Ctx
from convnet_approximater_tpu.utils.serialize import tree_get

KEY = jax.random.key(0)


def _tiny(num_classes=7):
    m = ConvNeXt(num_classes=num_classes, depths=(1, 1, 2, 1),
                 dims=(8, 12, 16, 24))
    return m, {"params": m.init(KEY)}


def _pipeline(m, v, app, filters=None):
    filters = filters if filters is not None else [DepthwiseConvFilter()]
    m.register_switchable(app.src_type, filters)
    for idx in range(m.length_switchable):
        name = m.switchable_names[idx]
        src = m.get_switchable_module(idx)
        sub, sp = app.initialize(src, tree_get(v["params"], name),
                                 jax.random.fold_in(KEY, idx))
        m.set_switchable_module(idx, sub, v, {"params": sp})
        app.optimize(sub, sp)
        mod, np_ = app.postprocess(sub, sp)
        m.set_switchable_module(idx, mod, v, {"params": np_})
    return m, v


def test_convnext_tiny_shape_and_params():
    """ConvNeXt-T must match the official 28.6M param count (the naming /
    topology contract the docstring promises)."""
    m = ConvNeXt(arch="tiny", num_classes=1000)
    p = m.init(KEY)
    n = sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(p))
    assert abs(n / 1e6 - 28.59) < 0.1
    mt, v = _tiny()
    y = mt(v["params"], jax.random.normal(KEY, (2, 64, 64, 3)),
           Ctx(training=False))
    assert y.shape == (2, 7)


def test_dwsep_filter_selects_only_block_dwconvs():
    """The stem 4x4 / downsample 2x2 convs and the Linear MLP must not
    register; only the 7x7 depthwise blocks do."""
    m, _ = _tiny()
    m.register_switchable(Conv2d, [DepthwiseConvFilter()])
    assert m.length_switchable == 5  # sum of depths (1,1,2,1)
    assert all(n.endswith("dwconv") for n in m.switchable_names)


def test_dwsep_full_rank_exact():
    """rank = k reproduces the original kernel exactly: end-to-end logits
    match the dense model."""
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    m0, v0 = _tiny()
    y0 = m0(v0["params"], x, Ctx(training=False))
    m7, v7 = _tiny()
    m7, v7 = _pipeline(m7, v7, DwSepRep(ranks=7))
    y7 = m7(v7["params"], x, Ctx(training=False))
    assert float(jnp.max(jnp.abs(y7 - y0))) < 1e-5


def test_dwsep_rank1_exact_on_separable_kernel():
    """A genuinely separable kernel (outer product per channel) must be
    reproduced exactly at rank 1, including the bias carry."""
    C, k = 6, 7
    conv = Conv2d(C, C, k, padding=k // 2, groups=C)
    u = jax.random.normal(KEY, (C, k))
    v = jax.random.normal(jax.random.fold_in(KEY, 1), (C, k))
    w = jnp.einsum("ch,cw->hwc", u, v)[:, :, None, :]  # HWIO (k,k,1,C)
    b = jax.random.normal(jax.random.fold_in(KEY, 2), (C,))
    params = {"weight": w, "bias": b}
    x = jax.random.normal(jax.random.fold_in(KEY, 3), (2, 16, 16, C))
    y0 = conv(params, x, Ctx(training=False))

    app = DwSepRep(ranks=1, strip_matmul=False)
    sub, sp = app.initialize(conv, params, KEY)
    app.optimize(sub, sp)
    tgt, tp = app.postprocess(sub, sp)
    assert isinstance(tgt, CascadeConv)
    y1 = tgt(tp, x, Ctx(training=False))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-4)


def test_dwsep_rank_tuple_cursor_and_structures():
    """Per-layer ranks apply in BFS order; rank 1 builds a CascadeConv,
    rank r>1 a ParallelConv with r branches."""
    m, v = _tiny()
    m, v = _pipeline(m, v, DwSepRep(ranks=(1, 2, 3, 1, 2)))
    mods = [m.get_switchable_module(i) for i in range(m.length_switchable)]
    assert isinstance(mods[0], CascadeConv)
    assert isinstance(mods[1], ParallelConv)
    assert len(list(mods[1].branches.named_children())) == 2
    assert len(list(mods[2].branches.named_children())) == 3
    assert isinstance(mods[3], CascadeConv)
    # rank-r output == sum of the top-r SVD terms (sanity: closer than rank-1)
    x = jax.random.normal(KEY, (2, 48, 48, 3))
    y = m(v["params"], x, Ctx(training=False))
    assert bool(jnp.all(jnp.isfinite(y)))


def test_dwsep_monotone_pc_energy():
    """Higher rank keeps more of the kernel: the per-layer reconstruction
    error of the substituted dwconv output must shrink as rank grows."""
    C, k = 8, 7
    conv = Conv2d(C, C, k, padding=k // 2, groups=C)
    params = conv.init(KEY)
    x = jax.random.normal(jax.random.fold_in(KEY, 5), (2, 16, 16, C))
    y0 = conv(params, x, Ctx(training=False))
    errs = []
    for r in (1, 3, 7):
        app = DwSepRep(ranks=r, strip_matmul=False)
        sub, sp = app.initialize(conv, dict(params), KEY)
        app.optimize(sub, sp)
        tgt, tp = app.postprocess(sub, sp)
        yr = tgt(tp, x, Ctx(training=False))
        errs.append(float(jnp.max(jnp.abs(yr - y0))))
    assert errs[2] < 1e-5
    assert errs[2] <= errs[1] <= errs[0]


def test_convnext_block_matches_torch():
    """Our NHWC block (no permutes) must reproduce the official NCHW block
    given the same weights (exact-erf GELU for parity)."""
    torch = pytest.importorskip("torch")
    import os

    from convnet_approximater_tpu.models.convnext import ConvNeXtBlock

    tnn = torch.nn
    dim = 8

    class TBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.dwconv = tnn.Conv2d(dim, dim, 7, padding=3, groups=dim)
            self.norm = tnn.LayerNorm(dim, eps=1e-6)
            self.pwconv1 = tnn.Linear(dim, 4 * dim)
            self.act = tnn.GELU()
            self.pwconv2 = tnn.Linear(4 * dim, dim)
            self.gamma = tnn.Parameter(1e-2 * torch.ones(dim))

        def forward(self, x):  # NCHW
            inp = x
            x = self.dwconv(x)
            x = x.permute(0, 2, 3, 1)
            x = self.norm(x)
            x = self.pwconv2(self.act(self.pwconv1(x)))
            x = self.gamma * x
            return inp + x.permute(0, 3, 1, 2)

    tb = TBlock().eval()
    blk = ConvNeXtBlock(dim, layer_scale=1e-2)
    params = blk.init(KEY)
    sd = tb.state_dict()
    params["dwconv"]["weight"] = jnp.asarray(
        sd["dwconv.weight"].numpy().transpose(2, 3, 1, 0))  # OIHW->HWIO
    params["dwconv"]["bias"] = jnp.asarray(sd["dwconv.bias"].numpy())
    params["norm"]["scale"] = jnp.asarray(sd["norm.weight"].numpy())
    params["norm"]["bias"] = jnp.asarray(sd["norm.bias"].numpy())
    for name in ("pwconv1", "pwconv2"):
        params[name]["weight"] = jnp.asarray(sd[f"{name}.weight"].numpy().T)
        params[name]["bias"] = jnp.asarray(sd[f"{name}.bias"].numpy())
    params["gamma"]["gamma"] = jnp.asarray(sd["gamma"].numpy())

    xn = np.random.RandomState(0).randn(2, 12, 12, dim).astype(np.float32)
    with torch.no_grad():
        yt = tb(torch.from_numpy(xn.transpose(0, 3, 1, 2))).numpy()
    os.environ["CAT_EXACT_GELU"] = "1"
    try:
        yj = blk(params, jnp.asarray(xn), Ctx(training=False))
    finally:
        os.environ.pop("CAT_EXACT_GELU", None)
    np.testing.assert_allclose(np.asarray(yj).transpose(0, 3, 1, 2), yt,
                               rtol=1e-4, atol=1e-5)


def test_dwsep_never_lose_rematerializes():
    """The deploy arbiter handles DwSepRep targets: with an injected clock
    that makes the cascades 'slow', every dwconv re-materializes to its
    exact dense depthwise kernel and the logits still match."""
    from convnet_approximater_tpu.deploy import never_lose_deploy

    x = jax.random.normal(KEY, (2, 48, 48, 3))
    m, v = _tiny()
    m, v = _pipeline(m, v, DwSepRep(ranks=1, strip_matmul=False))
    y_lr = m(v["params"], x, Ctx(training=False))

    calls = dict(n=0)

    def fake_time(model, variables, shape, dt):
        calls["n"] += 1
        return 2.0 if calls["n"] == 1 else 1.0  # decomposed slow, dense fast

    res = never_lose_deploy(m, v, x.shape, greedy=False, verbose=False,
                            time_fn=fake_time)
    assert res["kept_decomposed"] == 0
    assert len(res["layers"]) == 5
    assert all(not isinstance(m.get_switchable_module(i),
                              (CascadeConv, ParallelConv))
               for i in range(m.length_switchable))
    y_d = m(v["params"], x, Ctx(training=False))
    np.testing.assert_allclose(np.asarray(y_d), np.asarray(y_lr),
                               rtol=1e-5, atol=1e-6)


def test_dwsep_never_lose_keeps_winners():
    """And with the clock reversed (cascades fast), everything stays
    decomposed."""
    from convnet_approximater_tpu.deploy import never_lose_deploy

    x = jax.random.normal(KEY, (2, 48, 48, 3))
    m, v = _tiny()
    m, v = _pipeline(m, v, DwSepRep(ranks=2, strip_matmul=False))

    calls = dict(n=0)

    def fake_time(model, variables, shape, dt):
        calls["n"] += 1
        return 1.0 if calls["n"] == 1 else 2.0

    res = never_lose_deploy(m, v, x.shape, greedy=False, verbose=False,
                            time_fn=fake_time)
    assert res["kept_decomposed"] == 5
    assert all(isinstance(m.get_switchable_module(i), ParallelConv)
               for i in range(m.length_switchable))


def test_convnext_official_checkpoint_roundtrip():
    """A state_dict with the OFFICIAL ConvNeXt naming (bare ``gamma``
    tensors, Sequential downsample_layers/stages) converts with
    ``--arch convnext`` and reproduces torch's logits."""
    torch = pytest.importorskip("torch")
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "ckpt_converter"))
    import torch_to_tpu as t2t
    from convnet_approximater_tpu.utils.serialize import load_into

    tnn = torch.nn
    depths, dims = (1, 1, 2, 1), (8, 12, 16, 24)

    class TLNcf(tnn.Module):  # channels-first LayerNorm (official impl)
        def __init__(self, dim):
            super().__init__()
            self.weight = tnn.Parameter(torch.ones(dim))
            self.bias = tnn.Parameter(torch.zeros(dim))

        def forward(self, x):
            x = x.permute(0, 2, 3, 1)
            x = torch.nn.functional.layer_norm(
                x, x.shape[-1:], self.weight, self.bias, 1e-6)
            return x.permute(0, 3, 1, 2)

    class TBlock(tnn.Module):
        def __init__(self, dim):
            super().__init__()
            self.dwconv = tnn.Conv2d(dim, dim, 7, padding=3, groups=dim)
            self.norm = tnn.LayerNorm(dim, eps=1e-6)
            self.pwconv1 = tnn.Linear(dim, 4 * dim)
            self.act = tnn.GELU()
            self.pwconv2 = tnn.Linear(4 * dim, dim)
            self.gamma = tnn.Parameter(1e-2 * torch.ones(dim))

        def forward(self, x):
            inp = x
            x = self.dwconv(x).permute(0, 2, 3, 1)
            x = self.pwconv2(self.act(self.pwconv1(self.norm(x))))
            return inp + (self.gamma * x).permute(0, 3, 1, 2)

    class TConvNeXt(tnn.Module):
        def __init__(self, num_classes=7):
            super().__init__()
            downs = [tnn.Sequential(tnn.Conv2d(3, dims[0], 4, stride=4),
                                    TLNcf(dims[0]))]
            for i in range(3):
                downs.append(tnn.Sequential(
                    TLNcf(dims[i]), tnn.Conv2d(dims[i], dims[i + 1], 2, stride=2)))
            self.downsample_layers = tnn.ModuleList(downs)
            self.stages = tnn.ModuleList(
                [tnn.Sequential(*[TBlock(dims[i]) for _ in range(depths[i])])
                 for i in range(4)])
            self.norm = tnn.LayerNorm(dims[-1], eps=1e-6)
            self.head = tnn.Linear(dims[-1], num_classes)

        def forward(self, x):
            for i in range(4):
                x = self.downsample_layers[i](x)
                x = self.stages[i](x)
            return self.head(self.norm(x.mean([-2, -1])))

    tm = TConvNeXt().eval()
    for p in tm.parameters():  # non-trivial weights
        with torch.no_grad():
            p.add_(0.05 * torch.randn_like(p))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree = t2t.convert_state_dict(sd, "convnext")

    m = ConvNeXt(num_classes=7, depths=depths, dims=dims, layer_scale=1e-2)
    v = {"params": m.init(KEY)}
    v = load_into(v, {"params": tree["params"]})

    xn = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        yt = tm(torch.from_numpy(xn.transpose(0, 3, 1, 2))).numpy()
    os.environ["CAT_EXACT_GELU"] = "1"
    try:
        yj = m(v["params"], jnp.asarray(xn), Ctx(training=False))
    finally:
        os.environ.pop("CAT_EXACT_GELU", None)
    np.testing.assert_allclose(np.asarray(yj), yt, rtol=1e-4, atol=1e-5)


def test_dwsep_finetune_reduces_l2_norm(tmp_path):
    """DwSepRep works through the full L2Reconstruct recovery machinery:
    the teacher rebuild re-runs initialize() after rewind() (the rank
    cursor must reset), and training reduces the reconstruction norm."""
    from convnet_approximater_tpu.runner import Runner
    from convnet_approximater_tpu.utils import init_cfg, update_cfg

    cfg_text = """
model = dict(type="ConvNeXt", num_classes=4, depths=(1, 1, 1, 1),
             dims=(8, 12, 16, 20))
app = dict(type="DwSepRep", ranks=(1, 2, 1, 2), strip_matmul=False)
filters = [dict(type="DepthwiseConvFilter")]
hooks = [dict(type="L2Reconstruct", priority=50, asym=True, l2_weight=1.0,
    cls_weight=0.0,
    dataset_args=dict(batch_size=8),
    data_config=dict(image_size=(32, 32)),
    optim_args=dict(opt="adamw", lr=5e-3, weight_decay=0.0),
    sche_args=dict(epochs=3),
    other_args=dict(num_classes=4, max_steps_per_epoch=3, max_eval_batches=1,
                    log_interval=100, use_mesh=False),
)]
"""
    p = tmp_path / "cnx_ft.py"
    p.write_text(cfg_text)
    init_cfg(str(p))
    update_cfg(work_dir=str(tmp_path / "work"), config_name="cnx_ft", seed=0)
    runner = Runner(skip_post=True)
    runner.run()
    csv = open(str(tmp_path / "work" / "summary.csv")).read().strip().split("\n")
    header = csv[0].split(",")
    norm_idx = header.index("train_norm")
    norms = [float(r.split(",")[norm_idx]) for r in csv[1:]]
    assert norms[-1] < norms[0]


def test_dwsep_auto_rank_energy():
    """energy=tau: tau=1.0 reproduces exactly (full rank); small tau gives
    rank 1; ranks are monotone in tau."""
    C, k = 6, 7
    conv = Conv2d(C, C, k, padding=3, groups=C)
    params = conv.init(KEY)
    x = jax.random.normal(KEY, (2, 16, 16, C))
    y0 = conv(params, x, Ctx(training=False))

    def run(tau):
        app = DwSepRep(energy=tau, strip_matmul=False)
        sub, sp = app.initialize(conv, dict(params), KEY)
        app.optimize(sub, sp)
        return app.postprocess(sub, sp)

    tgt, tp = run(1.0)
    assert isinstance(tgt, ParallelConv)
    assert len(list(tgt.branches.named_children())) == k
    y = tgt(tp, x, Ctx(training=False))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0),
                               rtol=1e-4, atol=1e-4)
    tgt_lo, _ = run(0.3)
    tgt_hi, _ = run(0.9)
    r_lo = 1 if isinstance(tgt_lo, CascadeConv) else \
        len(list(tgt_lo.branches.named_children()))
    r_hi = 1 if isinstance(tgt_hi, CascadeConv) else \
        len(list(tgt_hi.branches.named_children()))
    assert 1 <= r_lo <= r_hi <= k


def test_convnext_scan_engine_parity():
    """The shared stage engine (models/stage_exec.py): scan-over-blocks
    forward and grads are exact vs the unrolled Sequential."""
    import jax

    m_off = ConvNeXt(arch="tiny", num_classes=10, scan_blocks="off",
                     drop_path_rate=0.1)
    p = m_off.init(KEY)
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    m_scan = ConvNeXt(arch="tiny", num_classes=10, scan_blocks="auto",
                      drop_path_rate=0.1)
    y_off, _, _ = m_off.apply(p, x, training=False)
    y_scan, _, _ = m_scan.apply(p, x, training=False)
    assert jnp.max(jnp.abs(y_off - y_scan)) == 0.0

    def loss(pp, mdl):
        y, _, _ = mdl.apply(pp, x, training=False)
        return jnp.sum(y ** 2)

    g1 = jax.grad(loss)(p, m_off)
    g2 = jax.grad(loss)(p, m_scan)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        assert jnp.max(jnp.abs(a - b)) < 1e-5
    # training path runs (per-block drop-path rates thread through the scan)
    yt, _, _ = m_scan.apply(p, x, training=True, rng=jax.random.PRNGKey(3))
    assert bool(jnp.isfinite(yt).all())
