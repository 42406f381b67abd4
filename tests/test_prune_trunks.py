"""deploy.prune_trunks: residual-trunk channel pruning with shared masks.

Covers: trunk-group discovery on BasicBlock and Bottleneck families (stem
merge when layer1 has no projection, per-stage groups, fc consumer),
shape/param consistency, zero-channel exactness through the identity adds,
keep=1 no-op, dry-run gating, and composition with prune_chains /
fold_batchnorm / int8.
"""

import jax
import jax.numpy as jnp
import numpy as np

from convnet_approximater_tpu.deploy import (_trunk_groups, fold_batchnorm,
                                             prune_chains, prune_trunks)
from convnet_approximater_tpu.models import build_model

KEY = jax.random.key(0)


def _build(depth):
    m = build_model(dict(type="ResNet", depth=depth, num_classes=10))
    return m, {"params": m.init(KEY), "state": m.init_state()}


def test_group_discovery_r18_r50():
    m18, _ = _build(18)
    gs = _trunk_groups(m18)
    # R18 layer1 has no projection -> the stem merges into group 0
    assert len(gs) == 4
    assert gs[0]["producers"][0] == ("conv1", "bn1")
    assert "layer2.0.downsample.0" in gs[0]["consumers"]
    assert gs[-1]["consumers"][-1] == "fc"

    m50, _ = _build(50)
    gs50 = _trunk_groups(m50)
    # R50 layer1.0 projects 64->256, so the stem is its own group
    assert len(gs50) == 5
    assert gs50[0]["producers"] == [("conv1", "bn1")]
    assert gs50[0]["consumers"] == ["layer1.0.conv1", "layer1.0.downsample.0"]
    assert gs50[1]["producers"][0][0] == "layer1.0.downsample.0"


def test_keep_all_is_noop():
    m, v = _build(18)
    before = jax.tree_util.tree_map(lambda a: a.shape, v["params"])
    assert prune_trunks(m, v, keep_ratio=1.0, round_to=None) == 0
    assert jax.tree_util.tree_map(lambda a: a.shape, v["params"]) == before


def test_prunes_and_stays_runnable_composed():
    m, v = _build(18)
    n0 = sum(int(np.prod(a.shape))
             for a in jax.tree_util.tree_leaves(v["params"]))
    nt = prune_trunks(m, v, keep_ratio=0.5, round_to=64)
    nc = prune_chains(m, v, keep_ratio=0.5, round_to=64)
    assert nt == 4 and nc == 8
    n1 = sum(int(np.prod(a.shape))
             for a in jax.tree_util.tree_leaves(v["params"]))
    assert n1 < n0 * 0.3, (n0, n1)  # trunk+chain halving ~ 4x param cut
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    y, _, _ = m.apply(v["params"], x, state=v["state"], training=False)
    assert y.shape == (2, 10) and bool(jnp.all(jnp.isfinite(y)))
    assert fold_batchnorm(m, v) > 0  # sliced BNs still fold
    y2, _, _ = m.apply(v["params"], x, state=v["state"], training=False)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), rtol=2e-2,
                               atol=2e-3)


def test_zero_trunk_channel_drop_is_exact():
    """Zero one channel through EVERY producer/BN/consumer of the last
    trunk group; dropping exactly that channel must leave logits exact."""
    m, v = _build(18)
    gs = _trunk_groups(m)
    g = gs[-1]
    c = 5
    p, s = v["params"], v["state"]

    def node(tree, path):
        for k in path.split("."):
            tree = tree[k]
        return tree

    for prod_path, bn_path in g["producers"]:
        pp = node(p, prod_path)
        pp["weight"] = pp["weight"].at[..., c].set(0.0)
        bp, bs = node(p, bn_path), node(s, bn_path)
        bp["scale"] = bp["scale"].at[c].set(0.0)
        bp["bias"] = bp["bias"].at[c].set(0.0)
        bs["mean"] = bs["mean"].at[c].set(0.0)
    for cons_path in g["consumers"]:
        cp = node(p, cons_path)
        if cp["weight"].ndim == 4:
            cp["weight"] = cp["weight"].at[:, :, c, :].set(0.0)
        else:
            cp["weight"] = cp["weight"].at[c, :].set(0.0)
    x = jax.random.normal(jax.random.key(2), (2, 64, 64, 3))
    y0, _, _ = m.apply(p, x, state=s, training=False)

    M = m.get_submodule(g["producers"][0][0]).out_channels
    n = prune_trunks(m, v, keep_ratio=(M - 1) / M, round_to=None,
                     filter_fn=lambda path, mod: path == g["producers"][0][0])
    assert n == 1
    assert m.get_submodule(g["producers"][0][0]).out_channels == M - 1
    assert m.fc.in_features == M - 1
    y1, _, _ = m.apply(v["params"], x, state=v["state"], training=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)


def test_dry_run_counts_param_free():
    m, v = _build(18)
    before = jax.tree_util.tree_map(lambda a: a.shape, v["params"])
    n = prune_trunks(m, v, keep_ratio=0.5, round_to=64, dry_run=True)
    assert n == 4
    assert jax.tree_util.tree_map(lambda a: a.shape, v["params"]) == before
    m2, _ = _build(18)
    assert prune_trunks(m2, {"params": {}, "state": {}}, keep_ratio=0.5,
                        round_to=64, dry_run=True) == 4


def test_structure_pass_replay_reloads_ckpt(tmp_path):
    """A checkpoint saved from a trunk+chain pruned model reloads onto a
    fresh model by replaying the same passes (the structure_passes
    contract — selection replay need not match, shapes must)."""
    from convnet_approximater_tpu.utils.serialize import (load_model,
                                                          save_model)

    m, v = _build(18)
    prune_trunks(m, v, keep_ratio=0.5, round_to=64)
    prune_chains(m, v, keep_ratio=0.5, round_to=64)
    x = jax.random.normal(jax.random.key(3), (1, 64, 64, 3))
    y0, _, _ = m.apply(v["params"], x, state=v["state"], training=False)
    path = str(tmp_path / "pruned.ckpt.npz")
    save_model(v, path)

    m2, v2 = _build(18)
    prune_trunks(m2, v2, keep_ratio=0.5, round_to=64)
    prune_chains(m2, v2, keep_ratio=0.5, round_to=64)
    v2 = load_model(v2, path, strict=True)
    y1, _, _ = m2.apply(v2["params"], x, state=v2["state"], training=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-6)


def test_planner_trunk_candidates_gated():
    from convnet_approximater_tpu.deploy_planner import (default_candidates,
                                                         recovery_plan)

    m, _ = _build(18)
    names = [n for n, _ in default_candidates(m)]
    assert "trunk+chainprune/0.5" in names
    assert "trunk+chainprune/0.5+int8" in names
    # VGG has junctions but no residual trunks
    vgg = build_model(dict(type="VGG", depth=16, num_classes=10))
    names2 = [n for n, _ in default_candidates(vgg)]
    assert "chainprune/0.5" in names2
    assert not any(n.startswith("trunk+") for n in names2)

    s = recovery_plan("trunk+chainprune/0.5+int8")
    assert [st.get("structure_pass", {}).get("fn") for st in s[:2]] == \
        ["prune_trunks", "prune_chains"]
    assert s[2] == dict(qat=True)


def test_emit_recovery_accumulates_structure_passes(tmp_path):
    """Chained structure-pass stages: stage N's emitted config must replay
    ALL earlier passes (the stage N-1 checkpoint has both cuts applied)."""
    import argparse

    import scripts.plan_serving as ps

    cfg = tmp_path / "r18.py"
    cfg.write_text("model = dict(type='ResNet', depth=18, num_classes=10)\n")
    args = argparse.Namespace(
        config=str(cfg), emit_recovery=str(tmp_path / "rec"),
        input_size=(64, 64, 3), recovery_epochs=1, recovery_ce_epochs=1,
        v3_energy=0.9)
    plan = {"winner": "trunk+chainprune/0.5+int8",
            "report": [{"name": "trunk+chainprune/0.5+int8",
                        "note": "needs_recovery"}]}

    class _L:
        def info(self, *a, **k):
            pass

    ps.emit_recovery_configs(args, plan, _L())
    import glob
    files = sorted(glob.glob(str(tmp_path / "rec" / "*.py")))
    assert len(files) == 3
    s2 = open(files[1]).read()   # stage 2: chains — must replay trunks too
    assert "prune_trunks" in s2 and "prune_chains" in s2
    s3 = open(files[2]).read()   # stage 3: QAT — must replay both
    assert "prune_trunks" in s3 and "prune_chains" in s3 \
        and "PrepareQAT" in s3


def test_mscan_trunk_hook_and_scan_parity():
    """MSCAN defines its own trunk_groups() (LayerNorms + layer-scale
    vectors slice along); blocks stay structurally identical so the
    scan-over-blocks engine still engages, bit-exact vs unrolled."""
    mscan = build_model(dict(type="MSCAN_Classifier", num_classes=10))
    v = {"params": mscan.init(KEY), "state": mscan.init_state()}
    gs = _trunk_groups(mscan)
    assert len(gs) == 4
    assert gs[0]["producers"][0][0] == "backbone.layers.0.0.proj.3"
    assert gs[-1]["consumers"][-1] == "head"
    assert any("layer_scale" in p for p in gs[0]["vectors"])

    n0 = sum(int(np.prod(a.shape))
             for a in jax.tree_util.tree_leaves(v["params"]))
    n = prune_trunks(mscan, v, keep_ratio=0.5, round_to=None)
    assert n == 4
    n1 = sum(int(np.prod(a.shape))
             for a in jax.tree_util.tree_leaves(v["params"]))
    assert n1 < n0 * 0.6
    assert mscan.head.in_features == 128
    x = jax.random.normal(jax.random.key(4), (2, 64, 64, 3))
    y, _, _ = mscan.apply(v["params"], x, state=v["state"], training=False)
    assert y.shape == (2, 10) and bool(jnp.all(jnp.isfinite(y)))
    mscan.backbone.scan_blocks = "never"
    y2, _, _ = mscan.apply(v["params"], x, state=v["state"], training=False)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


def test_mscan_trunk_composes_with_ffnprune():
    from convnet_approximater_tpu.core import FfnPrune
    from convnet_approximater_tpu.deploy_planner import apply_app

    mscan = build_model(dict(type="MSCAN_Classifier", num_classes=10))
    v = {"params": mscan.init(KEY), "state": mscan.init_state()}
    assert prune_trunks(mscan, v, keep_ratio=0.5, round_to=None) == 4
    n = apply_app(mscan, v, FfnPrune(keep_ratio=0.5, round_to=None), [],
                  jax.random.key(5))
    assert n > 0
    x = jax.random.normal(jax.random.key(6), (2, 64, 64, 3))
    y, _, _ = mscan.apply(v["params"], x, state=v["state"], training=False)
    assert y.shape == (2, 10) and bool(jnp.all(jnp.isfinite(y)))


def test_segnext_trunk_concat_consumer():
    """SegNeXt's squeeze conv reads the tapped stages as one concatenated
    input; each stage's trunk group slices its own SEGMENT (offset =
    earlier tapped stages' final widths), so the concat shape stays
    consistent and the head still runs."""
    from convnet_approximater_tpu.segmentation import SegNeXt

    m = SegNeXt(num_classes=19, num_channels=(16, 32, 64, 96),
                num_blocks=(1, 1, 2, 1), ham_channels=64, ham_rank=16,
                ham_iters=2)
    v = {"params": m.init(KEY), "state": m.init_state()}
    assert m.decode_head.squeeze.in_channels == 32 + 64 + 96
    n = prune_trunks(m, v, keep_ratio=0.5, round_to=None)
    assert n == 4
    assert m.decode_head.squeeze.in_channels == 16 + 32 + 48
    assert v["params"]["decode_head"]["squeeze"]["weight"].shape[2] == 96
    x = jax.random.normal(jax.random.key(7), (1, 64, 64, 3))
    y, _, _ = m.apply(v["params"], x, state=v["state"], training=False)
    assert y.shape == (1, 8, 8, 19) and bool(jnp.all(jnp.isfinite(y)))


def test_shipped_trunk_config_parses_and_passes_apply(tmp_path):
    import os

    from convnet_approximater_tpu.utils import get_cfg, init_cfg

    cfg_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "prune",
        "trunk-prune_ce_resnet18.py")
    init_cfg(cfg_path)
    cfg = get_cfg()
    assert [p["fn"] for p in cfg.structure_passes] == \
        ["prune_trunks", "prune_chains"]
    assert cfg.model["type"] == "ResNet" and cfg.model["depth"] == 18


def test_convnext_trunk_composes_with_mlpprune_dwsep():
    """ConvNeXt trunk: Linear producers (pwconv2), the channel-tied dw7x7
    as a depthwise pass-through, LN/gamma slicing, and width attrs updated
    so MlpPrune's rebuilt blocks and DwSepRep still compose."""
    from convnet_approximater_tpu.core import DwSepRep, MlpPrune
    from convnet_approximater_tpu.deploy_planner import apply_app
    from convnet_approximater_tpu.filters import DepthwiseConvFilter

    m = build_model(dict(type="ConvNeXt", depths=(1, 1, 2, 1),
                         dims=(16, 32, 64, 96), num_classes=10))
    v = {"params": m.init(KEY), "state": m.init_state()}
    n = prune_trunks(m, v, keep_ratio=0.5, round_to=None)
    assert n == 4
    assert m.head.in_features == 48 and m.norm.num_features == 48
    assert m.stages[0][0].dwconv.groups == 8
    assert m.stages[0][0].dim == 8
    x = jax.random.normal(jax.random.key(8), (2, 64, 64, 3))
    y0, _, _ = m.apply(v["params"], x, state=v["state"], training=False)
    assert bool(jnp.all(jnp.isfinite(y0)))
    # scan parity on the pruned model
    m.scan_blocks = "never"
    y1, _, _ = m.apply(v["params"], x, state=v["state"], training=False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    m.scan_blocks = "auto"
    # the ConvNeXt record stack still composes on the pruned trunk
    nm = apply_app(m, v, MlpPrune(keep_ratio=0.5, round_to=None), [], KEY)
    nd = apply_app(m, v, DwSepRep(ranks=1), [DepthwiseConvFilter()], KEY)
    assert nm == 5 and nd == 5
    y2, _, _ = m.apply(v["params"], x, state=v["state"], training=False)
    assert y2.shape == (2, 10) and bool(jnp.all(jnp.isfinite(y2)))


def test_prune_width_single_pass_replay(tmp_path):
    """prune_width: every width axis in ONE structure pass — a quad-pruned
    MSCAN checkpoint saved from a Runner run reloads by replaying the same
    config (shapes deterministic at a given keep_ratio)."""
    from convnet_approximater_tpu.nn.module import Ctx
    from convnet_approximater_tpu.runner import Runner
    from convnet_approximater_tpu.utils import init_cfg, update_cfg

    cfg = tmp_path / "quad.py"
    cfg.write_text(
        "model = dict(type='MSCAN_Classifier', num_classes=4,"
        " num_channels=(8, 16), num_blocks=(1, 1), exp_ratios=(4, 4))\n"
        "app = dict(type='Dummy')\n"
        "filters = []\n"
        "structure_passes = [dict(fn='prune_width', keep_ratio=0.5,"
        " round_to=None, ffn_round_to=None)]\n"
        "hooks = []\n")
    init_cfg(str(cfg))
    update_cfg(work_dir=str(tmp_path / "w1"), config_name="quad", seed=0)
    r1 = Runner()
    r1.run()
    x = jax.random.normal(jax.random.key(9), (2, 32, 32, 3))
    y1 = r1.model(r1.variables["params"], x,
                  Ctx(training=False, state=r1.variables["state"]))

    init_cfg(str(cfg))
    update_cfg(work_dir=str(tmp_path / "w2"), config_name="quad2", seed=0,
               checkpoint=str(tmp_path / "w1" / "quad.ckpt.npz"))
    r2 = Runner(deploy=True, skip_optim=True)
    r2.run()
    y2 = r2.model(r2.variables["params"], x,
                  Ctx(training=False, state=r2.variables["state"]))
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y1))


def test_pruned_resnet_tp_matches_replicated():
    """Multi-chip compatibility of the pruned record surface: the ResNet
    TP preset shards a trunk+chain pruned model (changed widths) with the
    same rules, and the sharded forward matches the replicated one on the
    virtual 4x2 mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from convnet_approximater_tpu.parallel import make_mesh, param_shardings
    from convnet_approximater_tpu.parallel.tp import resnet_tp_rules

    m, v = _build(18)
    assert prune_trunks(m, v, keep_ratio=0.5, round_to=64) == 4
    prune_chains(m, v, keep_ratio=0.5, round_to=64)
    mesh = make_mesh(data=4, model=2)
    x = jax.random.normal(jax.random.key(10), (8, 32, 32, 3))

    def fwd(params, state, xx):
        y, _, _ = m.apply(params, xx, state=state, training=False)
        return y

    y_ref = jax.jit(fwd)(v["params"], v["state"], x)
    p_sh = param_shardings(v["params"], mesh, resnet_tp_rules())
    params = jax.tree_util.tree_map(jax.device_put, v["params"], p_sh)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    y_tp = jax.jit(fwd)(params, v["state"], x_sh)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
