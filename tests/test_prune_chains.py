"""deploy.prune_chains: cross-layer producer->consumer channel pruning.

Covers: junction discovery per family (Sequential adjacency + ResNet
PRUNE_PATTERNS), shape/param consistency after pruning, zero-channel
dropping, keep_ratio=1 and tile-snap skips, and composition with
fold_batchnorm / quantize_int8 / bf16 casting.
"""

import jax
import jax.numpy as jnp
import numpy as np

from convnet_approximater_tpu.deploy import fold_batchnorm, prune_chains
from convnet_approximater_tpu.models import build_model

KEY = jax.random.key(0)


def _build(name):
    cfg = {"AlexNet": dict(type="AlexNet"),
           "VGG16": dict(type="VGG", depth=16),
           "ResNet18": dict(type="ResNet", depth=18)}[name]
    m = build_model(dict(num_classes=10, **cfg))
    return m, {"params": m.init(KEY), "state": m.init_state()}


def test_keep_all_is_noop():
    m, v = _build("AlexNet")
    before = jax.tree_util.tree_map(lambda a: a.shape, v["params"])
    n = prune_chains(m, v, keep_ratio=1.0, round_to=None)
    assert n == 0
    after = jax.tree_util.tree_map(lambda a: a.shape, v["params"])
    assert before == after


def test_prunes_every_family_and_stays_runnable():
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    for name, min_junctions in (("AlexNet", 5), ("VGG16", 12),
                                ("ResNet18", 8)):
        m, v = _build(name)
        n = prune_chains(m, v, keep_ratio=0.5, round_to=64)
        assert n >= min_junctions, (name, n)
        y, _, _ = m.apply(v["params"], x, state=v["state"], training=False)
        assert y.shape == (2, 10) and bool(jnp.all(jnp.isfinite(y))), name


def test_param_count_halves_on_vgg():
    m, v = _build("VGG16")
    n0 = sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(v["params"]))
    prune_chains(m, v, keep_ratio=0.5, round_to=64)
    n1 = sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(v["params"]))
    assert n1 < n0 * 0.6, (n0, n1)


def test_zero_channel_is_dropped():
    """A producer out-channel with exactly zero weights (and zero consumer
    column) carries zero importance — dropping exactly one channel must
    drop it, leaving the forward EXACT."""
    m, v = _build("AlexNet")
    # AlexNet features: convs at Sequential indices; pick the 2nd conv
    # (features.3) -> consumer features.6
    p = v["params"]["features"]
    w = p["3"]["weight"]
    M = w.shape[3]
    p["3"]["weight"] = w.at[..., 7].set(0.0)
    p["3"]["bias"] = p["3"]["bias"].at[7].set(0.0)
    p["6"]["weight"] = p["6"]["weight"].at[:, :, 7, :].set(0.0)
    x = jax.random.normal(jax.random.key(2), (2, 64, 64, 3))
    y0, _, _ = m.apply(v["params"], x, state=v["state"], training=False)

    def only_this(path, mod):
        return path == "features.3"

    n = prune_chains(m, v, keep_ratio=(M - 1) / M, round_to=None,
                     filter_fn=only_this)
    assert n == 1
    assert v["params"]["features"]["3"]["weight"].shape[3] == M - 1
    y1, _, _ = m.apply(v["params"], x, state=v["state"], training=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)


def test_round_to_snap_skips_whole_junctions():
    """With round_to larger than keeps-worth of channels, keeps snap back
    to M and those junctions are skipped entirely."""
    m, v = _build("AlexNet")
    n = prune_chains(m, v, keep_ratio=0.9, round_to=128)
    m2, v2 = _build("AlexNet")
    n2 = prune_chains(m2, v2, keep_ratio=0.9, round_to=None)
    assert n < n2  # snapping disqualified some junctions


def test_composes_with_fold_and_int8():
    from convnet_approximater_tpu.deploy import quantize_int8
    from convnet_approximater_tpu.utils import cast_floating

    m, v = _build("ResNet18")
    n = prune_chains(m, v, keep_ratio=0.5, round_to=64)
    assert n == 8
    nf = fold_batchnorm(m, v)
    assert nf > 0  # sliced BNs still fold
    v = {"params": cast_floating(v["params"], jnp.bfloat16),
         "state": v["state"]}
    calib = [jax.random.normal(jax.random.key(3), (2, 64, 64, 3),
                               jnp.bfloat16)]
    nq = quantize_int8(m, v, calib)
    assert nq > 0
    x = jax.random.normal(jax.random.key(4), (2, 64, 64, 3), jnp.bfloat16)
    y, _, _ = m.apply(v["params"], x, state=v["state"], training=False)
    assert bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))


def test_dry_run_counts_without_editing():
    m, v = _build("VGG16")
    before = jax.tree_util.tree_map(lambda a: a.shape, v["params"])
    n = prune_chains(m, v, keep_ratio=0.5, round_to=64, dry_run=True)
    assert n >= 12
    assert jax.tree_util.tree_map(lambda a: a.shape, v["params"]) == before
    # param-free dry run (the planner's probe-model gate)
    m2, _ = _build("VGG16")
    n2 = prune_chains(m2, {"params": {}, "state": {}}, keep_ratio=0.5,
                      round_to=64, dry_run=True)
    assert n2 == n


def test_planner_chainprune_candidates_gated():
    from convnet_approximater_tpu.deploy_planner import default_candidates

    m, _ = _build("VGG16")
    names = [n for n, _ in default_candidates(m)]
    assert "chainprune/0.5" in names and "chainprune/0.5+int8" in names
    # attention/ConvNeXt families keep their dedicated width apps instead
    mscan = build_model(dict(type="MSCAN_Classifier", num_channels=(8, 16),
                             num_blocks=(1, 1), exp_ratios=(4, 4),
                             num_classes=4))
    names2 = [n for n, _ in default_candidates(mscan)]
    assert not any(n.startswith("chainprune/") for n in names2)


def test_structure_passes_runner_ckpt_roundtrip(tmp_path):
    """cfg.structure_passes: the Runner replays prune_chains before the
    app pipeline, the pruned checkpoint saves, and a deploy-mode rerun of
    the SAME config replays the pass so the checkpoint reloads into
    matching shapes with identical outputs."""
    from convnet_approximater_tpu.nn.module import Ctx
    from convnet_approximater_tpu.runner import Runner
    from convnet_approximater_tpu.utils import init_cfg, update_cfg

    cfg = tmp_path / "chainprune.py"
    cfg.write_text(
        "model = dict(type='AlexNet', num_classes=4)\n"
        "app = dict(type='Dummy')\n"
        "filters = []\n"
        "structure_passes = [dict(fn='prune_chains', keep_ratio=0.5,"
        " round_to=16)]\n"
        "hooks = []\n")
    init_cfg(str(cfg))
    update_cfg(work_dir=str(tmp_path / "w1"), config_name="pruned", seed=0)
    r1 = Runner()
    r1.run()
    w = r1.variables["params"]["features"]["3"]["weight"]
    assert w.shape[3] < 192  # second conv's out width halved
    x = jax.random.normal(jax.random.key(5), (2, 64, 64, 3))
    y1 = r1.model(r1.variables["params"], x,
                  Ctx(training=False, state=r1.variables["state"]))

    init_cfg(str(cfg))
    update_cfg(work_dir=str(tmp_path / "w2"), config_name="pruned2", seed=0,
               checkpoint=str(tmp_path / "w1" / "pruned.ckpt.npz"))
    r2 = Runner(deploy=True, skip_optim=True)
    r2.run()
    y2 = r2.model(r2.variables["params"], x,
                  Ctx(training=False, state=r2.variables["state"]))
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(y1))


def test_recovery_plan_chainprune_stage():
    from convnet_approximater_tpu.deploy_planner import recovery_plan

    s = recovery_plan("chainprune/0.5")
    assert s == [dict(structure_pass=dict(fn="prune_chains", keep_ratio=0.5,
                                          round_to=64))]
    s8 = recovery_plan("chainprune/0.5+int8")
    assert s8[0].get("structure_pass") and s8[1] == dict(qat=True)


def test_class_inference_replays_structure_passes(tmp_path):
    """ClassInference (the deploy comparator) loads a chain-pruned
    checkpoint by replaying cfg.structure_passes — same semantics as the
    Runner and export_model."""
    from convnet_approximater_tpu.runner import Runner
    from convnet_approximater_tpu.runner.class_inference import ClassInference
    from convnet_approximater_tpu.utils import init_cfg, update_cfg

    cfg = tmp_path / "cp.py"
    cfg.write_text(
        "model = dict(type='AlexNet', num_classes=4)\n"
        "app = dict(type='Dummy')\n"
        "filters = []\n"
        "structure_passes = [dict(fn='prune_chains', keep_ratio=0.5,"
        " round_to=16)]\n"
        "hooks = []\n")
    init_cfg(str(cfg))
    update_cfg(work_dir=str(tmp_path / "w"), config_name="cp", seed=0)
    Runner().run()
    init_cfg(str(cfg))
    update_cfg(work_dir=str(tmp_path / "w2"), config_name="cp2", seed=0)
    ci = ClassInference(str(tmp_path / "w" / "cp.ckpt.npz"),
                        batch_size=2, input_size=(64, 64, 3))
    ci.run()  # would fail on shape mismatch without the replay


def test_data_driven_refit_beats_slicing():
    """calib_batches: the consumer-kernel least-squares refit on the
    tapped patch Gram beats plain slicing on a duplicated-channel
    junction (He et al.'s data-driven reconstruction)."""
    m0 = build_model(dict(type="AlexNet", num_classes=4))
    v = {"params": m0.init(KEY), "state": m0.init_state()}
    p = v["params"]["features"]
    w = p["3"]["weight"]
    M = w.shape[3]
    half = M // 2
    p["3"]["weight"] = jnp.concatenate([w[..., :half]] * 2, axis=-1)
    p["3"]["bias"] = jnp.concatenate([p["3"]["bias"][:half]] * 2)
    w6 = p["6"]["weight"]
    p["6"]["weight"] = jnp.concatenate([w6[:, :, :half]] * 2, axis=2)
    x = jax.random.normal(jax.random.key(1), (2, 224, 224, 3))
    y0, _, _ = m0.apply(v["params"], x, state=m0.init_state(),
                        training=False)
    calib = [jax.random.normal(jax.random.key(10 + i), (8, 224, 224, 3))
             for i in range(3)]

    def run(refit):
        mm = build_model(dict(type="AlexNet", num_classes=4))
        vv = {"params": jax.tree_util.tree_map(lambda a: a, v["params"]),
              "state": mm.init_state()}
        prune_chains(mm, vv, keep_ratio=0.5, round_to=None,
                     calib_batches=calib if refit else None,
                     filter_fn=lambda path, mod: path == "features.3")
        y, _, _ = mm.apply(vv["params"], x, state=vv["state"],
                           training=False)
        return float(jnp.mean((y - y0) ** 2))

    e_slice, e_refit = run(False), run(True)
    assert e_refit < e_slice * 0.2, (e_refit, e_slice)


def test_refit_rank_guard_falls_back_to_slice():
    """Fewer calibration patches than solve unknowns: the refit would
    interpolate noise (measured 5 orders worse), so it must warn and
    slice instead — outputs identical to the no-calib path."""
    import logging

    m1 = build_model(dict(type="AlexNet", num_classes=4))
    v1 = {"params": m1.init(KEY), "state": m1.init_state()}
    m2 = build_model(dict(type="AlexNet", num_classes=4))
    v2 = {"params": jax.tree_util.tree_map(lambda a: a, v1["params"]),
          "state": m2.init_state()}
    only = lambda path, mod: path == "features.3"
    # 2 images at 64^2 give ~50 patches for the 864-dim half-width solve
    calib = [jax.random.normal(jax.random.key(3), (2, 64, 64, 3))]
    prune_chains(m1, v1, keep_ratio=0.5, round_to=None, filter_fn=only)
    prune_chains(m2, v2, keep_ratio=0.5, round_to=None, filter_fn=only,
                 calib_batches=calib)
    # guard fell back to slice -> same consumer weights up to the
    # (possibly different) measured channel selection; check shape only
    # plus that NO bias was invented by a refit
    assert v2["params"]["features"]["6"]["weight"].shape \
        == v1["params"]["features"]["6"]["weight"].shape
    x = jax.random.normal(jax.random.key(4), (2, 64, 64, 3))
    y, _, _ = m2.apply(v2["params"], x, state=v2["state"], training=False)
    assert bool(jnp.all(jnp.isfinite(y)))
