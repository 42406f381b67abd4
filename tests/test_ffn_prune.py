"""FfnPrune: structured hidden-channel pruning of the conv-FFN.

Covers: exactness at keep=all (slice and refit paths), MAC/param
shrinkage, data-driven re-ranking + closed-form fc2 refit beating plain
slicing, mean (bias) absorption of dropped near-constant channels,
energy auto-k, per-layer tuple cursor, composition with FfnRep, and the
CalibrationHook 'raw' plumbing through the full Runner.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convnet_approximater_tpu.core import FfnPrune, FfnRep
from convnet_approximater_tpu.deploy_planner import apply_app
from convnet_approximater_tpu.models import build_model
from convnet_approximater_tpu.models.mscan import FFN
from convnet_approximater_tpu.nn import Ctx

KEY = jax.random.key(0)


def _ffn(C=6, M=16, key=KEY):
    src = FFN(C, M, 0.0)
    return src, src.init(key)


def _make_mscan():
    m = build_model(dict(type="MSCAN_Classifier", num_channels=(8, 16),
                         num_blocks=(2, 2), exp_ratios=(4, 4), num_classes=10))
    return m, {"params": m.init(KEY), "state": m.init_state()}


def _run_app(app, src, sp, x, calib=None):
    sub, p = app.initialize(src, sp)
    if calib is not None:
        app.set_calibration(0, calib)
    app.optimize(sub, p)
    tgt, tp = app.postprocess(sub, p)
    return tgt, tp


def test_keep_all_exact_slice_and_refit():
    """k == M is the identity: ascending kept set + (for the refit path)
    the normal equations returning the original fc2 up to the ridge."""
    src, sp = _ffn()
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 6))
    y0 = src(sp, x, Ctx(training=False))
    tgt, tp = _run_app(FfnPrune(keep_ratio=1.0), src, sp, x)
    assert tgt.hidden_channel == 16
    y1 = tgt(tp, x, Ctx(training=False))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))
    tgt, tp = _run_app(FfnPrune(keep_ratio=1.0), src, sp, x, calib=x)
    y2 = tgt(tp, x, Ctx(training=False))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y0),
                               rtol=1e-4, atol=1e-5)


def test_prune_shrinks_params():
    src, sp = _ffn(C=6, M=16)
    tgt, tp = _run_app(FfnPrune(keep=4), src, sp, None)
    assert tgt.hidden_channel == 4
    assert tp["fc1"]["weight"].shape == (1, 1, 6, 4)
    assert tp["dconv"]["weight"].shape == (3, 3, 1, 4)
    assert tp["fc2"]["weight"].shape == (1, 1, 4, 6)
    n_old = sum(int(np.prod(v.shape)) for t in sp.values() for v in t.values())
    n_new = sum(int(np.prod(v.shape)) for t in tp.values() for v in t.values())
    assert n_new < n_old * 0.3


def test_refit_beats_slicing_on_redundant_channels():
    """Duplicate hidden channels: slicing loses half the duplicated mass,
    the least-squares refit recovers it from the hidden second moment."""
    src, sp = _ffn(C=4, M=8, key=jax.random.key(3))
    # make channels 4..7 exact duplicates of 0..3 (fc2 too, so the kept
    # copy can absorb the dropped one's output mass exactly)
    for t in ("fc1", "dconv"):
        w = sp[t]["weight"]
        sp[t]["weight"] = jnp.concatenate([w[..., :4], w[..., :4]], axis=-1)
        b = sp[t]["bias"]
        sp[t]["bias"] = jnp.concatenate([b[:4], b[:4]])
    w2 = sp["fc2"]["weight"]
    sp["fc2"]["weight"] = jnp.concatenate([w2[:, :, :4], w2[:, :, :4]], axis=2)
    x = jax.random.normal(jax.random.key(4), (4, 8, 8, 4))
    y0 = src(sp, x, Ctx(training=False))

    def err(app, calib):
        tgt, tp = _run_app(app, src, dict(sp), x, calib=calib)
        y = tgt(tp, x, Ctx(training=False))
        return float(jnp.mean((y - y0) ** 2))

    e_slice = err(FfnPrune(keep=4, refit=False), x)
    e_refit = err(FfnPrune(keep=4, refit=True), x)
    # the duplicated halves make the pruned set lossless under refit
    # (the refit doubles the kept copy's fc2 column), while slicing
    # loses half the duplicated output mass
    assert e_refit < 1e-6, e_refit
    assert e_refit < e_slice * 0.01, (e_refit, e_slice)


def test_refit_absorbs_dropped_mean_into_bias():
    """A pruned near-constant channel (fc1 row ~0, big bias) contributes a
    constant through GELU; the refit's intercept row absorbs it."""
    src, sp = _ffn(C=4, M=8, key=jax.random.key(5))
    # channel 7: constant 2.0 pre-GELU regardless of input
    sp["fc1"]["weight"] = sp["fc1"]["weight"].at[..., 7].set(0.0)
    sp["fc1"]["bias"] = sp["fc1"]["bias"].at[7].set(2.0)
    sp["dconv"]["weight"] = sp["dconv"]["weight"].at[..., 7].set(0.0)
    sp["dconv"]["weight"] = sp["dconv"]["weight"].at[1, 1, 0, 7].set(1.0)
    sp["dconv"]["bias"] = sp["dconv"]["bias"].at[7].set(0.0)
    x = jax.random.normal(jax.random.key(6), (4, 8, 8, 4))
    y0 = src(sp, x, Ctx(training=False))
    # refit ranks by VARIANCE contribution: the constant channel is the
    # zero-variance one, so it is dropped, and the intercept absorbs its
    # constant output exactly
    app = FfnPrune(keep=7, refit=True)
    tgt, tp = _run_app(app, src, dict(sp), x, calib=x)
    assert tp["fc1"]["weight"].shape[-1] == 7
    y = tgt(tp, x, Ctx(training=False))
    assert float(jnp.mean((y - y0) ** 2)) < 1e-9
    # slicing ranks by second moment (b2 stays as-is): dropping ANY
    # channel — constant or not — really loses output mass here
    tgt, tp = _run_app(FfnPrune(keep=7, refit=False), src, dict(sp), x,
                       calib=x)
    y = tgt(tp, x, Ctx(training=False))
    assert float(jnp.mean((y - y0) ** 2)) > 1e-5


def test_energy_auto_keep():
    """energy=tau keeps the smallest channel set retaining tau of the
    weight-importance energy; concentrated importance => small k."""
    src, sp = _ffn(C=4, M=8, key=jax.random.key(7))
    # crush channels 2..7 to tiny magnitude
    for t in ("fc1", "dconv", "fc2"):
        w = sp[t]["weight"]
        axis = -1 if t != "fc2" else 2
        idx = [slice(None)] * w.ndim
        idx[axis] = slice(2, None)
        sp[t]["weight"] = w.at[tuple(idx)].multiply(1e-3)
    app = FfnPrune(energy=0.99)
    sub, p = app.initialize(src, sp)
    assert sub.new_module.hidden_channel == 2
    # spread importance (fresh weights): energy=1.0 keeps everything
    src2, sp2 = _ffn(C=4, M=8, key=jax.random.key(11))
    app2 = FfnPrune(energy=1.0)
    sub2, _ = app2.initialize(src2, sp2)
    assert sub2.new_module.hidden_channel == 8


def test_per_layer_tuple_cursor():
    model, variables = _make_mscan()
    app = FfnPrune(keep=(4, 8, 12, 16))
    n = apply_app(model, variables, app, [])
    assert n == 4
    hidden = [m.hidden_channel for _, m in model.named_modules()
              if isinstance(m, FFN)]
    assert hidden == [4, 8, 12, 16]
    x = jax.random.normal(jax.random.key(8), (2, 32, 32, 3))
    y, _, _ = model.apply(variables["params"], x,
                          state=variables["state"], training=False)
    assert y.shape == (2, 10) and bool(jnp.all(jnp.isfinite(y)))


def test_composes_with_ffn_rep():
    """Prune then merge: the pruned site is still an FFN, so FfnRep's
    exact fc1+dconv merge applies on top — logits preserved vs pruned."""
    model, variables = _make_mscan()
    apply_app(model, variables, FfnPrune(keep_ratio=0.5), [])
    x = jax.random.normal(jax.random.key(9), (2, 32, 32, 3))
    y_pruned, _, _ = model.apply(variables["params"], x,
                                 state=variables["state"], training=False)
    n = apply_app(model, variables, FfnRep(fix=True), [])
    assert n == 4
    y_merged, _, _ = model.apply(variables["params"], x,
                                 state=variables["state"], training=False)
    np.testing.assert_allclose(np.asarray(y_merged), np.asarray(y_pruned),
                               rtol=2e-4, atol=2e-5)


def test_calibration_hook_raw_plumbing(tmp_path):
    """CalibrationHook streams RAW substitution-input maps (concatenated
    over batches) into FfnPrune through the full Runner."""
    from convnet_approximater_tpu.runner import Runner
    from convnet_approximater_tpu.utils import init_cfg, update_cfg

    cfg_text = """
model = dict(type="MSCAN_Classifier", num_channels=(8, 16),
             num_blocks=(1, 1), exp_ratios=(4, 4), num_classes=4)
app = dict(type="FfnPrune", keep_ratio=0.5)
filters = []
hooks = [dict(type="CalibrationHook", priority=30, num_batches=2,
              batch_size=2, image_size=(32, 32))]
"""
    p = tmp_path / "ffnprune.py"
    p.write_text(cfg_text)
    init_cfg(str(p))
    update_cfg(work_dir=str(tmp_path / "work"), config_name="ffnprune", seed=0)
    runner = Runner(skip_post=True)
    runner.run()
    app = runner.app
    assert sorted(app._raw) == [0, 1]
    # stage-1 FFN input: stem /4 of 32x32, 8 channels, 2 batches of 2
    assert app._raw[0].shape == (4, 8, 8, 8)
    y = runner.model(runner.variables["params"],
                     jax.random.normal(KEY, (2, 32, 32, 3)),
                     Ctx(training=False, state=runner.variables["state"]))
    assert bool(jnp.all(jnp.isfinite(y)))


def _make_convnext():
    m = build_model(dict(type="ConvNeXt", depths=(1, 1, 1, 1),
                         dims=(8, 8, 16, 16), num_classes=10))
    return m, {"params": m.init(KEY), "state": m.init_state()}


def test_mlp_prune_keep_all_exact():
    from convnet_approximater_tpu.core import MlpPrune

    model, variables = _make_convnext()
    x = jax.random.normal(jax.random.key(12), (2, 32, 32, 3))
    y0, _, _ = model.apply(variables["params"], x,
                           state=variables["state"], training=False)
    n = apply_app(model, variables, MlpPrune(keep_ratio=1.0), [])
    assert n == 4
    y1, _, _ = model.apply(variables["params"], x,
                           state=variables["state"], training=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))


def test_mlp_prune_shrinks_and_runs():
    from convnet_approximater_tpu.core import MlpPrune
    from convnet_approximater_tpu.models.convnext import ConvNeXtBlock

    model, variables = _make_convnext()
    apply_app(model, variables, MlpPrune(keep_ratio=0.5), [])
    hidden = [m.hidden for _, m in model.named_modules()
              if isinstance(m, ConvNeXtBlock)]
    assert hidden == [16, 16, 32, 32]  # half of 4x expansion
    x = jax.random.normal(jax.random.key(13), (2, 32, 32, 3))
    y, _, _ = model.apply(variables["params"], x,
                          state=variables["state"], training=False)
    assert y.shape == (2, 10) and bool(jnp.all(jnp.isfinite(y)))


def test_mlp_prune_refit_exact_on_block_redundancy():
    """Block-level: duplicated hidden Linear channels are lossless to
    prune under greedy selection + refit (the ConvNeXt adapter of the
    same machinery the FFN test covers)."""
    from convnet_approximater_tpu.core import MlpPrune
    from convnet_approximater_tpu.models.convnext import ConvNeXtBlock

    src = ConvNeXtBlock(4, 0.0)
    sp = src.init(jax.random.key(14))
    w1 = sp["pwconv1"]["weight"]  # (4, 16)
    sp["pwconv1"]["weight"] = jnp.concatenate([w1[:, :8], w1[:, :8]], axis=1)
    sp["pwconv1"]["bias"] = jnp.concatenate([sp["pwconv1"]["bias"][:8]] * 2)
    w2 = sp["pwconv2"]["weight"]  # (16, 4)
    sp["pwconv2"]["weight"] = jnp.concatenate([w2[:8], w2[:8]], axis=0)
    x = jax.random.normal(jax.random.key(15), (2, 8, 8, 4))
    y0 = src(sp, x, Ctx(training=False))
    app = MlpPrune(keep=8, refit=True)
    sub, p = app.initialize(src, dict(sp))
    app.set_calibration(0, x)
    app.optimize(sub, p)
    tgt, tp = app.postprocess(sub, p)
    assert tgt.hidden == 8
    y = tgt(tp, x, Ctx(training=False))
    assert float(jnp.mean((y - y0) ** 2)) < 1e-6


def test_mlp_prune_uniform_keep_scans():
    """A uniformly pruned stage stays structurally identical, so the
    scan-over-blocks engine still engages — outputs match the unrolled
    path bit-for-bit."""
    from convnet_approximater_tpu.core import MlpPrune

    def build(scan):
        m = build_model(dict(type="ConvNeXt", depths=(2, 1, 1, 2),
                             dims=(8, 8, 16, 16), num_classes=10,
                             scan_blocks=scan))
        return m, {"params": m.init(KEY), "state": m.init_state()}

    x = jax.random.normal(jax.random.key(16), (2, 32, 32, 3))
    outs = []
    for scan in ("auto", "never"):
        model, variables = build(scan)
        apply_app(model, variables, MlpPrune(keep_ratio=0.5), [])
        y, _, _ = model.apply(variables["params"], x,
                              state=variables["state"], training=False)
        outs.append(np.asarray(y))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_round_to_snaps_to_tile_width():
    """round_to snaps the kept width to MXU-friendly multiples (measured:
    192 of 256 pads back to 2 tiles of 128 — no matmul win), clamped to
    [round_to, M]; hidden dims at or under the tile width are left alone."""
    src, sp = _ffn(C=6, M=256)
    app = FfnPrune(keep_ratio=0.75, round_to=128)
    assert app._num_keep(src, sp) == 256  # 192 rounds up: not worth it
    app = FfnPrune(keep_ratio=0.55, round_to=128)
    assert app._num_keep(src, sp) == 128
    app = FfnPrune(keep_ratio=0.25, round_to=128)
    assert app._num_keep(src, sp) == 128  # floor: at least one tile
    src_s, sp_s = _ffn(C=6, M=64)
    app = FfnPrune(keep_ratio=0.5, round_to=128)
    assert app._num_keep(src_s, sp_s) == 32  # M <= round_to: untouched


def test_apply_app_two_pass_calibration():
    """apply_app(calib_batches=...) reproduces the CalibrationHook flow
    without a Runner: raw taps reach FfnPrune, so the greedy+refit path
    runs (duplicated-channel FFN inside a model stays lossless at half
    width, which plain weight-ranked slicing cannot achieve)."""
    model, variables = _make_mscan()
    # duplicate the hidden halves of every FFN (fc2 rows too)
    import jax.tree_util as jtu

    for name, mod in model.named_modules():
        if not isinstance(mod, FFN):
            continue
        path = name.split(".")
        t = variables["params"]
        for p in path:
            t = t[p]
        for sub in ("fc1", "dconv"):
            w = t[sub]["weight"]
            half = w.shape[-1] // 2
            t[sub]["weight"] = jnp.concatenate(
                [w[..., :half], w[..., :half]], axis=-1)
            t[sub]["bias"] = jnp.concatenate([t[sub]["bias"][:half]] * 2)
        w2 = t["fc2"]["weight"]
        half = w2.shape[2] // 2
        t["fc2"]["weight"] = jnp.concatenate(
            [w2[:, :, :half], w2[:, :, :half]], axis=2)
    x = jax.random.normal(jax.random.key(21), (4, 32, 32, 3))
    y0, _, _ = model.apply(variables["params"], x,
                           state=variables["state"], training=False)
    calib = [jax.random.normal(jax.random.key(22), (4, 32, 32, 3))]
    app = FfnPrune(keep_ratio=0.5, refit=True)
    n = apply_app(model, variables, app, [], calib_batches=calib)
    assert n == 4
    assert sorted(app._raw) == [0, 1, 2, 3]  # every site got its taps
    y1, _, _ = model.apply(variables["params"], x,
                           state=variables["state"], training=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-3, atol=1e-4)


# -- AttnPrune: the gated MSCA branch's width -----------------------------

def _attn(C=8, inner=None, key=KEY):
    from convnet_approximater_tpu.models.mscan import SpatialAttention

    src = SpatialAttention(C, 5, (7, 11), inner_channel=inner)
    return src, src.init(key)


def test_attn_prune_keep_all_exact():
    from convnet_approximater_tpu.core import AttnPrune

    src, sp = _attn(C=8)
    x = jax.random.normal(jax.random.key(1), (2, 12, 12, 8))
    y0 = src(sp, x, Ctx(training=False))
    for calib in (None, x):
        tgt, tp = _run_app(AttnPrune(keep=8), src, sp, x, calib=calib)
        y1 = tgt(tp, x, Ctx(training=False))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-4, atol=2e-5)


def test_attn_prune_shrinks_all_branch_tensors():
    from convnet_approximater_tpu.core import AttnPrune

    src, sp = _attn(C=8)
    x = jax.random.normal(jax.random.key(2), (2, 12, 12, 8))
    tgt, tp = _run_app(AttnPrune(keep=4), src, sp, x, calib=x)
    assert tgt.inner_channel == 4 and tgt.num_channel == 8
    assert tp["proj_1"]["weight"].shape == (1, 1, 8, 4)
    assert tp["spatial_gating_unit"]["conv0"]["weight"].shape[3] == 4
    assert tp["spatial_gating_unit"]["channel_mix"]["weight"].shape[2:] == (4, 4)
    assert tp["proj_2"]["weight"].shape == (1, 1, 4, 8)
    for bname, branch in tp["spatial_gating_unit"]["sd_convs"]["branches"].items():
        for cn in ("conv1", "conv2"):
            if cn in branch:
                assert branch[cn]["weight"].shape[3] == 4, (bname, cn)
    y = tgt(tp, x, Ctx(training=False))
    assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))


def test_attn_prune_composes_with_rep_and_ffnprune():
    from convnet_approximater_tpu.core import AttnPrune, MscaRep

    m, v = _make_mscan()
    x = jax.random.normal(jax.random.key(3), (2, 32, 32, 3))
    na = apply_app(m, v, AttnPrune(keep_ratio=0.5), [], KEY)
    nf = apply_app(m, v, FfnPrune(keep_ratio=0.5, round_to=None), [], KEY)
    nr = apply_app(m, v, MscaRep(decomp=1, fix=True), [], KEY)
    assert na == 4 and nf == 4 and nr == 4
    y, _, _ = m.apply(v["params"], x, state=v["state"], training=False)
    assert y.shape == (2, 10) and bool(jnp.all(jnp.isfinite(y)))


def test_attn_prune_refit_on_pruned_branch_beats_slicing():
    """channel_mix couples channels: dropped rows feed kept columns, so a
    refit fit to the UNPRUNED hidden is mis-specified.  The override fits
    the projection to the pruned branch's measured hidden — on a mix with
    strong off-diagonal coupling it must reconstruct better than plain
    slicing."""
    from convnet_approximater_tpu.core import AttnPrune

    src, sp = _attn(C=8)
    # strong coupling: every mix column reads every row
    key = jax.random.key(11)
    sp["spatial_gating_unit"]["channel_mix"]["weight"] = \
        jax.random.normal(key, sp["spatial_gating_unit"]["channel_mix"]
                          ["weight"].shape)
    x = jax.random.normal(jax.random.key(12), (4, 12, 12, 8))
    y0 = src(sp, x, Ctx(training=False))

    tgt_r, tp_r = _run_app(AttnPrune(keep=4, refit=True), src, sp, x,
                           calib=x)
    tgt_s, tp_s = _run_app(AttnPrune(keep=4, refit=False), src, sp, x,
                           calib=x)
    err_r = float(jnp.mean((tgt_r(tp_r, x, Ctx(training=False)) - y0) ** 2))
    err_s = float(jnp.mean((tgt_s(tp_s, x, Ctx(training=False)) - y0) ** 2))
    assert err_r < err_s, (err_r, err_s)
