"""arbitrated_apply: the measured per-site substitution arbiter (round 4).

Generalizes never_lose_deploy to ANY approximater by snapshotting each
site's original module + param/state subtrees instead of deriving a dense
inverse.  Ground truth it automates: MSCAN-S f32 FfnRep wins on stage 1,
loses with stage 2 added (doc/perf-notes.md round-4 exact-rewrite
transfer) — selection that used to be a hand-picked IndicesFilter.
"""

import jax
import jax.numpy as jnp
import numpy as np

from convnet_approximater_tpu.core import FfnRep
from convnet_approximater_tpu.deploy import arbitrated_apply
from convnet_approximater_tpu.layers import MergedFFN
from convnet_approximater_tpu.models import MSCAN_Classifier

KEY = jax.random.key(11)


def _tiny_mscan():
    model = MSCAN_Classifier(num_channels=(8, 16), num_blocks=(2, 2),
                             exp_ratios=(4, 4), num_classes=7)
    variables = {"params": model.init(KEY), "state": model.init_state()}
    return model, variables


def _fake_timer(per_site_delta):
    """1.0 s base + delta per site currently in MergedFFN form."""

    def time_fn(model, variables, shape, dtype):
        t = 1.0
        for idx in range(model.length_switchable):
            if isinstance(model.get_switchable_module(idx), MergedFFN):
                t += per_site_delta[idx]
        return t

    return time_fn


def _logits(model, variables, x):
    y, _, _ = model.apply(variables["params"], x, state=variables["state"],
                          training=False)
    return np.asarray(y)


def test_keeps_all_when_substitution_wins_whole():
    model, variables = _tiny_mscan()
    x = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))
    y_ref = _logits(model, variables, x)
    res = arbitrated_apply(model, variables, FfnRep(fix=True), [],
                           (2, 32, 32, 3), verbose=False,
                           time_fn=_fake_timer({0: -0.2, 1: -0.1,
                                                2: -0.1, 3: -0.1}))
    assert res["kept_applied"] == 4
    assert all(l["kept"] == "applied" for l in res["layers"])
    assert all(isinstance(m, MergedFFN) for m in model.switchable_modules())
    assert res["t_final"] == res["t_applied"]
    # FfnRep is exact: whole-model logits preserved
    np.testing.assert_allclose(_logits(model, variables, x), y_ref,
                               rtol=1e-4, atol=1e-4)


def test_greedy_keeps_only_winning_sites():
    model, variables = _tiny_mscan()
    x = jax.random.normal(jax.random.key(3), (2, 32, 32, 3))
    y_ref = _logits(model, variables, x)
    # stage-1 sites win, stage-2 sites lose — the MSCAN-S measurement shape
    res = arbitrated_apply(model, variables, FfnRep(fix=True), [],
                           (2, 32, 32, 3), verbose=False,
                           time_fn=_fake_timer({0: -0.2, 1: -0.1,
                                                2: 0.5, 3: 0.5}))
    assert res["kept_applied"] == 2
    kept = {l["name"]: l["kept"] for l in res["layers"]}
    names = model.switchable_names
    assert kept[names[0]] == "applied" and kept[names[1]] == "applied"
    assert kept[names[2]] == "original" and kept[names[3]] == "original"
    assert isinstance(model.get_switchable_module(0), MergedFFN)
    assert not isinstance(model.get_switchable_module(2), MergedFFN)
    assert abs(res["t_final"] - 0.7) < 1e-9
    np.testing.assert_allclose(_logits(model, variables, x), y_ref,
                               rtol=1e-4, atol=1e-4)


def test_restores_everything_when_all_sites_lose():
    model, variables = _tiny_mscan()
    x = jax.random.normal(jax.random.key(4), (2, 32, 32, 3))
    y_ref = _logits(model, variables, x)
    res = arbitrated_apply(model, variables, FfnRep(fix=True), [],
                           (2, 32, 32, 3), verbose=False,
                           time_fn=_fake_timer({i: 0.5 for i in range(4)}))
    assert res["kept_applied"] == 0
    assert not any(isinstance(m, MergedFFN)
                   for m in model.switchable_modules())
    assert abs(res["t_final"] - 1.0) < 1e-9
    # original modules + exact param/state subtrees restored: bit-exact
    np.testing.assert_array_equal(_logits(model, variables, x), y_ref)


def test_margin_blocks_marginal_wins():
    model, variables = _tiny_mscan()
    # -0.5% per site: whole (-2%) and each site alone are both inside the
    # default 3% noise margin -> decline all
    res = arbitrated_apply(model, variables, FfnRep(fix=True), [],
                           (2, 32, 32, 3), verbose=False, margin=0.03,
                           time_fn=_fake_timer({i: -0.005 for i in range(4)}))
    assert res["kept_applied"] == 0


def test_greedy_false_is_whole_model_never_lose():
    model, variables = _tiny_mscan()
    res = arbitrated_apply(model, variables, FfnRep(fix=True), [],
                           (2, 32, 32, 3), verbose=False, greedy=False,
                           time_fn=_fake_timer({0: -0.1, 1: 0.2,
                                                2: 0.2, 3: 0.2}))
    # all-applied loses (net +0.5), greedy off -> all original even though
    # site 0 alone would have won
    assert res["kept_applied"] == 0
    assert all(l["kept"] == "original" for l in res["layers"])


def test_group_fn_stage_granularity():
    """group_fn coarsens the greedy unit to stages: one timing per group
    (13 -> 4 compiles on MSCAN-t), decisions applied to every member."""
    model, variables = _tiny_mscan()
    calls = []

    def time_fn(m, v, shape, dtype):
        t = 1.0
        for idx in range(m.length_switchable):
            if isinstance(m.get_switchable_module(idx), MergedFFN):
                t += {0: -0.2, 1: -0.1, 2: 0.5, 3: 0.5}[idx]
        calls.append(t)
        return t

    res = arbitrated_apply(model, variables, FfnRep(fix=True), [],
                           (2, 32, 32, 3), verbose=False, time_fn=time_fn,
                           group_fn=lambda n: n.rsplit(".", 3)[0])
    # stage 0 (sites 0+1, net -0.3) kept; stage 1 (net +1.0) restored
    assert res["kept_applied"] == 2
    assert len(calls) == 2 + 2  # applied + original + one per group
    kept = {l["name"]: l["kept"] for l in res["layers"]}
    names = model.switchable_names
    assert kept[names[0]] == "applied" and kept[names[1]] == "applied"
    assert kept[names[2]] == "original" and kept[names[3]] == "original"
    assert abs(res["t_final"] - 0.7) < 1e-9


def test_decisions_persist_and_replay(tmp_path):
    """VERDICT r4 #5: the first (measured) run writes its decision table;
    later runs REPLAY it without timing — identical structure even under a
    timer that would flip every decision."""
    path = str(tmp_path / "decisions.json")
    model, variables = _tiny_mscan()
    res = arbitrated_apply(model, variables, FfnRep(fix=True), [],
                           (2, 32, 32, 3), verbose=False,
                           decisions_path=path,
                           time_fn=_fake_timer({0: -0.2, 1: -0.1,
                                                2: 0.5, 3: 0.5}))
    assert res["kept_applied"] == 2 and "replayed" not in res
    import json
    saved = json.load(open(path))
    assert sorted(saved.values()) == ["applied", "applied",
                                     "original", "original"]

    def poisoned(*a, **k):
        raise AssertionError("replay must not re-time")

    m2, v2 = _tiny_mscan()
    res2 = arbitrated_apply(m2, v2, FfnRep(fix=True), [],
                            (2, 32, 32, 3), verbose=False,
                            decisions_path=path, time_fn=poisoned)
    assert res2["replayed"] and res2["decisions"] == saved
    kept2 = {l["name"]: l["kept"] for l in res2["layers"]}
    assert kept2 == {l["name"]: l["kept"] for l in res["layers"]}
    assert isinstance(m2.get_switchable_module(0), MergedFFN)
    assert not isinstance(m2.get_switchable_module(2), MergedFFN)
    # the replayed surface is the exact same function as the measured one
    x = jax.random.normal(jax.random.key(5), (2, 32, 32, 3))
    np.testing.assert_allclose(_logits(m2, v2, x),
                               _logits(model, variables, x),
                               rtol=1e-5, atol=1e-5)

    # retime=True ignores the persisted table and re-measures
    m3, v3 = _tiny_mscan()
    res3 = arbitrated_apply(m3, v3, FfnRep(fix=True), [],
                            (2, 32, 32, 3), verbose=False, retime=True,
                            decisions_path=path,
                            time_fn=_fake_timer({i: 0.5 for i in range(4)}))
    assert res3["kept_applied"] == 0
    assert json.load(open(path)) == res3["decisions"]  # re-persisted


def test_boundary_band_remeasures_noisy_sites():
    """A group landing within the boundary band of the keep threshold is
    re-measured once; the min decides (variance guard)."""
    model, variables = _tiny_mscan()
    calls = {"n": 0}

    # call sequence with one group: (1) all-applied 1.2 (loses outright),
    # (2) all-original 1.0, (3) group probe 0.965 — wins but sits inside
    # the 2% band of the 0.97 threshold -> re-measured, (4) 0.90
    seq = iter([1.2, 1.0, 0.965, 0.90])

    def time_fn(m, v, shape, dtype):
        calls["n"] += 1
        return next(seq)

    res = arbitrated_apply(model, variables, FfnRep(fix=True), [],
                           (2, 32, 32, 3), verbose=False,
                           group_fn=lambda n: "all", time_fn=time_fn)
    # the single group was measured twice (band re-measure) and kept
    assert res["kept_applied"] == 4
    assert abs(res["t_final"] - 0.90) < 1e-9
