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
