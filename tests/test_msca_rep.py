"""MSCA re-parameterization correctness.

Golden anchors for the border-bias algebra (SURVEY.md §7 hard part #1):

* the pure-bias response of the original cascade bank (x = 0) must equal the
  merged center bias + border residuals row-for-row — an exact check of
  ``sum_bias`` / ``merge_res`` sign conventions;
* the merged decomp=0 kernel must match the original MSCA forward exactly on
  interior rows (the x-term is exact at distance >= p from the top/bottom
  edge), with the ``fix`` residuals correcting the bias part at the borders.
"""

import jax
import jax.numpy as jnp
import numpy as np

from convnet_approximater_tpu.core import MscaRep, MscaProfile
from convnet_approximater_tpu.core.msca_rep import get_equivalent_kernel, merge_res, sum_bias
from convnet_approximater_tpu.layers import MSCA, MSCAProfile, ParallelConv
from convnet_approximater_tpu.layers.depth_separable_conv import CascadeConv
from convnet_approximater_tpu.nn import Sequential


def _msca(C=6, k1=5, k_sizes=(3, 5, 7), key=0):
    msca = MSCA(C, k1, k_sizes)
    params = msca.init(jax.random.key(key))
    return msca, params


def test_sum_bias_matches_bruteforce():
    """Bias-only response of one cascade == center bias + residuals."""
    C, k, H, W = 3, 7, 12, 10
    p = k // 2
    cc = CascadeConv(C, k, p, bias=True, first_bias=True)
    params = cc.init(jax.random.key(0))
    x = jnp.zeros((1, H, W, C))
    y, _, _ = cc.apply(params, x)
    w2 = jnp.transpose(params["conv2"]["weight"], (3, 2, 0, 1))  # (C, 1, k, 1)
    center, res = sum_bias(w2, params["conv1"]["bias"], params["conv2"]["bias"])
    # predicted rows: center everywhere + res at borders
    pred = jnp.broadcast_to(center, (H, C)).copy()
    pred = pred.at[:p, :].add(jnp.transpose(res[0]))
    pred = pred.at[H - p:, :].add(jnp.transpose(res[1]))
    # columns are uniform (vertical conv only): check every column
    np.testing.assert_allclose(np.asarray(y[0, :, 0, :]), np.asarray(pred), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y[0, :, W - 1, :]), np.asarray(pred), rtol=1e-5, atol=1e-6)


def test_equivalent_kernel_bias_response():
    """Full bank (multi-k + identity): zero-input response must equal merged
    bias + merged residuals."""
    C, k_sizes = 4, (3, 5, 7)
    pc = ParallelConv(C, list(k_sizes), [k // 2 for k in k_sizes], len(k_sizes),
                      all_bias=True, identity=True)
    params = pc.init(jax.random.key(1))
    H, W = 14, 9
    y, _, _ = pc.apply(params, jnp.zeros((1, H, W, C)))
    weight, bias, res = get_equivalent_kernel(pc, params)
    p = weight.shape[-1] // 2
    pred = jnp.broadcast_to(bias, (H, C)).copy()
    pred = pred.at[:p, :].add(jnp.transpose(res[0]))
    pred = pred.at[H - p:, :].add(jnp.transpose(res[1]))
    np.testing.assert_allclose(np.asarray(y[0, :, W // 2, :]), np.asarray(pred), rtol=1e-5, atol=1e-6)


def test_msca_rep_d0_interior_exact():
    C, k_sizes = 6, (3, 5, 7)
    p = max(k_sizes) // 2
    msca, mparams = _msca(C=C, k_sizes=k_sizes, key=2)
    app = MscaRep(decomp=0, fix=True)
    sub, sparams = app.initialize(msca, mparams, jax.random.key(3))
    app.optimize(sub, sparams)
    x = jax.random.normal(jax.random.key(4), (2, 20, 20, C))
    y_old, _, _ = sub.old_module.apply(sparams["old"], x)
    y_new, _, _ = sub.new_module.apply(sparams["new"], x)
    assert y_new.shape == y_old.shape
    # interior rows exact (all columns: horizontal composition is exact)
    interior_old = y_old[:, p:-p, :, :]
    interior_new = y_new[:, p:-p, :, :]
    rel = float(jnp.linalg.norm(interior_old - interior_new) / jnp.linalg.norm(interior_old))
    assert rel < 1e-5, rel
    # border rows: fix corrects the bias part; the x-term error remains but
    # must be small relative to the signal
    rel_all = float(jnp.linalg.norm(y_old - y_new) / jnp.linalg.norm(y_old))
    assert rel_all < 0.35


def test_msca_rep_d0_nofix_bias_error_at_border():
    """Without fix the border rows keep the bias residual (sanity: fix=True
    must be at least as accurate as fix=False)."""
    C, k_sizes = 4, (3, 5)
    msca, mparams = _msca(C=C, k_sizes=k_sizes, key=5)
    x = jax.random.normal(jax.random.key(6), (1, 16, 16, C))
    y_old, _, _ = msca.apply(mparams, x)
    errs = {}
    for fix in (False, True):
        app = MscaRep(decomp=0, fix=fix)
        sub, sparams = app.initialize(msca, mparams, jax.random.key(7))
        app.optimize(sub, sparams)
        y_new, _, _ = sub.new_module.apply(sparams["new"], x)
        errs[fix] = float(jnp.linalg.norm(y_old - y_new))
    assert errs[True] <= errs[False]


def test_msca_rep_d1_and_d2_shapes_and_quality():
    C, k_sizes = 6, (3, 5, 7)
    msca, mparams = _msca(C=C, k_sizes=k_sizes, key=8)
    x = jax.random.normal(jax.random.key(9), (2, 18, 18, C))
    y_old, _, _ = msca.apply(mparams, x)
    prev = None
    for d in (1, 2, 4):
        app = MscaRep(decomp=d, fix=True)
        sub, sparams = app.initialize(msca, mparams, jax.random.key(10))
        app.optimize(sub, sparams)
        y_new, _, _ = sub.new_module.apply(sparams["new"], x)
        assert y_new.shape == y_old.shape
        err = float(jnp.linalg.norm(y_old - y_new) / jnp.linalg.norm(y_old))
        if prev is not None:
            assert err <= prev + 5e-2  # more branches -> no worse
        prev = err


def test_msca_rep_d4_near_exact_interior():
    """decomp=4 on a (3,5)-bank: merged kernel of rank <= ~4 per channel is
    captured almost exactly by 4 rank-1 branches."""
    C, k_sizes = 4, (3, 5)
    p = max(k_sizes) // 2
    msca, mparams = _msca(C=C, k_sizes=k_sizes, key=11)
    app = MscaRep(decomp=4, fix=True)
    sub, sparams = app.initialize(msca, mparams, jax.random.key(12))
    app.optimize(sub, sparams)
    x = jax.random.normal(jax.random.key(13), (1, 16, 16, C))
    y_old, _, _ = sub.old_module.apply(sparams["old"], x)
    y_new, _, _ = sub.new_module.apply(sparams["new"], x)
    interior = slice(p, -p)
    rel = float(
        jnp.linalg.norm(y_old[:, interior, :, :] - y_new[:, interior, :, :])
        / jnp.linalg.norm(y_old[:, interior, :, :])
    )
    assert rel < 1e-4, rel


def test_msca_profile_swap_identity():
    msca, mparams = _msca(key=14)
    app = MscaProfile()
    sub, sparams = app.initialize(msca, mparams, jax.random.key(15))
    assert isinstance(sub.new_module, MSCAProfile)
    x = jax.random.normal(jax.random.key(16), (1, 12, 12, 6))
    y_old, _, _ = sub.old_module.apply(sparams["old"], x)
    y_new, _, _ = sub.new_module.apply(sparams["new"], x)
    np.testing.assert_allclose(np.asarray(y_old), np.asarray(y_new), rtol=1e-5, atol=1e-6)


def test_msca_rep_decomp_conv0():
    """Extension: rank-1 conv0 decomposition — exact when conv0 is rank-1."""
    from convnet_approximater_tpu.layers.depth_separable_conv import CascadeConv

    C, k_sizes = 4, (3, 5)
    msca, mparams = _msca(C=C, k_sizes=k_sizes, key=20)
    # force conv0 to a rank-1 kernel so the decomposition is exact
    v = jax.random.normal(jax.random.key(21), (C, 5))
    h = jax.random.normal(jax.random.key(22), (C, 5))
    w0 = jnp.einsum("ci,cj->ijc", v, h)[:, :, None, :]  # HWIO (5,5,1,C) rank-1
    mparams["conv0"]["weight"] = w0
    app = MscaRep(decomp=4, fix=True, decomp_conv0=True)
    sub, sparams = app.initialize(msca, mparams, jax.random.key(23))
    assert isinstance(sub.new_module.conv0, CascadeConv)
    app.optimize(sub, sparams)
    x = jax.random.normal(jax.random.key(24), (1, 16, 16, C))
    y_old, _, _ = sub.old_module.apply(sparams["old"], x)
    y_new, _, _ = sub.new_module.apply(sparams["new"], x)
    p = max(k_sizes) // 2 + 2  # bank border + conv0 border
    sl = slice(p, -p)
    interior_rel = float(
        jnp.linalg.norm(y_old[:, sl, sl, :] - y_new[:, sl, sl, :])
        / jnp.linalg.norm(y_old[:, sl, sl, :])
    )
    assert interior_rel < 1e-3, interior_rel


def test_mix_merge_matches_standard_path():
    """The mix-merge execution strategy (vertical conv folded into
    channel_mix as one dense conv) must reproduce the standard lax path on
    the post-rep d1+fix structure, borders and bias included."""
    from convnet_approximater_tpu.core import MscaRep

    C = 8
    msca, params = _msca(C=C, k1=5, k_sizes=(3, 5, 7), key=2)
    app = MscaRep(decomp=1, fix=True)
    sub, sp = app.initialize(msca, params)
    app.optimize(sub, sp)
    tgt, tp = app.postprocess(sub, sp)
    x = jax.random.normal(jax.random.key(9), (2, 12, 10, C))
    tgt.mix_merge = "off"
    y_ref, _, _ = tgt.apply(tp, x, training=False)
    tgt.mix_merge = "on"
    y_mrg, _, _ = tgt.apply(tp, x, training=False)
    np.testing.assert_allclose(np.asarray(y_mrg), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


def test_mix_merge_not_used_in_training_or_on_bank():
    """Gating: training mode and the original ParallelConv bank must take
    the standard path (merge only dispatches on CascadeConv at inference)."""
    from convnet_approximater_tpu.nn import Ctx

    msca, params = _msca(C=4, k1=5, k_sizes=(3, 5), key=3)
    msca.mix_merge = "on"
    assert msca._mix_merge_parts() is None  # bank: no merge possible
    from convnet_approximater_tpu.core import MscaRep

    app = MscaRep(decomp=1, fix=True)
    sub, sp = app.initialize(msca, params)
    app.optimize(sub, sp)
    tgt, tp = app.postprocess(sub, sp)
    tgt.mix_merge = "on"
    assert tgt._mix_merge_parts() is not None
    ctx_train = Ctx(training=True)
    assert not tgt._can_mix_merge(ctx_train)


def test_deploy_cascade_prefers_strip_matmul(monkeypatch):
    """MscaRep's deploy-form d1 cascade opts into the MXU strip lowering;
    the original multi-branch bank keeps the lax path (measured policy,
    doc/perf-notes.md) — and both lowerings agree numerically."""
    import jax

    from convnet_approximater_tpu.core import MscaRep
    from convnet_approximater_tpu.layers import MSCA
    from convnet_approximater_tpu.layers.depth_separable_conv import CascadeConv
    from convnet_approximater_tpu.nn.module import Ctx

    src = MSCA(16, 5, (7, 11, 21))
    params = src.init(jax.random.key(0))
    # original bank branches: default lax
    for _, b in src.sd_convs.branches.named_children():
        if isinstance(b, CascadeConv):
            assert not b.conv1.strip_matmul and not b.conv2.strip_matmul
    app = MscaRep(decomp=1, fix=True, deploy=False)
    sub, sp = app.initialize(src, params, jax.random.key(1))
    app.optimize(sub, sp)
    mod, new_params = app.postprocess(sub, sp)
    cascade = mod.sd_convs[0]
    assert isinstance(cascade, CascadeConv)
    assert cascade.conv1.strip_matmul and cascade.conv2.strip_matmul

    x = jax.random.normal(jax.random.key(2), (2, 24, 24, 16))
    y_lax = mod.apply(new_params, x)[0]
    # force the backend check to pass so the einsum path actually runs on CPU
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    y_mm = mod.apply(new_params, x)[0]
    np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_lax),
                               rtol=2e-5, atol=2e-5)
