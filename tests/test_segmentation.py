"""SegNeXt segmentation: head shapes, NMF properties, msca-rep pipeline
compatibility (the switchable machinery must cover the backbone unchanged)."""

import jax
import jax.numpy as jnp

from convnet_approximater_tpu.segmentation import SegNeXt, nmf2d, upsample_logits

KEY = jax.random.PRNGKey(0)


def _tiny_segnext(**kw):
    kw.setdefault("num_channels", (8, 12, 16, 20))
    kw.setdefault("num_blocks", (1, 1, 2, 1))
    kw.setdefault("exp_ratios", (2, 2, 2, 2))
    kw.setdefault("num_classes", 7)
    kw.setdefault("ham_channels", 16)
    kw.setdefault("ham_rank", 4)
    kw.setdefault("ham_iters", 3)
    return SegNeXt(**kw)


def test_nmf_low_rank_reconstruction():
    x = jax.nn.relu(jax.random.normal(KEY, (2, 36, 12)))
    y = nmf2d(x, rank=4, iters=10)
    assert y.shape == x.shape
    assert bool(jnp.all(y >= -1e-6))  # nonneg factors -> nonneg recon
    # reconstruction should correlate with the input far better than zero
    err = float(jnp.linalg.norm(y - x) / jnp.linalg.norm(x))
    assert err < 0.9, err
    # rank bound: the (N, C) recon has at most `rank` singular values
    s = jnp.linalg.svd(y[0].astype(jnp.float32), compute_uv=False)
    assert float(s[4]) < 1e-3 * float(s[0])


def test_segnext_forward_shapes():
    model = _tiny_segnext()
    variables = {"params": model.init(KEY), "state": model.init_state()}
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    y, _, _ = model.apply(variables["params"], x, state=variables["state"],
                          training=False)
    assert y.shape == (2, 8, 8, 7)  # 1/8 resolution logits
    assert bool(jnp.all(jnp.isfinite(y)))
    up = upsample_logits(y, (64, 64))
    assert up.shape == (2, 64, 64, 7)


def test_segnext_train_step_differentiable():
    model = _tiny_segnext()
    variables = {"params": model.init(KEY), "state": model.init_state()}
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    labels = jnp.zeros((2, 4, 4), jnp.int32)

    def loss_fn(params):
        y, _, _ = model.apply(params, x, state=variables["state"],
                              training=True, rng=KEY)
        logp = jax.nn.log_softmax(y.astype(jnp.float32))
        onehot = jax.nn.one_hot(labels, y.shape[-1])
        return -jnp.mean(jnp.sum(logp * onehot, axis=-1))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert jnp.isfinite(loss)
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0  # the one-step NMF gradient path is live


def test_segnext_mscarep_pipeline():
    """register -> MscaRep d1+fix -> forward: the switchable machinery covers
    the segmentation model unchanged."""
    from convnet_approximater_tpu.core import MscaRep

    model = _tiny_segnext()
    variables = {"params": model.init(KEY), "state": model.init_state()}
    app = MscaRep(decomp=1, fix=True)
    from bench import run_pipeline  # the same driver bench/demo scripts use

    model, variables = run_pipeline(model, variables, app, [])
    assert model.length_switchable == sum((1, 1, 2, 1))  # one MSCA per block
    x = jax.random.normal(KEY, (1, 32, 32, 3))
    y, _, _ = model.apply(variables["params"], x, state=variables["state"],
                          training=False)
    assert y.shape == (1, 4, 4, 7)
    assert bool(jnp.all(jnp.isfinite(y)))
