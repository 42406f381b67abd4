"""Class-activation-map methods, pure JAX (no pytorch_grad_cam).

The reference dispatches ~11 CAM variants from the ``pytorch_grad_cam``
library (``/root/reference/scripts/visualization/cam.py:13-26``); here each
is a small function over the captured feature map ``feats`` (NHWC, batch 1)
and, for the gradient family, the exact class-score gradients ``grads``
(same shape) that ``scripts/visualization/cam.py`` computes by functionally
overriding the block output — no hook recompute, no library.

Gradient family: gradcam, gradcam_pp, hirescam, gradcam_elementwise,
xgradcam, layercam, eigengradcam.
Gradient-free family: eigencam (PCA of the activations), scorecam (masked
re-forwards), ablationcam (per-channel knockout re-forwards) — the
analytically distinct ones the reference exposed.

All return an (H, W) non-negative heatmap (un-normalized; callers
normalize for display).  ``CAM_METHODS`` maps CLI names to functions with
their calling convention ('grad' / 'feat' / 'score').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _combine(feats, weights):
    """relu(sum_c w_c * A_c) for per-channel weights (C,)."""
    return jax.nn.relu(jnp.sum(feats[0] * weights, axis=-1))


# ---------------------------------------------------------------------------
# gradient family
# ---------------------------------------------------------------------------

def gradcam(feats, grads):
    """Selvaraju et al.: channel weights are the GAP of the gradients."""
    w = jnp.mean(grads[0], axis=(0, 1))
    return _combine(feats, w)


def gradcam_pp(feats, grads):
    """Grad-CAM++ (Chattopadhay et al.): per-pixel alpha weights from the
    closed form ``g^2 / (2 g^2 + sum_ab(A) * g^3)`` so multiple instances
    of a class all light up; reduces to Grad-CAM's ranking when the
    gradient is a single positive spike (golden test)."""
    g = grads[0]
    g2, g3 = g * g, g * g * g
    denom = 2.0 * g2 + jnp.sum(feats[0], axis=(0, 1), keepdims=True) * g3
    alpha = jnp.where(jnp.abs(denom) > 1e-12, g2 / denom, 0.0)
    w = jnp.sum(alpha * jax.nn.relu(g), axis=(0, 1))
    return _combine(feats, w)


def hirescam(feats, grads):
    """HiResCAM: elementwise product, summed over channels — no GAP, so
    the map is faithful to the exact gradient locations."""
    return jax.nn.relu(jnp.sum(grads[0] * feats[0], axis=-1))


def gradcam_elementwise(feats, grads):
    """Grad-CAM-ElementWise: relu the elementwise product BEFORE the
    channel sum."""
    return jnp.sum(jax.nn.relu(grads[0] * feats[0]), axis=-1)


def xgradcam(feats, grads):
    """XGrad-CAM: weights are the activation-normalized gradient sums
    ``sum_ij(g * A) / sum_ij(A)``."""
    a = feats[0]
    num = jnp.sum(grads[0] * a, axis=(0, 1))
    den = jnp.sum(a, axis=(0, 1)) + 1e-8
    return _combine(feats, num / den)


def layercam(feats, grads):
    """LayerCAM: positive gradients gate the activations per pixel."""
    return jax.nn.relu(jnp.sum(jax.nn.relu(grads[0]) * feats[0], axis=-1))


def _eigen_heat(maps):
    """Projection of (H, W, C) maps onto their first principal component
    (sign-fixed so the heat is mostly positive)."""
    h, w, c = maps.shape
    m = maps.reshape(h * w, c)
    m = m - jnp.mean(m, axis=0, keepdims=True)
    _, _, vt = jnp.linalg.svd(m, full_matrices=False)
    proj = (m @ vt[0]).reshape(h, w)
    proj = jnp.where(jnp.sum(proj) >= 0, proj, -proj)
    return jax.nn.relu(proj)


def eigencam(feats, grads=None):
    """EigenCAM: first principal component of the activations — class-
    agnostic, gradient-free."""
    return _eigen_heat(feats[0])


def eigengradcam(feats, grads):
    """EigenGradCAM: PCA of the gradient-weighted activations (class-
    discriminative EigenCAM)."""
    return _eigen_heat(feats[0] * grads[0])


# ---------------------------------------------------------------------------
# gradient-free re-forward family
# ---------------------------------------------------------------------------

def scorecam(feats, x, class_prob_fn, chunk: int = 32):
    """Score-CAM (Wang et al.): each channel's normalized activation,
    upsampled to the input size, masks the input; the masked forward's
    class probability is that channel's weight (softmax over channels).
    Gradient-free — ``class_prob_fn(x_batch) -> (B,)`` runs the full model.
    """
    a = feats[0]
    h, w, c = a.shape
    hi, wi = x.shape[1], x.shape[2]
    masks = jax.image.resize(a, (hi, wi, c), method="bilinear")
    lo = jnp.min(masks, axis=(0, 1), keepdims=True)
    hi_ = jnp.max(masks, axis=(0, 1), keepdims=True)
    masks = (masks - lo) / (hi_ - lo + 1e-8)  # (Hi, Wi, C) in [0, 1]
    masked = x * jnp.moveaxis(masks, -1, 0)[:, :, :, None]  # (C, Hi, Wi, 3)

    def batch_scores(xs):
        return class_prob_fn(xs)

    scores = jax.lax.map(lambda xb: batch_scores(xb[None])[0],
                         masked, batch_size=chunk)
    w_c = jax.nn.softmax(scores)
    return _combine(feats, w_c)


def ablationcam(feats, override_score_fn, chunk: int = 32):
    """AblationCAM: weight_c = (S - S_{c ablated}) / |S| — the fractional
    score drop when channel c is zeroed.  Gradient-free;
    ``override_score_fn(y) -> scalar`` re-runs the model with the block
    output overridden by ``y`` (the same hook Grad-CAM uses for exact
    gradients)."""
    c = feats.shape[-1]
    base = override_score_fn(feats)

    def drop(idx):
        ablated = feats * (1.0 - jax.nn.one_hot(idx, c))
        return override_score_fn(ablated)

    scores = jax.lax.map(drop, jnp.arange(c), batch_size=chunk)
    w = (base - scores) / (jnp.abs(base) + 1e-8)
    return _combine(feats, w)


# ---------------------------------------------------------------------------
# full-gradient decomposition (whole-model, not per-block)
# ---------------------------------------------------------------------------

def fullgrad(model, variables, x, class_idx, include_input: bool = True):
    """FullGrad saliency (Srinivas & Fleuret, NeurIPS 2019) — the last
    reference CAM with no counterpart (``pytorch_grad_cam.FullGrad``,
    ``/root/reference/scripts/visualization/cam.py:22`` wired at
    ``:214-224``).

    Exact decomposition for ReLU-style nets:
    ``f(x) = <grad_x f, x> + sum_l <grad_{b_l} f, b_l>`` — the saliency sums
    the input-gradient term with every layer's per-position bias-gradient
    map: ``S = psi(grad_x f . x) + sum_l sum_c psi(grad_{z_l} f . b_l)``
    where ``psi`` = abs -> bilinear upsample to the input -> per-map
    min-max normalize.

    Unlike the per-block methods this needs the gradient of the class score
    w.r.t. EVERY bias-carrying layer's *output* (the broadcast bias makes
    ``grad_{b_l}`` per-position).  JAX-natively that is one ``jax.grad``
    over a dict of zero additive taps injected at each ``Conv2d`` /
    ``BatchNorm2d`` output (BN's implicit bias is
    ``beta - mean * scale / sqrt(var + eps)``, per the paper's Sec. 3.3).
    Non-spatial layers (Linear) carry no spatial map and are skipped, as in
    the reference library.  Scan-over-blocks collapses per-block paths —
    callers unroll first (``model.scan_blocks = 'off'``); scan-internal
    sites (tracer outputs) are skipped defensively.

    Returns an (H, W) heatmap at the input resolution.
    """
    hi, wi = x.shape[1], x.shape[2]
    g_x, bias_terms = fullgrad_terms(model, variables, x, class_idx)

    def _psi(maps):  # (h, w, C) -> (hi, wi): abs, upsample, per-map norm, sum
        m = jnp.abs(maps.astype(jnp.float32))
        m = jax.image.resize(m, (hi, wi, m.shape[-1]), method="bilinear")
        lo = jnp.min(m, axis=(0, 1), keepdims=True)
        hi_ = jnp.max(m, axis=(0, 1), keepdims=True)
        return jnp.sum((m - lo) / (hi_ - lo + 1e-8), axis=-1)

    heat = jnp.zeros((hi, wi), jnp.float32)
    if include_input:
        heat = heat + _psi(g_x[0] * x[0])
    for g, b in bias_terms.values():
        heat = heat + _psi(g[0] * b)
    return heat


def fullgrad_terms(model, variables, x, class_idx):
    """The raw full-gradient decomposition: ``(grad_x f, {path: (grad_z f,
    effective_bias)})``.  For ReLU-style nets these satisfy the paper's
    Proposition 1 (completeness): ``f(x) = <grad_x f, x> + sum_l
    <grad_{z_l} f, broadcast(b_l)>`` — the closed-form anchor the sanity
    test checks."""
    from convnet_approximater_tpu import nn as _nn

    state = variables.get("state", {})
    sites = {}  # dotted path -> (output shape, effective bias (C,))
    holder = {"taps": None, "discover": True}
    conv_t, bn_t = _nn.Conv2d, _nn.BatchNorm2d
    origs = {t: t.__call__ for t in (conv_t, bn_t)}

    def _make(t, orig):
        def patched(self_, params, xx, ctx, **kw):
            y = orig(self_, params, xx, ctx, **kw)
            path = ".".join(ctx._path)
            if holder["discover"]:
                b = None
                if t is conv_t:
                    b = params.get("bias") if isinstance(params, dict) else None
                else:  # BN: implicit bias from running stats (eval mode)
                    st = ctx.get_state()
                    b = params["bias"] - st["mean"] * jax.lax.rsqrt(
                        st["var"] + self_.eps) * params["scale"]
                if (b is not None and y.ndim == 4
                        and not isinstance(y, jax.core.Tracer)):
                    sites[path] = (y.shape, b)
            else:
                tap = holder["taps"].get(path)
                if tap is not None:
                    y = y + tap
            return y

        return patched

    for t, orig in origs.items():
        t.__call__ = _make(t, orig)
    try:
        model.apply(variables["params"], x, state=state, training=False)
        holder["discover"] = False

        def score(taps, xv):
            holder["taps"] = taps
            y, _, _ = model.apply(variables["params"], xv, state=state,
                                  training=False)
            return y[0, class_idx]

        zeros = {p: jnp.zeros(s, jnp.float32) for p, (s, _) in sites.items()}
        g_taps, g_x = jax.grad(score, argnums=(0, 1))(zeros, x)
    finally:
        for t, orig in origs.items():
            t.__call__ = orig

    return g_x, {p: (g_taps[p], sites[p][1]) for p in sites}


# name -> (fn, convention): 'grad' takes (feats, grads); 'feat' takes
# (feats); 'score'/'override' need model re-forwards (wired in the script);
# 'model' takes the whole (model, variables, x, class) — no block choice
CAM_METHODS = {
    "gradcam": (gradcam, "grad"),
    "gradcam++": (gradcam_pp, "grad"),
    "hirescam": (hirescam, "grad"),
    "gradcam-elementwise": (gradcam_elementwise, "grad"),
    "xgradcam": (xgradcam, "grad"),
    "layercam": (layercam, "grad"),
    "eigengradcam": (eigengradcam, "grad"),
    "eigencam": (eigencam, "feat"),
    "scorecam": (scorecam, "score"),
    "ablationcam": (ablationcam, "override"),
    "fullgrad": (fullgrad, "model"),
}
