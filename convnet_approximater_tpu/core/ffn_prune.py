"""FfnPrune / MlpPrune: structured hidden-channel pruning of MLP blocks.

Framework extension beyond the reference (its approximaters only
*factorize* kernels — ``/root/reference/src/approx/core/low_rank_exp.py``,
``msca_rep.py``); this adds the channel-pruning line of the same
approximate-then-finetune literature (He et al., "Channel Pruning for
Accelerating Very Deep Neural Networks", ICCV'17; Luo et al., "ThiNet",
ICCV'17) where it maps best to the TPU: an MLP hidden dim ``M`` is the
output dim of the expansion and the reduction dim of the projection —
pure MXU matmuls — so keeping ``k < M`` hidden channels cuts the
dominant MXU terms by ``k/M`` with ZERO layout or gather penalty:
unlike the grouped-conv schemes (measured 0.37-0.65x, doc/perf-notes.md)
the pruned op is the SAME dense op, just smaller.

Two registered apps share the machinery via the template hooks at the
bottom of :class:`FfnPrune`:

* ``FfnPrune`` — MSCAN's conv-FFN (``fc1 1x1 -> dw 3x3 -> GELU -> fc2
  1x1``); MSCAN carries exp_ratio 8/8/4/4, so this is where its FLOPs
  live.
* ``MlpPrune`` — ConvNeXt's block MLP (``pwconv1 -> GELU -> pwconv2``
  Linears at 4x expansion); substitutes the whole block (dwconv / norm /
  gamma carried), shrinking only the MLP width.

Selection + solve (per substituted site):

* structure (``k``) is fixed at ``initialize`` from weight-only channel
  importance (the product of the norms touching channel m) — via
  ``keep`` / ``keep_ratio`` / ``energy`` (smallest k whose normalized
  cumulative importance energy >= tau, the same convention as
  V1/V3/V4/DwSepRep's ``energy``);
* with a :class:`~convnet_approximater_tpu.hooks.CalibrationHook`
  (``calibration_stat = "raw"``), ``optimize`` selects the kept set by
  GREEDY FORWARD SELECTION on the measured hidden covariance (OMP —
  the greedy stand-in for He et al.'s LASSO: per-channel magnitude
  ranking is blind to redundancy between channels, greedy maximizes the
  output variance the refit can explain; ``h`` = the post-GELU hidden
  activation on the calibration batches, centered because the refit's
  intercept absorbs any dropped channel's mean — a near-constant channel
  is free) and then REFITS the projection in closed form — the
  least-squares reconstruction of He et al.'s eq. (1): minimize
  ``E||(W2 h + b2) - (W2' h_S + b2')||^2`` over the calibration
  distribution, solved by the augmented normal equations with the hidden
  second moment ``G = E[h h^T]`` and mean ``mu = E[h]``.  Without
  calibration it falls back to weight-ranked plain slicing.

Exact at ``k = M`` (the kept set is the identity in ascending order and
the refit's normal equations return ``W2, b2`` up to the ridge);
accuracy at ``k < M`` recovers through the standard ``L2Reconstruct``
fine-tune, exactly like the factorization apps.  Because the target is
the same module type, the pruned site composes with ``FfnRep`` (merge
the pruned fc1+dconv into one dense MXU conv), BN fold, bf16 casting,
int8 PTQ, and the deploy arbiters unchanged.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from convnet_approximater_tpu.layers import Substitution
from convnet_approximater_tpu.models.convnext import ConvNeXtBlock
from convnet_approximater_tpu.models.mscan import FFN, SpatialAttention
from convnet_approximater_tpu.nn import Ctx
from convnet_approximater_tpu.nn.layers import GELU
from convnet_approximater_tpu.utils.logger import get_logger

from .approximater import APP, Approximater


def _greedy_select(K, T, k: int, eps: float = 1e-12):
    """Greedy forward selection (orthogonal matching pursuit on the hidden
    covariance): pick ``k`` channels maximizing the output variance the
    refit can explain.

    ``K``: (M, M) centered covariance of the hidden channels;
    ``T``: (M, C) cross-covariance to the target outputs ``y = W2^T h``.
    Per-channel magnitude ranking is blind to redundancy BETWEEN channels
    (two duplicates both rank high, yet keeping both wastes a slot) —
    this is the greedy stand-in for He et al.'s LASSO selection, exact
    for the same objective the projection refit optimizes.  Returns the
    kept set (ascending) and the explained-variance sum.
    """
    R = np.array(K, np.float64, copy=True)
    Tr = np.array(T, np.float64, copy=True)
    sel: list = []
    explained = 0.0
    for _ in range(k):
        d = np.diag(R).copy()
        floor = eps * max(float(np.max(d, initial=0.0)), 1e-30)
        gains = np.where(d > floor,
                         (Tr ** 2).sum(axis=1) / np.maximum(d, floor),
                         -np.inf)
        if sel:
            gains[np.array(sel)] = -np.inf
        j = int(np.argmax(gains))
        if not np.isfinite(gains[j]) or gains[j] <= 0.0:
            # target fully explained (or only degenerate channels left):
            # fill the remaining slots by residual variance
            order = np.argsort(-d, kind="stable")
            rest = [int(i) for i in order if i not in sel][: k - len(sel)]
            sel.extend(rest)
            break
        sel.append(j)
        explained += float(gains[j])
        col = R[:, j].copy()
        Tr -= np.outer(col / d[j], Tr[j])
        R -= np.outer(col, col) / d[j]
    return np.sort(np.asarray(sel[:k], dtype=np.int64)), explained


@APP.register_module()
class FfnPrune(Approximater):
    _src_type = FFN
    _tgt_type = FFN
    # CalibrationHook streams the raw substitution-input maps (not a
    # moment): the hidden moments live BEHIND the expansion + GELU, so
    # they cannot be derived from any input second moment analytically
    calibration_stat = "raw"

    def __init__(self, keep=None, keep_ratio=None, energy: float = None,
                 refit: bool = True, ridge: float = 1e-6,
                 round_to: int = None, deploy: bool = False):
        super().__init__(deploy=deploy)
        given = sum(x is not None for x in (keep, keep_ratio, energy))
        assert given == 1, "give exactly one of keep / keep_ratio / energy"
        # round_to: snap the kept width to a multiple (MEASURED, MSCAN-t
        # b=64 bf16, doc/perf-notes.md: keep_ratio 0.75 of a 256-wide FFN
        # leaves 192 channels = 1.5 MXU tiles, which pads back to 2 — the
        # matmuls run at 256-width cost and only the elementwise work
        # shrinks, 1.04x; 0.5 -> 128 tiles exactly, 1.21x.  128 matches
        # the MXU/lane width; 0 / None disables)
        assert round_to is None or round_to >= 1
        if energy is not None:
            assert 0.0 < energy <= 1.0
        if keep_ratio is not None and not isinstance(keep_ratio, (list, tuple)):
            assert 0.0 < keep_ratio <= 1.0
        self.keep = tuple(keep) if isinstance(keep, (list, tuple)) else keep
        self.keep_ratio = (tuple(keep_ratio)
                           if isinstance(keep_ratio, (list, tuple))
                           else keep_ratio)
        self.energy = energy
        self.refit = refit
        self.ridge = ridge
        self.round_to = round_to
        self._init_curr = 0   # per-layer cursor for tuple keep/keep_ratio
        self._opt_curr = 0    # pairs optimize() calls with calibration taps
        self._raw = {}

    def set_calibration(self, index: int, x):
        self._raw[index] = x

    def rewind(self):
        self._init_curr = 0
        self._opt_curr = 0

    # -- structure ------------------------------------------------------
    def _num_keep(self, src, src_params: dict) -> int:
        M = self._hidden_dim(src)
        if self.energy is not None:
            imp = np.asarray(self._weight_imp(src_params))
            e = np.sort(imp ** 2)[::-1]
            cum = np.cumsum(e) / max(float(e.sum()), 1e-30)
            k = int(np.searchsorted(cum, self.energy)) + 1
            k = self._round(min(k, M), M)
            get_logger().info(f"auto keep: {k}/{M} "
                              f"(importance energy >= {self.energy})")
            return k
        if self.keep is not None:
            k = self.keep if isinstance(self.keep, int) \
                else self.keep[self._init_curr]
        else:
            r = self.keep_ratio if isinstance(self.keep_ratio, float) \
                else self.keep_ratio[self._init_curr]
            k = int(round(M * r))
        assert 1 <= k <= M, f"keep {k} out of range for hidden dim {M}"
        return self._round(k, M)

    def _round(self, k: int, M: int) -> int:
        if not self.round_to or M <= self.round_to:
            return k
        r = self.round_to
        return min(M, max(r, int(round(k / r)) * r))

    def initialize(self, src, src_params, rng=None):
        self._k = self._num_keep(src, src_params)
        return super().initialize(src, src_params, rng)

    def _fix_substitution(self, sub: Substitution, params: dict):
        self._init_curr += 1

    # -- solve ----------------------------------------------------------
    def optimize(self, sub: Substitution, params: dict):
        logger = get_logger()
        index = self._opt_curr
        self._opt_curr += 1
        old, new = params["old"], params["new"]
        src = sub.old_module
        M, k = self._hidden_dim(src), self._hidden_dim(sub.new_module)
        W2, b2, dt = self._consumer(old)   # (M, C) f32, (C,) f32, out dtype
        n2sq = jnp.sum(W2 ** 2, axis=1)

        x = self._raw.get(index)
        refit = x is not None and self.refit
        if x is not None:
            # measured hidden statistics on the calibration maps
            hm = self._hidden_acts(src, old, x).astype(jnp.float32)
            n = hm.shape[0]
            mu = jnp.mean(hm, axis=0)
            G = (hm.T @ hm) / n
        if refit:
            # greedy redundancy-aware selection on the SAME objective the
            # refit optimizes (explained centered output variance — the
            # intercept row absorbs any dropped channel's mean)
            if n < M:
                logger.warning(
                    f"calibration sample ({n} pixels) is smaller than the "
                    f"hidden dim ({M}): the covariance is rank-deficient — "
                    f"selection quality degrades past rank {n}; raise the "
                    f"CalibrationHook num_batches/batch_size")
            Kc = G - jnp.outer(mu, mu)
            S, explained = _greedy_select(np.asarray(Kc),
                                          np.asarray(Kc @ W2), k)
            total = float(jnp.trace(W2.T @ (Kc @ W2)))
            # clamp for display: on rank-deficient covariances the greedy
            # gains past the sample rank are numerical noise and can push
            # the ratio over 1
            kept_energy = min(explained / max(total, 1e-30), 1.0)
        else:
            # plain slicing keeps b2 as-is, so the full second moment is
            # what dropping a channel costs
            imp = (jnp.diag(G) * n2sq if x is not None
                   else self._weight_imp(old) ** 2)
            order = np.argsort(-np.asarray(imp), kind="stable")
            S = np.sort(order[:k])  # ascending: k == M is exact identity
            e = np.asarray(imp, np.float64)
            kept_energy = float(e[S].sum() / max(e.sum(), 1e-30))

        if refit:
            # augmented normal equations: fit [W2'; b2'] so that
            # W2'^T h_S + b2' ~= W2^T h + b2 in L2 over the calibration set
            GS = G[np.ix_(S, S)]
            muS = mu[S]
            ridge = self.ridge * jnp.trace(GS) / k
            A = jnp.block([[GS + ridge * jnp.eye(k), muS[:, None]],
                           [muS[None, :], jnp.ones((1, 1))]])
            Bm = jnp.concatenate([G[S] @ W2 + muS[:, None] * b2[None, :],
                                  (mu @ W2 + b2)[None, :]], axis=0)
            X = jnp.linalg.solve(A, Bm)
            W2p, b2p = X[:k], X[k]
            logger.info(f"keep {k}/{M} (contribution energy {kept_energy:.4f}"
                        f"), projection least-squares refit over {n} "
                        f"calib pixels")
        else:
            W2p, b2p = W2[S], b2
            logger.info(f"keep {k}/{M} (contribution energy {kept_energy:.4f}"
                        f"), sliced" + ("" if x is None else " (refit off)"))
        self._apply(old, new, S, W2p, b2p, dt)

    def _postprocess(self, sub: Substitution, params: dict):
        pass

    # -- template hooks (the FFN = conv-MLP instance) ---------------------
    def _hidden_dim(self, mod) -> int:
        return mod.hidden_channel

    def _get_tgt_args(self, src: FFN) -> Dict:
        return dict(num_channel=src.num_channel, hidden_channel=self._k,
                    drop=src.drop_rate)

    def _weight_imp(self, old: dict) -> jnp.ndarray:
        """Per-hidden-channel importance from weights alone: the product
        of the norms touching channel m (GELU is ~1-Lipschitz, so this
        bounds the channel's output contribution)."""
        n1 = jnp.sqrt(jnp.sum(old["fc1"]["weight"].astype(jnp.float32) ** 2,
                              axis=(0, 1, 2)))
        nd = jnp.sqrt(jnp.sum(old["dconv"]["weight"].astype(jnp.float32) ** 2,
                              axis=(0, 1, 2)))
        n2 = jnp.sqrt(jnp.sum(old["fc2"]["weight"].astype(jnp.float32) ** 2,
                              axis=(0, 1, 3)))
        return n1 * nd * n2

    def _consumer(self, old: dict):
        """The projection the refit rewrites: (M, C) f32, (C,) f32, dtype."""
        w = old["fc2"]["weight"]
        M, C = w.shape[2], w.shape[3]
        W2 = w.reshape(M, C).astype(jnp.float32)
        b2 = old["fc2"].get("bias",
                            jnp.zeros((C,), jnp.float32)).astype(jnp.float32)
        return W2, b2, w.dtype

    def _hidden_acts(self, src: FFN, old: dict, x) -> jnp.ndarray:
        """Post-GELU hidden activations on the raw tapped inputs, (n, M)."""
        ctx = Ctx(training=False)
        h = src.fc1(old["fc1"], x.astype(jnp.float32), ctx)
        h = src.dconv(old["dconv"], h, ctx)
        h = GELU()({}, h, ctx)
        return h.reshape(-1, h.shape[-1])

    def _apply(self, old: dict, new: dict, S, W2p, b2p, dt):
        """Slice the producer tensors to S; install the refit projection."""
        k, C = W2p.shape
        for name in ("fc1", "dconv"):
            new[name]["weight"] = jnp.take(old[name]["weight"], S, axis=3)
            if "bias" in old[name]:
                new[name]["bias"] = jnp.take(old[name]["bias"], S, axis=0)
            else:
                new[name].pop("bias", None)
        new["fc2"]["weight"] = W2p.reshape(1, 1, k, C).astype(dt)
        new["fc2"]["bias"] = b2p.astype(dt)


@APP.register_module()
class MlpPrune(FfnPrune):
    """ConvNeXt-block instance: prune the 4x Linear MLP's hidden width.

    Substitutes the WHOLE block (the MLP has no module of its own);
    dwconv / norm / gamma params are carried verbatim, only
    pwconv1/pwconv2 shrink.  The refit target is pwconv2's output (gamma
    and the residual act after it and are unchanged).
    """

    _src_type = ConvNeXtBlock
    _tgt_type = ConvNeXtBlock

    def _hidden_dim(self, mod) -> int:
        return mod.hidden

    def _get_tgt_args(self, src: ConvNeXtBlock) -> Dict:
        return dict(dim=src.dim, drop_path=src.drop_path.drop_prob,
                    layer_scale=src.gamma.init_value, hidden=self._k)

    def _fix_substitution(self, sub: Substitution, params: dict):
        super()._fix_substitution(sub, params)
        for name in ("dwconv", "norm", "gamma"):
            params["new"][name] = jax.tree_util.tree_map(
                lambda v: v, params["old"][name])

    def _weight_imp(self, old: dict) -> jnp.ndarray:
        n1 = jnp.sqrt(jnp.sum(old["pwconv1"]["weight"].astype(jnp.float32)
                              ** 2, axis=0))
        n2 = jnp.sqrt(jnp.sum(old["pwconv2"]["weight"].astype(jnp.float32)
                              ** 2, axis=1))
        return n1 * n2

    def _consumer(self, old: dict):
        w = old["pwconv2"]["weight"]  # (M, C)
        W2 = w.astype(jnp.float32)
        b2 = old["pwconv2"].get(
            "bias", jnp.zeros((w.shape[1],), jnp.float32)).astype(jnp.float32)
        return W2, b2, w.dtype

    def _hidden_acts(self, src: ConvNeXtBlock, old: dict, x) -> jnp.ndarray:
        ctx = Ctx(training=False)
        h = src.dwconv(old["dwconv"], x.astype(jnp.float32), ctx)
        h = src.norm(old["norm"], h, ctx)
        h = src.pwconv1(old["pwconv1"], h, ctx)
        h = GELU()({}, h, ctx)
        return h.reshape(-1, h.shape[-1])

    def _apply(self, old: dict, new: dict, S, W2p, b2p, dt):
        new["pwconv1"]["weight"] = jnp.take(old["pwconv1"]["weight"], S,
                                            axis=1)
        if "bias" in old["pwconv1"]:
            new["pwconv1"]["bias"] = jnp.take(old["pwconv1"]["bias"], S,
                                              axis=0)
        else:
            new["pwconv1"].pop("bias", None)
        new["pwconv2"]["weight"] = W2p.astype(dt)
        new["pwconv2"]["bias"] = b2p.astype(dt)


@APP.register_module()
class AttnPrune(FfnPrune):
    """SpatialAttention instance: prune the gated MSCA branch's width.

    MSCAN's other width axis: between ``proj_1`` and ``proj_2`` the MSCA
    branch runs at the full stage width — ``conv0`` (5x5 dw), the strip
    bank (1xk/kx1 dw at k in {7, 11, 21}), ``channel_mix`` and the
    elementwise gate ``u * attn`` — ALL VPU-bound depthwise work (the
    serving floor's profile, doc/perf-notes.md).  The gate ties the
    branch's in/out widths (h_m = attn_m * u_m), so ONE shared mask
    slices proj_1's output, conv0, every strip conv, channel_mix (both
    axes), and proj_2's input; the consumer refit and greedy selection
    run UNCHANGED on the measured gated hidden ``h = MSCA(GELU(proj_1
    x))``.  Unlike FfnPrune's matmul-width cut this shrinks the VPU
    elementwise/depthwise time, which scales ~linearly with C.
    Composes with MscaRep (applies to the pruned MSCA at width k),
    FfnPrune (disjoint module), and prune_trunks (disjoint axis).
    """

    _src_type = SpatialAttention
    _tgt_type = SpatialAttention

    def optimize(self, sub: Substitution, params: dict):
        """Calibrated path override: select on the full hidden, REFIT on
        the pruned branch's MEASURED hidden.

        Unlike FfnPrune (kept hidden channels compute identically after
        the cut), slicing ``channel_mix`` on BOTH axes changes the kept
        channels' activations (attn_m loses the dropped rows' mixed-in
        contributions), so the base class's moment-space refit would
        optimize against statistics the pruned network never produces.
        Here: greedy-select S on the full gated hidden (the base
        objective), install the sliced branch, run it on the SAME
        calibration maps to get ``h2``, and solve the projection by
        ridge least squares of ``[h2, 1] @ [W2'; b2']`` onto the
        ORIGINAL branch output ``h @ W2 + b2``.
        """
        logger = get_logger()
        index = self._opt_curr
        x = self._raw.get(index)
        if x is None or not self.refit:
            return super().optimize(sub, params)
        self._opt_curr += 1
        old, new = params["old"], params["new"]
        src = sub.old_module
        M, k = self._hidden_dim(src), self._hidden_dim(sub.new_module)
        W2, b2, dt = self._consumer(old)
        h = self._hidden_acts(src, old, x).astype(jnp.float32)
        n = h.shape[0]
        if n < M:
            logger.warning(
                f"calibration sample ({n} pixels) is smaller than the "
                f"hidden dim ({M}): the covariance is rank-deficient — "
                f"selection quality degrades past rank {n}; raise the "
                f"CalibrationHook num_batches/batch_size")
        mu = jnp.mean(h, axis=0)
        Kc = (h.T @ h) / n - jnp.outer(mu, mu)
        S, explained = _greedy_select(np.asarray(Kc),
                                      np.asarray(Kc @ W2), k)
        total = float(jnp.trace(W2.T @ (Kc @ W2)))
        kept = min(explained / max(total, 1e-30), 1.0)
        # install the sliced branch (proj_2 provisionally sliced), then
        # measure what the PRUNED branch actually produces
        self._apply(old, new, S, W2[S], b2, dt)
        h2 = self._hidden_acts(sub.new_module, new, x).astype(jnp.float32)
        if n < 2 * (k + 1):
            logger.warning(
                f"AttnPrune: {n} calibration pixels for a {k + 1}-dim "
                f"solve — refit skipped, sliced projection kept")
            return
        y = h @ W2 + b2[None, :]
        A = jnp.concatenate([h2, jnp.ones((n, 1), jnp.float32)], axis=1)
        G2 = A.T @ A / n
        lam = self.ridge * jnp.trace(G2[:k, :k]) / k
        reg = jnp.diag(jnp.concatenate([jnp.full((k,), lam),
                                        jnp.zeros((1,))]))
        X = jnp.linalg.solve(G2 + reg, (A.T @ y) / n)
        new["proj_2"]["weight"] = X[:k].reshape(1, 1, k, y.shape[1]) \
            .astype(dt)
        new["proj_2"]["bias"] = X[k].astype(dt)
        logger.info(f"keep {k}/{M} (contribution energy {kept:.4f}), "
                    f"projection refit on the PRUNED branch's hidden over "
                    f"{n} calib pixels")

    def _hidden_dim(self, mod) -> int:
        return mod.inner_channel

    def _get_tgt_args(self, src: SpatialAttention) -> Dict:
        sgu = src.spatial_gating_unit
        return dict(num_channel=src.num_channel, k1_size=sgu.k1_size,
                    k_sizes=sgu.k_sizes, inner_channel=self._k)

    def _weight_imp(self, old: dict) -> jnp.ndarray:
        so = old["spatial_gating_unit"]

        def ch_norm(w, axes=(0, 1, 2)):
            return jnp.sqrt(jnp.sum(w.astype(jnp.float32) ** 2, axis=axes))

        n1 = ch_norm(old["proj_1"]["weight"])
        nc0 = ch_norm(so["conv0"]["weight"])
        # the bank is a SUM of per-channel cascades (+ identity): combine
        # branch strengths in quadrature, cascade taps as a product
        bank_sq = jnp.ones_like(n1)  # the identity branch
        for branch in so["sd_convs"].get("branches", {}).values():
            if "conv1" in branch:
                bank_sq = bank_sq + (ch_norm(branch["conv1"]["weight"])
                                     * ch_norm(branch["conv2"]["weight"])) ** 2
        nm = ch_norm(so["channel_mix"]["weight"])
        n2 = ch_norm(old["proj_2"]["weight"], axes=(0, 1, 3))
        # h_m = attn_m * u_m: attn_m is bounded by the conv0 -> bank ->
        # mix-column-m chain, u_m by proj_1's out channel m; proj_2's in
        # row m reads it (the every-op-touching-m convention of the base)
        return n1 * nc0 * jnp.sqrt(bank_sq) * nm * n2

    def _consumer(self, old: dict):
        w = old["proj_2"]["weight"]
        M, C = w.shape[2], w.shape[3]
        W2 = w.reshape(M, C).astype(jnp.float32)
        b2 = old["proj_2"].get(
            "bias", jnp.zeros((C,), jnp.float32)).astype(jnp.float32)
        return W2, b2, w.dtype

    def _hidden_acts(self, src: SpatialAttention, old: dict, x) -> jnp.ndarray:
        ctx = Ctx(training=False)
        u = src.proj_1(old["proj_1"], x.astype(jnp.float32), ctx)
        u = GELU()({}, u, ctx)
        h = src.spatial_gating_unit(old["spatial_gating_unit"], u, ctx)
        return h.reshape(-1, h.shape[-1])

    def _apply(self, old: dict, new: dict, S, W2p, b2p, dt):
        k, C = W2p.shape

        def take_out(o, n):
            n["weight"] = jnp.take(o["weight"], S, axis=3)
            if "bias" in o:
                n["bias"] = jnp.take(o["bias"], S, axis=0)
            else:
                n.pop("bias", None)

        take_out(old["proj_1"], new["proj_1"])
        so, sn = old["spatial_gating_unit"], new["spatial_gating_unit"]
        take_out(so["conv0"], sn["conv0"])
        bo = so["sd_convs"].get("branches", {})
        bn_ = sn["sd_convs"].setdefault("branches", {})
        for name, branch in bo.items():
            for cn in ("conv1", "conv2"):
                if cn in branch:  # the identity branch carries no params
                    take_out(branch[cn], bn_.setdefault(name, {})
                             .setdefault(cn, {}))
        wm = jnp.take(jnp.take(so["channel_mix"]["weight"], S, axis=2),
                      S, axis=3)
        sn["channel_mix"]["weight"] = wm
        if "bias" in so["channel_mix"]:
            sn["channel_mix"]["bias"] = jnp.take(so["channel_mix"]["bias"],
                                                 S, axis=0)
        new["proj_2"]["weight"] = W2p.reshape(1, 1, k, C).astype(dt)
        new["proj_2"]["bias"] = b2p.astype(dt)
