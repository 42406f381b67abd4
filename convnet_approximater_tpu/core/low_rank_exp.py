"""Scheme-1 / scheme-2 low-rank expansion approximaters (arXiv 1405.3866).

Rebuilds of ``/root/reference/src/approx/core/low_rank_exp.py``.  The cvxpy
alternating convex solve is replaced by the jitted proximal-IRLS alternation
in :mod:`.low_rank_solvers` (the SVD-init / ``max_iter=0`` path the reference
configs actually use is bit-identical up to LAPACK sign conventions).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from convnet_approximater_tpu.layers import (
    LowRankExpConvV1,
    LowRankExpConvV2,
    Substitution,
)
from convnet_approximater_tpu.nn import Conv2d
from convnet_approximater_tpu.ops.layout import hwio_to_oihw, oihw_to_hwio
from convnet_approximater_tpu.utils.logger import get_logger

from .approximater import APP, Approximater
from . import low_rank_solvers as solvers


@APP.register_module()
class LowRankExpV1(Approximater):
    """Scheme-1 filter reconstruction: W ~= sum_m a_m (basis_m) with shared
    spatial bases per input channel (reference ``low_rank_exp.py:13-189``)."""

    _src_type = Conv2d
    _tgt_type = "LowRankExpConvV1"

    def __init__(self, num_bases=None, max_iter=0, lmda_length=1,
                 min_lmda=0.0, max_lmda=0.0, energy: float = None,
                 init_method: str = "svd", inc_rate: float = 1.5,
                 do_decomp: bool = False, init_decomp: bool = False,
                 verbose: bool = False, epsilon: float = 1e-3,
                 deploy: bool = False):
        super().__init__(deploy=deploy)
        # num_bases: explicit per-layer M cursor (reference semantics), OR
        # energy=tau: smallest M retaining tau of the stacked-filter
        # (N*C, d^2) spectral energy — the same auto-rank convention as
        # LowRankExpV3 / DwSepRep
        assert (num_bases is None) != (energy is None), \
            "give exactly one of num_bases / energy"
        if energy is not None:
            assert 0.0 < energy <= 1.0
        self.num_bases = num_bases
        self.energy = energy
        self._auto_m = None
        self.curr = 0
        self.max_iter = max_iter
        assert max_lmda >= min_lmda >= 0.0
        self.lmda_list = solvers.lmda_schedule(lmda_length, min_lmda, max_lmda, inc_rate)
        self.do_decomp = do_decomp
        self.init_decomp = init_decomp
        assert init_method in ("standard", "svd", "random")
        self.init_method = init_method
        self.verbose = verbose
        self.epsilon = epsilon

    def rewind(self):
        self.curr = 0

    def initialize(self, src, src_params, rng=None):
        if self.energy is not None:
            W4 = hwio_to_oihw(src_params["weight"]).astype(jnp.float32)
            N, C, d = W4.shape[:3]
            s = jnp.linalg.svd(W4.reshape(N * C, -1), compute_uv=False)
            lbd = s ** 2
            cum = jnp.cumsum(lbd) / jnp.maximum(jnp.sum(lbd), 1e-30)
            self._auto_m = min(int(jnp.searchsorted(cum, self.energy)) + 1,
                               int(cum.shape[0]))
            get_logger().info(
                f"auto bases: {self._auto_m}/{int(s.shape[0])} "
                f"(energy >= {self.energy})")
        return super().initialize(src, src_params, rng)

    def _get_tgt_args(self, src: Conv2d) -> Dict:
        if self.energy is not None:
            num_base = self._auto_m
        else:
            num_base = self.num_bases[self.curr]
            self.curr += 1
        return dict(
            in_channels=src.in_channels,
            out_channels=src.out_channels,
            num_base=num_base,
            kernel_size=src.kernel_size,
            stride=src.stride,
            padding=src.padding,
            decomp=self.init_decomp,
        )

    def _fix_substitution(self, sub: Substitution, params: dict):
        # carry the source conv's bias onto the 1x1 mixing conv; a bias-less
        # source (e.g. ResNet's pre-BN convs) approximates to zero bias
        old_bias = params["old"].get("bias")
        params["new"]["d_conv"]["bias"] = (
            old_bias if old_bias is not None
            else jnp.zeros_like(params["new"]["d_conv"]["bias"]))

    def optimize(self, sub: Substitution, params: dict):
        if self.init_decomp:
            # separable target built directly; weights come from a checkpoint
            # (reference ``low_rank_exp.py:141-142``)
            return
        logger = get_logger()
        tgt: LowRankExpConvV1 = sub.new_module
        W4 = hwio_to_oihw(params["old"]["weight"])  # (N, C, d, d)
        N, C, d = W4.shape[:3]
        M = tgt.num_base
        W = W4.reshape(N * C, d * d).astype(jnp.float32)

        if self.init_method == "svd":
            A, B = solvers.svd_init(W, M)
        elif self.init_method == "standard":
            A, B = solvers.standard_init(W, M)
        else:
            A, B = solvers.random_init(jax.random.key(0), W, M)

        logger.info(f"lambda list: {self.lmda_list}")
        # The solve runs in fixed-size jitted chunks (static shapes for XLA)
        # with a host-side epsilon check between chunks, so convergence stops
        # the DEVICE work, not just the logging — the reference broke out of
        # its cvxpy loop the same way (``low_rank_exp.py:160-176``).  At most
        # two program shapes compile (full chunk + final remainder).
        chunk = min(self.max_iter, 10) if self.max_iter > 0 else 0
        for lmda in self.lmda_list:
            it_done, prev_obj, converged = 0, None, False
            while it_done < self.max_iter and not converged:
                n = chunk if self.max_iter - it_done >= chunk else self.max_iter - it_done
                A, B, objs = solvers.als_l21_nuclear(
                    W, A, B, jnp.float32(lmda), d, n
                )
                for j, obj in enumerate(np.asarray(objs)):
                    it = it_done + j + 1
                    logger.info(f"[lmda: {lmda}]({it}/{self.max_iter}) total error: {obj}")
                    if prev_obj is not None and abs(prev_obj - obj) < self.epsilon:
                        logger.info(f"[lmda: {lmda}] converged after {it} iters")
                        converged = True
                        break
                    prev_obj = obj
                it_done += n
            logger.info(f"PC Energy = {float(solvers.pc_energy(B, d))}")

        # write back: s_conv gets the M bases replicated over the C groups
        # (output channel c*M + m = basis m on input channel c); d_conv gets
        # the (N, C*M) mixing weights.
        bases = B.reshape(M, d, d)
        s_w = jnp.broadcast_to(bases[None], (C, M, d, d)).reshape(C * M, 1, d, d)
        params["new"]["s_conv"]["weight"] = oihw_to_hwio(s_w)
        d_w = A.reshape(N, C * M)[:, :, None, None]  # OIHW (N, C*M, 1, 1)
        params["new"]["d_conv"]["weight"] = oihw_to_hwio(d_w)

    def _postprocess(self, sub: Substitution, params: dict):
        if self.do_decomp:
            tgt: LowRankExpConvV1 = sub.new_module
            params["new"] = tgt.decomp(params["new"])


@APP.register_module()
class LowRankExpV2(Approximater):
    """Scheme-2 separable reconstruction: W[n,c,:,:] ~= sum_m v_m^c (h_n^m)^T.

    The solve the reference left open (its ``LowRankExpV2`` app was imported
    but never written — SURVEY.md §2.2): closed-form truncated-SVD filter
    reconstruction, with optional data-driven ALS refinement weighted by a
    calibration-activation second moment (``xcov``) supplied by the
    :class:`~convnet_approximater_tpu.hooks.CalibrationHook` or directly via
    ``set_calibration``.
    """

    _src_type = Conv2d
    _tgt_type = "LowRankExpConvV2"

    def __init__(self, num_bases, data_driven_iters: int = 0, deploy: bool = False):
        super().__init__(deploy=deploy)
        self.num_bases = num_bases
        self.curr = 0
        self._opt_curr = 0
        self.data_driven_iters = data_driven_iters
        self._xcov = {}  # switchable index -> (C*kh, C*kh) second moment

    def rewind(self):
        self.curr = 0
        self._opt_curr = 0

    def set_calibration(self, index: int, xcov):
        self._xcov[index] = xcov

    def _get_tgt_args(self, src: Conv2d) -> Dict:
        num_base = self.num_bases[self.curr]
        self.curr += 1
        return dict(
            in_channels=src.in_channels,
            out_channels=src.out_channels,
            num_base=num_base,
            kernel_size=src.kernel_size,
            stride=src.stride,
            padding=src.padding,
        )

    def _fix_substitution(self, sub: Substitution, params: dict):
        old_bias = params["old"].get("bias")
        params["new"]["h_conv"]["bias"] = (
            old_bias if old_bias is not None
            else jnp.zeros_like(params["new"]["h_conv"]["bias"]))

    def optimize(self, sub: Substitution, params: dict):
        logger = get_logger()
        index = self._opt_curr
        self._opt_curr += 1
        tgt: LowRankExpConvV2 = sub.new_module
        W4 = hwio_to_oihw(params["old"]["weight"]).astype(jnp.float32)  # (N, C, kh, kw)
        N, C, kh, kw = W4.shape
        M = tgt.num_base
        V, H, energy = solvers.scheme2_factorize(W4, M)
        logger.info(f"scheme-2 retained energy: {float(energy):.6f}")
        if self.data_driven_iters > 0:
            xcov = self._xcov.get(index)
            if xcov is None:
                xcov = jnp.eye(C * kh, dtype=jnp.float32)
            V, H, errs = solvers.scheme2_data_driven(W4, V, H, xcov, self.data_driven_iters)
            logger.info(f"scheme-2 ALS final err: {float(errs[-1]):.6f}")
        # v_conv: (M, C, kh) -> OIHW (M, C, kh, 1) -> HWIO
        params["new"]["v_conv"]["weight"] = oihw_to_hwio(V[:, :, :, None])
        # h_conv: (N, M, kw) -> OIHW (N, M, 1, kw) -> HWIO
        params["new"]["h_conv"]["weight"] = oihw_to_hwio(H[:, :, None, :])

    def _postprocess(self, sub: Substitution, params: dict):
        pass


@APP.register_module()
class LowRankExpV3(Approximater):
    """Channel-rank factorization (TPU extension, no reference counterpart):
    W (N, C k^2) ~= A (N, r) @ B (r, C k^2), executed as a dense k x k conv
    C -> r followed by a 1x1 conv r -> N.

    Truncated SVD IS the Frobenius-optimal solve here (Eckart-Young), so
    unlike scheme-1 there is no alternating solve to run — ``optimize`` is
    closed-form and logs the retained PC energy.  Motivation: scheme-1's
    grouped basis convs lose wall-clock on TPU at VGG/ResNet shapes (the
    profiled grouped-conv wall, doc/perf-notes.md); V3's factors are both
    dense MXU contractions, so the MAC cut (~r/N for C k^2 >> N) converts
    to time.
    """

    _src_type = Conv2d
    _tgt_type = "LowRankExpConvV3"
    # tells CalibrationHook which input statistic to stream: the whitened
    # solve weights the FULL patch space, not scheme-2's vertical strips
    calibration_stat = "patches"

    def __init__(self, num_bases=None, energy: float = None,
                 data_driven: bool = False, ridge: float = 1e-6,
                 deploy: bool = False):
        super().__init__(deploy=deploy)
        # per-layer rank: an explicit tuple cursor (num_bases), OR automatic
        # rank selection — the smallest r retaining ``energy`` of the
        # spectral energy of each layer's unfolded kernel (num_bases=None)
        assert (num_bases is None) != (energy is None), \
            "give exactly one of num_bases / energy"
        if energy is not None:
            assert 0.0 < energy <= 1.0
        self.num_bases = num_bases
        self.energy = energy
        self._auto_r = None
        self.curr = 0
        self._opt_curr = 0
        # data_driven=True + a CalibrationHook: minimize the RESPONSE error
        # E||y - yhat||^2 = ||(A B - W) Sigma^(1/2)||_F^2 over the calibration
        # input patch second moment Sigma, instead of the plain kernel
        # Frobenius error.  Closed form: truncated SVD of W Sigma^(1/2),
        # un-whitened back through Sigma^(-1/2) (eigenvalue-clipped).
        self.data_driven = data_driven
        self.ridge = ridge
        self._xcov = {}

    def set_calibration(self, index: int, xcov):
        self._xcov[index] = xcov

    def rewind(self):
        self.curr = 0
        self._opt_curr = 0

    def initialize(self, src, src_params, rng=None):
        if self.energy is not None:
            # auto rank: smallest r with cumulative spectral energy >= tau
            W4 = hwio_to_oihw(src_params["weight"]).astype(jnp.float32)
            N = W4.shape[0]
            s = jnp.linalg.svd(W4.reshape(N, -1), compute_uv=False)
            lbd = s ** 2
            cum = jnp.cumsum(lbd) / jnp.maximum(jnp.sum(lbd), 1e-30)
            self._auto_r = min(int(jnp.searchsorted(cum, self.energy)) + 1,
                               int(cum.shape[0]))
            get_logger().info(
                f"auto rank: {self._auto_r}/{int(s.shape[0])} "
                f"(energy >= {self.energy})")
        return super().initialize(src, src_params, rng)

    def _get_tgt_args(self, src: Conv2d) -> Dict:
        assert src.groups == 1 and src.dilation == (1, 1), (
            "LowRankExpV3 factorizes dense convs only (use SimpleConvFilter "
            f"or KernelSizeFilter); got groups={src.groups} "
            f"dilation={src.dilation}")
        if self.energy is not None:
            num_base = self._auto_r
        else:
            num_base = self.num_bases[self.curr]
            self.curr += 1
        return dict(
            in_channels=src.in_channels,
            out_channels=src.out_channels,
            num_base=num_base,
            kernel_size=src.kernel_size,
            stride=src.stride,
            padding=src.padding,
        )

    def _fix_substitution(self, sub: Substitution, params: dict):
        old_bias = params["old"].get("bias")
        params["new"]["mix_conv"]["bias"] = (
            old_bias if old_bias is not None
            else jnp.zeros_like(params["new"]["mix_conv"]["bias"]))

    def optimize(self, sub: Substitution, params: dict):
        logger = get_logger()
        index = self._opt_curr
        self._opt_curr += 1
        tgt = sub.new_module
        W4 = hwio_to_oihw(params["old"]["weight"]).astype(jnp.float32)
        N, C, kh, kw = W4.shape
        r = tgt.num_base
        W = W4.reshape(N, C * kh * kw)
        xcov = self._xcov.get(index) if self.data_driven else None
        if xcov is not None:
            # whiten: Sigma = Q diag(lam) Q^T (PSD); clip tiny eigenvalues so
            # the un-whitening stays bounded on rank-deficient calib sets
            lam, Q = jnp.linalg.eigh(xcov.astype(jnp.float32))
            lam = jnp.maximum(lam, self.ridge * jnp.max(lam))
            half = Q * jnp.sqrt(lam)[None, :]            # Sigma^(1/2) = Q L^(1/2) Q^T (cols scaled)
            inv_half = Q / jnp.sqrt(lam)[None, :]
            u, s, vh = jnp.linalg.svd(W @ half @ Q.T, full_matrices=False)
            A = u[:, :r]
            B = (s[:r, None] * vh[:r]) @ Q @ inv_half.T  # un-whiten rows
            lbd = s ** 2
            logger.info("data-driven whitened solve "
                        f"(xcov index {index}, D={C * kh * kw})")
        else:
            A, B = solvers.svd_init(W, r)
            lbd = jnp.linalg.svd(W, compute_uv=False) ** 2
        # basis_conv: (r, C, kh, kw) OIHW; mix_conv: (N, r, 1, 1)
        params["new"]["basis_conv"]["weight"] = oihw_to_hwio(
            B.reshape(r, C, kh, kw))
        params["new"]["mix_conv"]["weight"] = oihw_to_hwio(A[:, :, None, None])
        pce = jnp.sum(lbd[:r]) / jnp.maximum(jnp.sum(lbd), 1e-30)
        logger.info(f"PC Energy = {float(pce)}")

    def _postprocess(self, sub: Substitution, params: dict):
        pass


@APP.register_module()
class LowRankExpV4(Approximater):
    """Tucker-2 factorization (TPU extension; the Tucker analog of the CP
    decomposition line — Lebedev et al. 1412.6553, Kim et al. 1511.06530):
    1x1 C->r1, dense kxk core r1->r2, 1x1 r2->N — every factor pure MXU
    work.

    V3 is the Tucker-1 special case (output mode only); compressing BOTH
    channel modes shrinks the kxk term from C k^2 r to r1 r2 k^2, so at
    equal retained energy the MAC cut is far deeper whenever C >> r1.
    Solve: HOSVD init (per-mode truncated SVDs of the kernel unfoldings —
    each Eckart-Young-optimal per mode) + HOOI alternation (default 3
    sweeps; monotone in Frobenius core energy), closed-form per step — no
    iterative data solve needed, like V3.
    """

    _src_type = Conv2d
    _tgt_type = "LowRankExpConvV4"
    # tells CalibrationHook which input statistic to stream: Tucker's C-mode
    # whitening needs only the C x C channel second moment (V3's full-patch
    # moment weights a space Tucker cannot represent per mode)
    calibration_stat = "channels"

    def __init__(self, num_bases=None, energy: float = None,
                 hooi_iters: int = 3, data_driven: bool = False,
                 ridge: float = 1e-6, deploy: bool = False):
        super().__init__(deploy=deploy)
        # per-layer ranks: a tuple cursor of (r1, r2) pairs (an int means
        # r1 == r2), OR energy=tau for automatic per-mode rank selection
        # (smallest r with cumulative mode-singular energy >= tau)
        assert (num_bases is None) != (energy is None), \
            "give exactly one of num_bases / energy"
        if energy is not None:
            assert 0.0 < energy <= 1.0
        self.num_bases = num_bases
        self.energy = energy
        self.hooi_iters = int(hooi_iters)
        # data_driven=True + a CalibrationHook: whiten the INPUT-CHANNEL
        # mode by the calibration channel second moment Sigma_c, so the
        # Tucker projection minimizes the response-weighted error
        # ||(W - What) x_I Sigma_c^(1/2)||_F^2 (channel-stationary
        # approximation of the full patch weighting V3 uses)
        self.data_driven = data_driven
        self.ridge = ridge
        self._xcov = {}
        self._auto_r = None
        self.curr = 0
        self._opt_curr = 0

    def set_calibration(self, index: int, xcov):
        self._xcov[index] = xcov

    def rewind(self):
        self.curr = 0
        self._opt_curr = 0

    @staticmethod
    def _mode_energies(W4):
        """Cumulative normalized spectral energy of the two channel-mode
        unfoldings: (output mode (N, C k^2), input mode (C, N k^2))."""
        N, C, kh, kw = W4.shape
        out = []
        for unf in (W4.reshape(N, -1),
                    W4.transpose(1, 0, 2, 3).reshape(C, -1)):
            lbd = jnp.linalg.svd(unf, compute_uv=False) ** 2
            out.append(jnp.cumsum(lbd) / jnp.maximum(jnp.sum(lbd), 1e-30))
        return out

    def initialize(self, src, src_params, rng=None):
        if self.energy is not None:
            W4 = hwio_to_oihw(src_params["weight"]).astype(jnp.float32)
            cum_o, cum_i = self._mode_energies(W4)
            # clamp: f32 rounding can leave cum[-1] slightly below an
            # energy of 1.0, which would select a rank past the spectrum
            r2 = min(int(jnp.searchsorted(cum_o, self.energy)) + 1,
                     int(cum_o.shape[0]))
            r1 = min(int(jnp.searchsorted(cum_i, self.energy)) + 1,
                     int(cum_i.shape[0]))
            self._auto_r = (r1, r2)
            get_logger().info(
                f"auto ranks: r1={r1}/{int(cum_i.shape[0])} "
                f"r2={r2}/{int(cum_o.shape[0])} (mode energy >= {self.energy})")
        return super().initialize(src, src_params, rng)

    def _get_tgt_args(self, src: Conv2d) -> Dict:
        assert src.groups == 1 and src.dilation == (1, 1), (
            "LowRankExpV4 factorizes dense convs only (use SimpleConvFilter "
            f"or KernelSizeFilter); got groups={src.groups} "
            f"dilation={src.dilation}")
        if self.energy is not None:
            num_base = self._auto_r
        else:
            num_base = self.num_bases[self.curr]
            self.curr += 1
        return dict(
            in_channels=src.in_channels,
            out_channels=src.out_channels,
            num_base=num_base,
            kernel_size=src.kernel_size,
            stride=src.stride,
            padding=src.padding,
        )

    def _fix_substitution(self, sub: Substitution, params: dict):
        old_bias = params["old"].get("bias")
        params["new"]["out_conv"]["bias"] = (
            old_bias if old_bias is not None
            else jnp.zeros_like(params["new"]["out_conv"]["bias"]))

    @staticmethod
    def _left_sv(M, r):
        u, _, _ = jnp.linalg.svd(M, full_matrices=False)
        return u[:, :r]

    def optimize(self, sub: Substitution, params: dict):
        logger = get_logger()
        index = self._opt_curr
        self._opt_curr += 1
        tgt = sub.new_module
        W4 = hwio_to_oihw(params["old"]["weight"]).astype(jnp.float32)
        N, C, kh, kw = W4.shape
        r1, r2 = tgt.num_base
        xcov = self._xcov.get(index) if self.data_driven else None
        inv_half = None
        if xcov is not None:
            # symmetric sqrt of the C x C channel moment, eigenvalue-clipped
            lam, Q = jnp.linalg.eigh(xcov.astype(jnp.float32))
            lam = jnp.maximum(lam, self.ridge * jnp.max(lam))
            s_half = (Q * jnp.sqrt(lam)[None, :]) @ Q.T
            inv_half = (Q / jnp.sqrt(lam)[None, :]) @ Q.T
            W4 = jnp.einsum("ncuv,cd->nduv", W4, s_half)
            logger.info(f"data-driven channel-whitened solve "
                        f"(xcov index {index}, C={C})")
        # HOSVD init: truncated per-mode SVDs of the unfoldings
        U_N = self._left_sv(W4.reshape(N, -1), r2)
        U_C = self._left_sv(W4.transpose(1, 0, 2, 3).reshape(C, -1), r1)
        # HOOI: alternate each mode's SVD against the other's projection
        for _ in range(self.hooi_iters):
            T = jnp.einsum("ncuv,ca->nauv", W4, U_C)       # x_I U_C^T
            U_N = self._left_sv(T.reshape(N, -1), r2)
            S = jnp.einsum("ncuv,nb->cbuv", W4, U_N)       # x_O U_N^T
            U_C = self._left_sv(S.reshape(C, -1), r1)
        G = jnp.einsum("ncuv,nb,ca->bauv", W4, U_N, U_C)   # (r2, r1, kh, kw)
        pce_num, pce_den = jnp.sum(G ** 2), jnp.sum(W4 ** 2)
        if inv_half is not None:
            # un-whiten the input factor: What = (G x_O U_N x_I U_C~)
            # x_I Sigma^(-1/2)  =>  U_C' = Sigma^(-1/2) @ U_C~ (symmetric)
            U_C = inv_half @ U_C
        # in_conv: (r1, C, 1, 1) = U_C^T; out_conv: (N, r2, 1, 1) = U_N
        params["new"]["in_conv"]["weight"] = oihw_to_hwio(
            U_C.T[:, :, None, None])
        params["new"]["core_conv"]["weight"] = oihw_to_hwio(G)
        params["new"]["out_conv"]["weight"] = oihw_to_hwio(
            U_N[:, :, None, None])
        # retained Frobenius energy of the Tucker-2 projection (in the
        # whitened metric when data-driven; exact because the HOOI factors
        # are orthonormal there)
        pce = pce_num / jnp.maximum(pce_den, 1e-30)
        logger.info(f"PC Energy = {float(pce)}")

    def _postprocess(self, sub: Substitution, params: dict):
        pass
