"""Jitted solvers for the Jaderberg low-rank expansion problems.

The reference solved scheme-1's bi-convex problem with cvxpy on the host CPU
(``/root/reference/src/approx/core/low_rank_exp.py:69-176``): alternating two
generic convex programs for ``min sum_i ||w_i - (A B)_i||_2 + lmda * sum_m
||B_m||_nuc``.  Here the same objective is minimised by a jitted
proximal-IRLS alternation that runs entirely on device:

* **A-step** (fix bases): each row's ``||w_i - a_i B||_2`` is minimised by the
  ridge-stabilised least-squares projection ``A = W B^T (B B^T + eps I)^-1``
  (the argmin of the norm equals the argmin of its square, row-wise).
* **B-step** (fix weights): the L2,1 data term is handled by IRLS — a
  diagonally re-weighted least squares with weights ``1/max(||r_i||, delta)``
  — followed by singular-value soft-thresholding (the proximal operator of
  the nuclear norm) on each basis reshaped (d, d).

A fixed iteration count under ``lax.scan`` keeps everything static-shaped;
the per-iteration objective trace is returned so the caller can log
convergence like the reference did.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def svd_init(W: jnp.ndarray, num_bases: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SVD initialisation (reference ``low_rank_exp.py:110-120``).

    ``W``: (R, D) stacked filters (R = N*C rows, D = d*d).  Returns
    ``weights`` (R, M) = U * sqrt(S) and ``bases`` (M, D) = sqrt(S) * Vh,
    zero-padded when M exceeds the spectrum.
    """
    u, s, vh = jnp.linalg.svd(W, full_matrices=False)
    sq = jnp.sqrt(s)
    k = s.shape[-1]
    upb = min(num_bases, k)
    R, D = W.shape
    weights = jnp.zeros((R, num_bases), W.dtype).at[:, :upb].set(u[:, :upb] * sq[None, :upb])
    bases = jnp.zeros((num_bases, D), W.dtype).at[:upb, :].set(vh[:upb, :] * sq[:upb, None])
    return weights, bases


def standard_init(W, num_bases):
    """Reference 'standard' init (``low_rank_exp.py:101-109``)."""
    R, D = W.shape
    upb = min(num_bases, D)
    weights = jnp.zeros((R, num_bases), W.dtype).at[:, :upb].set(W[:, :upb])
    bases = jnp.zeros((num_bases, D), W.dtype).at[jnp.arange(upb), jnp.arange(upb)].set(1.0)
    return weights, bases


def random_init(rng, W, num_bases):
    R, D = W.shape
    k1, k2 = jax.random.split(rng)
    return (
        jax.random.uniform(k1, (R, num_bases), W.dtype),
        jax.random.uniform(k2, (num_bases, D), W.dtype),
    )


def l21_objective(W, A, B, lmda, d):
    """sum_i ||w_i - (A B)_i||_2 + lmda * sum_m ||B_m||_nuc."""
    resid = W - A @ B
    data = jnp.sum(jnp.linalg.norm(resid, axis=1))
    sv = jnp.linalg.svd(B.reshape(-1, d, d), compute_uv=False)
    return data + lmda * jnp.sum(sv)


def _svt(B, d, tau):
    """Singular-value soft-thresholding of each basis (nuclear-norm prox)."""
    Bk = B.reshape(-1, d, d)
    u, s, vh = jnp.linalg.svd(Bk, full_matrices=False)
    s = jnp.maximum(s - tau, 0.0)
    return (u * s[..., None, :] @ vh).reshape(B.shape)


@partial(jax.jit, static_argnames=("d", "num_iters"))
def als_l21_nuclear(W, A0, B0, lmda, d: int, num_iters: int,
                    ridge: float = 1e-6, irls_delta: float = 1e-6):
    """Alternating proximal-IRLS minimisation of the scheme-1 objective.

    Returns (A, B, objective_trace) with ``objective_trace`` of length
    ``num_iters`` (evaluated after each full alternation).
    """

    def step(carry, _):
        A, B = carry
        # --- B-step: IRLS-weighted LS, then nuclear prox -------------
        resid = W - A @ B
        r = jnp.linalg.norm(resid, axis=1)
        wts = 1.0 / jnp.maximum(r, irls_delta)  # (R,)
        AtWA = (A * wts[:, None]).T @ A
        AtWY = (A * wts[:, None]).T @ W
        M = A.shape[1]
        B_ls = jnp.linalg.solve(AtWA + ridge * jnp.eye(M, dtype=W.dtype), AtWY)
        # prox threshold: the IRLS quadratic has row curvature ~ mean(wts)*R;
        # dividing lmda by it keeps the shrinkage on the un-weighted
        # objective's scale across the continuation schedule.
        tau = lmda / jnp.maximum(jnp.mean(wts) * W.shape[0], 1e-12)
        B = jnp.where(lmda > 0, _svt(B_ls, d, tau), B_ls)
        # --- A-step: exact per-row LS --------------------------------
        BBt = B @ B.T
        A = jnp.linalg.solve(BBt + ridge * jnp.eye(M, dtype=W.dtype), B @ W.T).T
        obj = l21_objective(W, A, B, lmda, d)
        return (A, B), obj

    (A, B), objs = jax.lax.scan(step, (A0, B0), None, length=num_iters)
    return A, B, objs


def pc_energy(bases: jnp.ndarray, d: int) -> jnp.ndarray:
    """Mean fraction of spectral energy in the top singular value of each
    basis — the reference's "PC Energy" log (``low_rank_exp.py:177-180``)."""
    sv = jnp.linalg.svd(bases.reshape(-1, d, d), compute_uv=False)
    lbd = sv**2
    tot = jnp.sum(lbd, axis=1)
    # all-zero bases (SVD init with num_base > d*d rank) carry no energy —
    # exclude them from the mean instead of propagating 0/0 = nan
    nz = tot > 0
    frac = jnp.where(nz, lbd[:, 0] / jnp.where(nz, tot, 1.0), 0.0)
    return jnp.sum(frac) / jnp.maximum(jnp.sum(nz), 1)


def lmda_schedule(lmda_length: int, min_lmda: float, max_lmda: float,
                  inc_rate: float = 1.5) -> np.ndarray:
    """Log-spaced lambda continuation schedule (``low_rank_exp.py:30-31``)."""
    lst = np.logspace(0, inc_rate, lmda_length + 1)[1:] - 1
    lst = lst / lst[-1] * (max_lmda - min_lmda) + min_lmda
    return lst


# ---------------------------------------------------------------------------
# Scheme-2: separable tensor factorisation
# ---------------------------------------------------------------------------

def scheme2_factorize(W_oihw: jnp.ndarray, num_bases: int):
    """Closed-form scheme-2 filter reconstruction.

    Scheme-2 writes ``W[n, c, u, v] ~= sum_m V[m, c, u] * H[n, m, v]``: a
    vertical (d, 1) conv C -> M then a horizontal (1, d) conv M -> N.  Stack
    ``T[(c, u), (n, v)] = W[n, c, u, v]``; then the best rank-M factorisation
    in Frobenius norm is the truncated SVD (Eckart-Young), giving the
    data-free solve the reference never implemented (its ``LowRankExpV2``
    layer existed but no approximater drove it — SURVEY.md §2.2).

    Returns ``(V, H, energy)`` with V (M, C, d), H (N, M, d) and the retained
    spectral-energy fraction.
    """
    N, C, kh, kw = W_oihw.shape
    T = jnp.transpose(W_oihw, (1, 2, 0, 3)).reshape(C * kh, N * kw)
    u, s, vh = jnp.linalg.svd(T, full_matrices=False)
    M = min(num_bases, s.shape[0])
    sq = jnp.sqrt(s[:M])
    V = (u[:, :M] * sq[None, :]).T.reshape(M, C, kh)
    H = jnp.transpose((vh[:M, :] * sq[:, None]).reshape(M, N, kw), (1, 0, 2))
    energy = jnp.sum(s[:M] ** 2) / jnp.maximum(jnp.sum(s**2), 1e-12)
    if num_bases > M:
        V = jnp.concatenate([V, jnp.zeros((num_bases - M, C, kh), V.dtype)], axis=0)
        H = jnp.concatenate([H, jnp.zeros((N, num_bases - M, kw), H.dtype)], axis=1)
    return V, H, energy


@partial(jax.jit, static_argnames=("num_iters",))
def scheme2_data_driven(W_oihw, V0, H0, xcov, num_iters: int, ridge: float = 1e-8):
    """Data-driven refinement of the scheme-2 factors.

    Minimises the input-weighted reconstruction error
    ``sum_{n,v} || (W[:, :, :, v] - What[:, :, :, v]) ||_Sigma`` where
    ``Sigma = xcov`` is the (C*kh, C*kh) second moment of vectorised input
    patches columns (vertical strips), via alternating ridge least squares on
    the stacked matrix form ``T ~= Vmat @ Hmat`` with metric ``xcov`` on the
    left factor's row space.  With ``xcov = I`` this reduces to plain ALS.
    """
    N, C, kh, kw = W_oihw.shape
    M = V0.shape[0]
    T = jnp.transpose(W_oihw, (1, 2, 0, 3)).reshape(C * kh, N * kw)
    Vm0 = V0.reshape(M, C * kh).T  # (C*kh, M)
    Hm0 = jnp.transpose(H0, (1, 0, 2)).reshape(M, N * kw)  # (M, N*kw)

    def step(carry, _):
        Vm, Hm = carry
        # V-step: min || Sigma^1/2 (T - Vm Hm) ||_F over Vm
        HHt = Hm @ Hm.T
        Vm = jnp.linalg.solve(HHt + ridge * jnp.eye(M, dtype=T.dtype), Hm @ T.T).T
        # H-step: metric-weighted LS: min (T - Vm Hm)^T Sigma (T - Vm Hm)
        G = Vm.T @ xcov @ Vm
        Hm = jnp.linalg.solve(G + ridge * jnp.eye(M, dtype=T.dtype), Vm.T @ xcov @ T)
        err = jnp.linalg.norm(T - Vm @ Hm)
        return (Vm, Hm), err

    (Vm, Hm), errs = jax.lax.scan(step, (Vm0, Hm0), None, length=num_iters)
    V = Vm.T.reshape(M, C, kh)
    H = jnp.transpose(Hm.reshape(M, N, kw), (1, 0, 2))
    return V, H, errs
