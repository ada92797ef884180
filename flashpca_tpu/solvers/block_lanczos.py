"""Thick-restart BLOCK Lanczos eigensolver.

The scalar Lanczos solver (lanczos.py) is data-pass bound on TPU: each
step scans every packed genotype byte to apply ``X X^T`` to ONE vector,
while the fused decode kernels can apply it to a 8-32 column panel for
nearly the same cost (decode bandwidth dominates; the extra MXU columns
are free).  Block Lanczos amortizes each pass over a b-column panel --
the reference anticipates this with its matrix-operand operators
(``perform_op_mat`` / ``perform_op_multi``, svdwide.cpp:71-118,229-275)
and SURVEY.md section 7 calls it out explicitly.

Algorithm (Wu & Simon thick restart, generalized to blocks):

* Krylov basis V of ncv = m*b columns (+1 in-progress panel), built
  panel by panel: W = A Q_t; CGS2 full reorthogonalization against all
  of V (coefficients H_t = V^T A Q_t, exact column blocks of the
  projected matrix T, including the sub-diagonal couplings via the
  NEXT panel's CGS2 coefficients); jittered masked-CholQR panel
  orthonormalization with a final cleanup pass (W = Q_{t+1} R_t;
  R_t = Q_{t+1}^T W feeds the residual estimate and restart panel).
* The whole expansion of one restart cycle runs as ONE jitted
  ``lax.fori_loop`` on device; the host assembles the small symmetric
  T (ncv x ncv), solves it in float64, tests Spectra's convergence
  criterion, and performs the thick restart ``V <- V [S_kept | e_resid]``.
* Residual estimate for Ritz pair i: ``||R_last S[last b rows, i]||``;
  stagnation below sqrt(eps)*||A|| counts as converged (the finite-
  precision floor for clustered spectra).
* Rank-deficient panels deflate to exactly-zero columns and are
  replaced by fresh random directions with zero coupling (see
  _panel_orth / the inject branch).
"""

from __future__ import annotations

import functools
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from .lanczos import EigshResult, eigsh


def _panel_orth(W, rank_tol, abs_floor2=0.0):
    """Rank-revealing orthonormalization: W = Q R with Q^T Q = I on the
    numerically independent directions and ZERO columns elsewhere.

    Jittered Cholesky QR of the small Gram G = W^T W (b x b):
    L = chol(G + floor I), Q = W L^{-T}, R = L^T.  Deficient directions
    surface as tiny Cholesky pivots (L_ii^2 ~ floor) and are zeroed --
    after Krylov-space exhaustion a residual panel is cancellation noise
    of magnitude ~eps * ||A Q||, and normalizing that noise destroys
    basis orthogonality, so it must become zero columns instead.  The
    floor combines a within-panel relative tolerance (``rank_tol``) and
    an absolute one (``abs_floor2``, squared-norm scale of the panel
    before orthogonalization).

    CholQR (not an eigh polar factor) deliberately: XLA's f32 ``eigh``
    on TPU returns eigenvectors with ~1e-2 error, which poisons the
    basis; cholesky + triangular_solve orthonormalizes to ~1e-7.
    """
    b = W.shape[1]
    eps = float(np.finfo(np.dtype(W.dtype.name).name).eps)
    tiny = float(np.finfo(np.dtype(W.dtype.name).name).tiny) * 1e6
    eye = jnp.eye(b, dtype=W.dtype)

    G = jnp.dot(W.T, W, preferred_element_type=W.dtype,
                precision=lax.Precision.HIGHEST)
    # The jitter must dominate the Gram's own rounding (~eps * ||G||) or
    # cholesky of a rank-deficient panel goes NaN (negative trailing
    # pivots); the constant bottom keeps chol finite on an ALL-ZERO
    # panel (the steady state after Krylov exhaustion: A @ zeros = 0).
    # The jitter's bias on kept columns is removed by the explicit
    # renormalization below.
    floor = jnp.maximum(
        jnp.maximum(max(4.0 * b * eps, float(rank_tol))
                    * jnp.max(jnp.diagonal(G)), abs_floor2),
        tiny)

    # pass 1: detect deficient pivots
    L1 = jnp.linalg.cholesky(G + floor * eye)
    good = (jnp.diagonal(L1) ** 2 > 4.0 * floor).astype(W.dtype)

    # pass 2: refactorize with deficient columns exactly zero, so their
    # tiny pivots cannot contaminate the good columns' multipliers
    W2 = W * good[None, :]
    G2 = jnp.dot(W2.T, W2, preferred_element_type=W.dtype,
                 precision=lax.Precision.HIGHEST)
    L = jnp.linalg.cholesky(G2 + floor * eye)
    Q = solve_triangular(L, W2.T, lower=True).T * good[None, :]
    nq = jnp.linalg.norm(Q, axis=0)
    Q = Q / jnp.where(nq > 0, nq, 1.0)[None, :]
    # R as the exact projection of the ORIGINAL panel onto the final
    # basis: linearly DEPENDENT deficient columns (not just noise ones)
    # still carry real coupling, which a triangular factor of the
    # masked panel would silently drop.
    R = jnp.dot(Q.T, W, preferred_element_type=W.dtype,
                precision=lax.Precision.HIGHEST)
    return Q, R, good


@functools.lru_cache(maxsize=32)
def _scalar_mv_for(matvec):
    """Stable scalar adapter for panel matvecs (small-problem fallback
    to the scalar solver).  Cached so repeat solves on the same
    operator keep a stable function identity -- a fresh lambda per call
    would defeat the scalar solver's identity-keyed jit cache and
    recompile its whole cycle program every solve (review r2)."""
    return lambda x, *ops: matvec(x[:, None], *ops)[:, 0]


def _hoist(matvec, example, operands):
    """Return (pure_fn, operands) with ``pure_fn(x, *operands)``.

    A jitted function that references a device array as a CLOSURE or
    nested-jit constant embeds it as an MLIR constant -- which
    materializes the array on the HOST (a multi-GB download when the
    operand is the packed genotype matrix).  Callers should pass the
    big arrays via ``operands`` (see the operators' ``gram_pure``);
    for plain closures (tests, small problems) jax.closure_convert
    hoists DIRECT captures, but cannot see constants buried inside a
    nested jitted call -- those must come through ``operands``.
    """
    if operands:
        return matvec, tuple(operands)
    return jax.closure_convert(matvec, example)


@functools.lru_cache(maxsize=32)
def _expand_jit_for(mv, b, jitter):
    """Bounded cache of jitted cycle programs keyed by (matvec, b,
    jitter): operators return STABLE pure-closure identities, so repeat
    solves on the same operator reuse the compiled program instead of
    re-tracing, while the LRU bound keeps a long-running process that
    loops over many operators from accumulating compiled executables
    without limit (an unbounded module-level static-arg jit would)."""
    return jax.jit(
        partial(_expand_cycle_block, mv, b=b, jitter=jitter),
        static_argnames=("l", "nsteps"),
        donate_argnums=(0,),
    )


def _expand_cycle_block(matvec, V, key, consts, l, nsteps, b, jitter):
    """Expand panels t = 0..nsteps-1 starting at column l (static).

    ``matvec(Q, *consts)`` applies the operator.  Returns
    (V, H_all (nsteps, ncv+b, b), R_all (nsteps, b, b))."""
    n, ncvb = V.shape
    dtype = V.dtype

    def orth2(V, W):
        H1 = jnp.dot(V.T, W, precision=lax.Precision.HIGHEST)
        W = W - jnp.dot(V, H1, precision=lax.Precision.HIGHEST)
        H2 = jnp.dot(V.T, W, precision=lax.Precision.HIGHEST)
        W = W - jnp.dot(V, H2, precision=lax.Precision.HIGHEST)
        return W, H1 + H2

    def proj_out(B, X):
        return X - jnp.dot(B, jnp.dot(B.T, X,
                                      precision=lax.Precision.HIGHEST),
                           precision=lax.Precision.HIGHEST)

    def body(t, carry):
        V, H_all, R_all = carry
        cs = l + t * b
        Q = lax.dynamic_slice(V, (0, cs), (n, b))
        W = matvec(Q, *consts)
        scale2 = jnp.sum(W * W) / b           # pre-orth mean sq col norm
        Wo, H = orth2(V, W)
        Q1, _, _ = _panel_orth(Wo, jitter, jitter * scale2)
        # Normalizing near-deflated directions amplifies their residual
        # overlap with V by 1/norm -- clean with another CGS pass.
        Q1 = proj_out(V, Q1)
        Qn, _, good = _panel_orth(Q1, jitter)

        def inject(Qn):
            # Deflation: replace zeroed directions with FRESH random
            # ones orthogonal to everything (zero coupling) -- otherwise
            # A @ 0 = 0 freezes the expansion and the solver "converges"
            # on an incomplete subspace.  If the whole space is truly
            # exhausted the fresh panel cancels to noise below its
            # absolute floor and stays zero: the correct steady state.
            Z = jax.random.normal(jax.random.fold_in(key, t), (n, b), dtype)
            z2 = jnp.sum(Z * Z) / b
            Z, _ = orth2(V, Z)
            Z = proj_out(Qn, Z)
            Zq, _, _ = _panel_orth(Z, jitter, jitter * z2)
            return jnp.where(good[None, :] > 0, Qn, Zq)

        Qn = lax.cond(jnp.all(good > 0), lambda q: q, inject, Qn)
        # Final cleanup: jittered CholQR's orthogonality error scales as
        # eps * kappa^2 (up to ~1/(4b) for a panel at the rank floor);
        # one more V-projection + panel pass on the now well-conditioned
        # panel brings both V-orthogonality and within-panel
        # orthonormality down to ~eps.
        Qn = proj_out(V, Qn)
        Qn, _, _ = _panel_orth(Qn, jitter)
        # exact coupling of A Q_t onto the FINAL panel (a triangular
        # factor would not survive the cleanup rotations)
        R = jnp.dot(Qn.T, Wo, preferred_element_type=dtype,
                    precision=lax.Precision.HIGHEST)
        V = lax.dynamic_update_slice(V, Qn, (0, cs + b))
        H_all = H_all.at[t].set(H)
        R_all = R_all.at[t].set(R)
        return V, H_all, R_all

    H_all = jnp.zeros((nsteps, ncvb, b), V.dtype)
    R_all = jnp.zeros((nsteps, b, b), V.dtype)
    V, H_all, R_all = lax.fori_loop(0, nsteps, body, (V, H_all, R_all))
    # ONE stacked (nsteps, ncv+2b, b) output: the restart loop fetches
    # it in a single device->host transfer -- separate H/R fetches each
    # pay the per-transfer floor of a slow device link (measured 2x)
    return V, jnp.concatenate([H_all, R_all], axis=1)


@partial(jax.jit, static_argnames=("jitter",))
def _host_orth_step(V, W, jitter, scale2):
    """One panel-orthonormalization step against V (device helpers for
    the host-driven expansion used with streaming operators)."""
    H1 = jnp.dot(V.T, W, precision=lax.Precision.HIGHEST)
    W = W - jnp.dot(V, H1, precision=lax.Precision.HIGHEST)
    H2 = jnp.dot(V.T, W, precision=lax.Precision.HIGHEST)
    Wo = W - jnp.dot(V, H2, precision=lax.Precision.HIGHEST)
    H = H1 + H2
    Q1, _, _ = _panel_orth(Wo, jitter, jitter * scale2)
    Q1 = Q1 - jnp.dot(V, jnp.dot(V.T, Q1, precision=lax.Precision.HIGHEST),
                      precision=lax.Precision.HIGHEST)
    Qn, _, good = _panel_orth(Q1, jitter)
    Qn = Qn - jnp.dot(V, jnp.dot(V.T, Qn, precision=lax.Precision.HIGHEST),
                      precision=lax.Precision.HIGHEST)
    Qn, _, _ = _panel_orth(Qn, jitter)
    R = jnp.dot(Qn.T, Wo, preferred_element_type=V.dtype,
                precision=lax.Precision.HIGHEST)
    return Qn, H, R, good, Wo


@partial(jax.jit, static_argnames=("jitter",))
def _host_inject_step(V, Qn, Wo, Z, good, jitter, z2):
    """Deflation injection for the host-driven expansion -- the SAME
    math and ordering as the fused body's inject branch plus its
    post-merge cleanup and final R (inject -> merged proj_out(V) +
    panel_orth -> R against the final panel), with every dot pinned to
    HIGHEST.  ``Z`` arrives UN-normalized so the ``jitter * z2``
    absolute floor is scale-consistent (z2 ~ n), exactly like the
    fused twin -- running the full orth step on Z first would
    unit-normalize it and make the floor grow linearly with n."""
    hp = lax.Precision.HIGHEST
    H1 = jnp.dot(V.T, Z, precision=hp)
    Z = Z - jnp.dot(V, H1, precision=hp)
    H2 = jnp.dot(V.T, Z, precision=hp)
    Z = Z - jnp.dot(V, H2, precision=hp)
    Z = Z - jnp.dot(Qn, jnp.dot(Qn.T, Z, precision=hp), precision=hp)
    Zq, _, _ = _panel_orth(Z, jitter, jitter * z2)
    Qm = jnp.where(good[None, :] > 0, Qn, Zq)
    Qm = Qm - jnp.dot(V, jnp.dot(V.T, Qm, precision=hp), precision=hp)
    Qm, _, _ = _panel_orth(Qm, jitter)
    R = jnp.dot(Qm.T, Wo, preferred_element_type=V.dtype, precision=hp)
    return Qm, R


def _expand_cycle_host(matvec, V, key, l, nsteps, b, jitter):
    """Host-driven twin of _expand_cycle_block for NON-traceable
    matvecs (e.g. the streaming operator, whose product loops over
    host-staged blocks).  Same math, one host step per panel; the only
    blocking fetch per panel is the deflation flag (host control
    flow), H/R stay on device and come back in ONE stacked
    end-of-cycle transfer like the fused twin."""
    n = V.shape[0]
    dtype = V.dtype
    H_dev = []
    R_dev = []
    for t in range(nsteps):
        cs = l + t * b
        Q = V[:, cs: cs + b]
        W = matvec(Q)
        scale2 = jnp.sum(W * W) / b        # device scalar, no fetch
        Qn, H, R, good, Wo = _host_orth_step(V, W, jitter, scale2)
        if not bool(jnp.all(good > 0)):
            # fresh injection for deflated directions (see the fused
            # expansion's inject branch): merged-panel cleanup and the
            # final R happen inside the jitted helper
            Z = jax.random.normal(jax.random.fold_in(key, t), (n, b), dtype)
            z2 = jnp.sum(Z * Z) / b
            Qn, R = _host_inject_step(V, Qn, Wo, Z, good, jitter, z2)
        V = V.at[:, cs + b: cs + 2 * b].set(Qn)
        H_dev.append(H)
        R_dev.append(R)
    # same stacked (nsteps, ncv+2b, b) layout as the fused expansion;
    # ONE device->host transfer for the whole cycle's H/R
    HR = jnp.concatenate([jnp.stack(H_dev), jnp.stack(R_dev)], axis=1)
    return V, np.asarray(HR, dtype=np.float64)


def _colnorm1(Y):
    """Scale columns to unit norm (zero columns stay zero).  The polish
    sweep's input Y = A U has column norms spanning the whole spectrum
    (~theta_i); CholQR's deficiency floor is relative to the LARGEST
    column, so without this a VALID trailing PC with
    theta_i < ~sqrt(4k*eps)*theta_max would be zeroed as "deficient"
    (review r2).  Normalization keeps the column space and makes the
    rank test scale-free per column."""
    nrm = jnp.linalg.norm(Y, axis=0)
    return Y / jnp.where(nrm > 0, nrm, 1.0)[None, :]


@functools.lru_cache(maxsize=32)
def _polish_jits_for(mv, rank_tol):
    """Bounded cache of jitted polish programs (see _expand_jit_for)."""

    @jax.jit
    def sweep(U, consts):
        Y = _colnorm1(mv(U, *consts))
        Q, _, _ = _panel_orth(Y, rank_tol)
        Q, _, _ = _panel_orth(Q, rank_tol)
        return Q

    @jax.jit
    def project(U, consts):
        Y = mv(U, *consts)
        G = jnp.dot(U.T, Y, precision=lax.Precision.HIGHEST)
        return Y, G

    return sweep, project


@functools.lru_cache(maxsize=8)
def _orth2x_for(rank_tol):
    return jax.jit(lambda Y: _panel_orth(
        _panel_orth(_colnorm1(Y), rank_tol)[0], rank_tol)[0])


@jax.jit
def _gram_small_jit(U, Y):
    return jnp.dot(U.T, Y, precision=lax.Precision.HIGHEST)


@jax.jit
def _ff_resid_raw_jit(U, y_hi, y_lo):
    hp = lax.Precision.HIGHEST
    Y = y_hi + y_lo
    R = Y - jnp.dot(U, jnp.dot(U.T, Y, precision=hp), precision=hp)
    R = _colnorm1(R)
    R = R - jnp.dot(U, jnp.dot(U.T, R, precision=hp), precision=hp)
    return _colnorm1(R)


@jax.jit
def _mix_cols_jit(R, T):
    return jnp.dot(R, T, precision=lax.Precision.HIGHEST)


@jax.jit
def _combine_pair_jit(B, y_hi, y_lo, S):
    hp = lax.Precision.HIGHEST
    U = jnp.dot(B, S, precision=hp)
    return U, jnp.dot(y_hi, S, precision=hp), jnp.dot(y_lo, S, precision=hp)


def _ff_resid_panel(U, y_hi, y_lo):
    """Well-conditioned orthonormal panel spanning A U - U (U^T A U).

    The residual directions of clustered Ritz pairs are strongly
    CORRELATED, and f32 CholQR of a correlated panel leaves eps*kappa^2
    non-orthogonality -- measured 1.7e-2 at the headline scale, which
    makes the augmented metric near-singular and lets the small-problem
    errors (and the f32 cancellation noise of forming B @ S) eat the
    entire accuracy gain.  So: CGS2 against U in f32 (direction
    accuracy ~1e-3 is plenty), then a COMPENSATED Gram + host-f64
    eigendecomposition with rank truncation -- kept directions have
    Gram eigenvalues > 1e-4 * max, bounding both the mixing
    coefficients (<= ~100, so f32 mixing noise stays ~1e-5 relative)
    and the final metric's conditioning."""
    R = _ff_resid_raw_jit(U, y_hi, y_lo)
    from ..ops.compensated import gram_small_ff

    G = gram_small_ff(R)                        # f64 host, ff-accurate
    lam, V = np.linalg.eigh(G)
    keep = lam > 1e-4 * max(lam[-1], 1e-30)
    if not keep.any():
        return R[:, :0]
    T = V[:, keep] / np.sqrt(lam[keep])[None, :]
    return _mix_cols_jit(R, jnp.asarray(T, R.dtype))


def _ritz_generalized(H, M):
    """Solve the small generalized Rayleigh-Ritz problem H S = M S Θ.

    When a numerically dependent column slips past the residual-panel
    rank truncation, M is not positive definite and scipy's Cholesky
    path raises -- fall back to whitening against M's well-conditioned
    eigensubspace instead of pretending the basis is orthonormal
    (plain eigh(H) with a duplicated basis direction inflates that
    eigenvalue -- a doubled column reports 2λ -- and leaves B @ S
    denormalized, corrupting d/pve and PC scaling downstream).  Either
    path returns S with SᵀMS = I on the kept subspace, so theta are
    true Rayleigh quotients and B @ S columns stay unit-norm."""
    from scipy.linalg import LinAlgError
    from scipy.linalg import eigh as _geigh

    try:
        return _geigh(H, M)
    except LinAlgError:
        return _ritz_whitened(H, M)


def _ritz_whitened(H, M):
    """Rank-truncated whitening solve of H S = M S Θ (see
    _ritz_generalized; split out so the rare fallback stays tested)."""
    lam_m, V_m = np.linalg.eigh(M)
    keep = lam_m > 1e-10 * max(lam_m[-1], 1e-30)
    W = V_m[:, keep] / np.sqrt(lam_m[keep])[None, :]
    theta, S_w = np.linalg.eigh(W.T @ H @ W)
    return theta, W @ S_w


@jax.jit
def _ff_resid_norms_jit(U, y_hi, y_lo, theta):
    """Per-column ff-accurate residual norms ||A u_i - theta_i u_i||:
    y = (y_hi, y_lo) is the two-float A U.  The f32 theta*U product
    adds only ~eps*theta of noise per column -- orders below the
    post-polish residual (~1e-8 * ||A|| scale * sqrt(n))."""
    d1 = y_hi - U * theta[None, :]
    r = d1 + y_lo
    return jnp.sqrt(jnp.sum(r * r, axis=0))


def _ff_krylov_refine(ff_gram, U, k, rounds: int = 1,
                      return_resid: bool = False):
    """Block-Krylov refinement over the COMPENSATED operator.

    The f32-built Krylov basis contains each eigenvector only to
    ~(f32 product noise), spread white across the whole complement --
    and no f32 product can see past that: the residual directions are
    the same size as the product noise.  Each round takes ONE
    compensated data pass on the current residual panel, RETAINS it as
    a basis block, and re-solves the small Rayleigh-Ritz problem with
    an ff-accurate projected matrix H and metric M (generalized: f32
    CGS cannot make the basis orthonormal beyond ~1e3*eps, and
    pretending it is re-injects exactly the error being removed).

    One round exactifies every pair whose residual directions the
    panel spans; polish_subspace interleaves an f32 sweep between two
    rounds to reweight the surviving full-spectrum error (stacking
    rounds without the sweep stalls -- measured).  Cost per round: one
    compensated data pass of k columns.
    """
    from ..ops.compensated import gram_small_ff, ritz_ff

    y_hi, y_lo = ff_gram(U)
    B, Yh, Yl = U, y_hi, y_lo         # all basis blocks + their A-images
    theta = None
    for r in range(rounds):
        R = _ff_resid_panel(U, y_hi, y_lo)
        if R.shape[1]:
            rh, rl = ff_gram(R)
            B = jnp.concatenate([B, R], axis=1)
            Yh = jnp.concatenate([Yh, rh], axis=1)
            Yl = jnp.concatenate([Yl, rl], axis=1)
        H = ritz_ff(B, Yh, Yl)
        H = 0.5 * (H + H.T)
        M = gram_small_ff(B)
        theta, S = _ritz_generalized(H, M)
        order = np.argsort(theta)[::-1][:k]
        theta = theta[order]
        S = jnp.asarray(S[:, order], dtype=U.dtype)
        # U and A U for the next residual panel WITHOUT a new data
        # pass: combine the stored block images (f32 recombination
        # noise ~eps only steers the next panel, never the answer)
        U, y_hi, y_lo = _combine_pair_jit(B, Yh, Yl, S)
    if return_resid:
        # ff-accurate per-pair residuals at exit, no extra data pass --
        # lets the caller MEASURE the check contract instead of
        # assuming it (one small device reduction + a k-scalar fetch)
        resid = np.asarray(_ff_resid_norms_jit(
            U, y_hi, y_lo, jnp.asarray(theta, dtype=U.dtype)),
            dtype=np.float64)
        return theta, U, resid
    return theta, U


def polish_subspace(matvec, U, *, iters: int = 2, operands=(), fused=True,
                    ff_gram=None, return_resid=False):
    """Refine converged Ritz vectors by orthogonal (subspace) iteration
    with a final host-f64 Rayleigh-Ritz.

    After many f32 restart cycles the Krylov basis carries accumulated
    rounding drift; a couple of fresh ``orth(A U)`` sweeps followed by
    one small Rayleigh-Ritz rotation removes it and recovers accuracy
    near the single-matvec f32 noise floor.  Returns (theta, U) with
    theta descending and U exactly renormalized.  ``fused=False`` for
    non-traceable matvecs (streaming operators).

    ``ff_gram`` (optional): an operator's compensated two-float gram
    (``gram_ff_permuted``-style callable, xp -> (y_hi, y_lo)).  When
    given, the final step becomes a Rayleigh-Ritz over the AUGMENTED
    basis [U | orth(A U - U (U^T A U))] with both the products and the
    projected matrix in two-float precision.  Rationale: f32 products
    carry ~1e3*eps accumulation noise, so (a) an f32-converged subspace
    floors at residual ~noise (mse ~2e-8 at the reference's headline
    scale -- above its mse < 1e-8 contract, README.md:207), and (b) the
    true residual directions A u - theta u are the SAME SIZE as that
    noise, so no f32 product can see them.  The ff product resolves
    them; keeping 2k columns lets the small f64 eigenproblem remove the
    residual from the returned pairs (measured: mse 2.3e-8 -> < 1e-10
    at 501,760 x 100,352, k=20).  Two extra compensated data passes;
    the sweeps stay f32.
    """
    k = U.shape[1]
    rank_tol = (100 * float(np.finfo(np.dtype(U.dtype.name).name).eps)) ** 2
    if fused:
        mv_pure, consts = _hoist(matvec, jnp.zeros(U.shape, U.dtype),
                                 operands)
        sweep, project = _polish_jits_for(mv_pure, rank_tol)
    else:
        mv_host = ((lambda Q: matvec(Q, *operands)) if operands else matvec)
        mv_pure, consts = (lambda Q: mv_host(Q)), ()
        orth2x = _orth2x_for(rank_tol)

        def sweep(U, consts):
            return orth2x(mv_pure(U))

        def project(U, consts):
            Y = mv_pure(U)
            return Y, _gram_small_jit(U, Y)

    for _ in range(iters):
        U = sweep(U, consts)
    if ff_gram is not None:
        # refine -> sweep -> refine: the first pass exactifies the pairs
        # within reach of the current basis; the f32 sweep pulls the
        # surviving (white, full-spectrum) error toward the spectrum
        # top where the second refinement's residual panel can see it.
        # Measured at 501,760 x 100,352 k=20 (+8 buffer pairs): check
        # mse 2.3e-8 -> ~1.1e-9, vs ~8e-9 for sweep-only interleaves
        # and a ~2e-8 stall for refinement-only stacking.
        _, U = _ff_krylov_refine(ff_gram, U, k, rounds=1)
        U = sweep(U, consts)
        return _ff_krylov_refine(ff_gram, U, k, rounds=1,
                                 return_resid=return_resid)
    Y, G = project(U, consts)
    G = np.asarray(G, dtype=np.float64)
    G = 0.5 * (G + G.T)
    theta, S = np.linalg.eigh(G)
    order = np.argsort(theta)[::-1][:k]
    theta = theta[order]
    S = S[:, order]
    U = jnp.dot(U, jnp.asarray(S, dtype=U.dtype),
                precision=lax.Precision.HIGHEST)
    return theta, U


def eigsh_block(
    matvec,
    n: int,
    nev: int,
    *,
    block: int = 16,  # measured-best panel width (docs/PERFORMANCE.md)
    ncv: int | None = None,
    maxiter: int = 500,
    tol: float = 1e-6,
    dtype=jnp.float32,
    seed: int = 1,
    v0: np.ndarray | None = None,
    verbose: bool = False,
    operands=(),
    fused: bool = True,
    checkpoint_every: int = 0,
    checkpoint_fn=None,
) -> EigshResult:
    """Largest-algebraic eigenpairs via thick-restart block Lanczos.

    ``matvec`` must accept (n, b) panels; when ``fused`` (default) it
    must also be traceable -- big device arrays go through ``operands``
    (called as ``matvec(Q, *operands)``) so they stay device-side
    arguments.  ``fused=False`` drives the expansion from the host for
    NON-traceable matvecs (e.g. StreamingPackedOperator, which stages
    host-resident blocks inside its product).  Falls back to the scalar
    solver when the problem is too small for blocking.

    ``checkpoint_every=R`` (with a ``checkpoint_fn``) calls
    ``checkpoint_fn(panel, values, residuals)`` after every R-th thick
    restart with the current top Ritz panel (device array, up to one
    solver panel of columns -- what a later ``v0`` warm start consumes).
    This is mid-run fault tolerance: the solve survives PROCESS death,
    not just a maxiter cap (the reference has nothing like it, SURVEY
    section 5 "no checkpoint/resume").  Persisting fetches the (n, b)
    panel to host each time -- trivial on local hardware, slow over a
    thin device link, hence opt-in.  (The small-problem scalar fallback
    below solves in a handful of seconds and does not checkpoint.)

    Callers that need buffer pairs beyond the dimensions they will
    return (the ff polish meeting the check contract, models/pca.py)
    solve nev = k + buffer: best-effort buffers extracted from the
    final basis without convergence gating were measured insufficient
    (the polish stalls ~2x above the contract), and gating buffers on a
    looser tolerance lost to the stagnation exit (the stall counter
    watches the first nev, which floor first).  ``conv_mask`` in the
    result tells such callers WHICH pairs met tolerance.
    """
    if maxiter < 1:
        raise ValueError("maxiter must be >= 1")
    b = int(block)
    ncv_user = ncv

    def _ncv_for(bb):
        if ncv_user is not None:
            cc = ncv_user
        else:
            # Block Krylov spaces need more room than scalar Lanczos'
            # 2*nev+1; ~4*nev (rounded up to whole panels) measured best
            # on structured genotype spectra.  Full-bench sweep at
            # 501,760 x 100,352 (b=16): 4*nev converges in 16/21/79
            # panel ops at k=20/10/40 vs 39/39/88 with a +2-panel
            # slack (the committed bench's own pca() run: 15 at k=20;
            # the sweep harness seeds its own init) --
            # the extra basis room makes each thick restart KEEP more,
            # expanding less usefully per data pass.  The max() keeps a
            # panel of post-restart headroom for small nev.
            cc = max(4 * nev, nev + 2 * bb)
            cc = bb * (-(-cc // bb))
            cc = min(cc, bb * ((n - bb) // bb))
        return bb * (cc // bb) if cc % bb else cc

    ncv = _ncv_for(b)
    # require a full panel of headroom beyond the basis (ncv + 2b <= n):
    # when ncv + b == n the Krylov basis saturates the whole space and
    # the deflation-injection cycle can stall above the tolerance
    if ncv + 2 * b > n or nev + b > ncv or b < 2:
        if fused:
            if checkpoint_fn is not None and checkpoint_every > 0:
                # the scalar solver has no checkpoint hook; a caller who
                # asked for mid-run fault tolerance must hear it is off
                import warnings
                warnings.warn(
                    "problem too small for the block solver; falling "
                    "back to scalar Lanczos, which does NOT take "
                    "mid-run checkpoints (checkpoint_every ignored; "
                    "the end-of-solve state write still happens)",
                    RuntimeWarning, stacklevel=2)
            return eigsh(_scalar_mv_for(matvec),
                         n, nev, maxiter=maxiter, tol=tol, dtype=dtype,
                         seed=seed, v0=v0, operands=operands)
        # The scalar solver jits its whole expansion cycle -- tracing a
        # NON-traceable streaming matvec there would embed its
        # host-staged blocks as jit constants (ADVICE r1).  Shrink the
        # panel until the host-driven block expansion fits instead.
        bb = b // 2
        while bb >= 2:
            cc = _ncv_for(bb)
            if cc + 2 * bb <= n and nev + bb <= cc:
                b, ncv = bb, cc
                break
            bb //= 2
        else:
            raise ValueError(
                f"problem too small for the host-driven block solver "
                f"(n={n}, nev={nev}, ncv={ncv_user}); use a resident "
                "operator (fused matvec) instead"
            )

    eps = float(np.finfo(np.dtype(dtype).name).eps)
    eps23 = eps ** (2.0 / 3.0)
    # absolute deflation floor scale for _panel_orth (squared-norm
    # units, multiplied by each panel's pre-orthogonalization scale)
    jitter = (100 * eps) ** 2

    rng = np.random.default_rng(seed)
    Q0 = rng.standard_normal((n, b))
    if v0 is not None:
        # warm start: a vector seeds the first column; an (n, j) panel
        # (e.g. Ritz vectors saved from an earlier run -- the
        # checkpoint/restart story) seeds up to b columns
        v0 = np.asarray(v0, dtype=np.float64)
        if v0.ndim == 1:
            Q0[:, 0] = v0
        else:
            j = min(b, v0.shape[1])
            Q0[:, :j] = v0[:, :j]
    Q0, _ = np.linalg.qr(Q0)

    V = jnp.zeros((n, ncv + b), dtype=dtype)
    V = V.at[:, :b].set(jnp.asarray(Q0, dtype=dtype))
    key = jax.random.PRNGKey(seed)

    if fused:
        mv_pure, consts = _hoist(matvec, jnp.zeros((n, b), dtype), operands)
        expand_jit = _expand_jit_for(mv_pure, b, jitter)

        def expand(V, key, consts, l, nsteps):
            return expand_jit(V, key, consts, l=l, nsteps=nsteps)
    else:
        mv_host = ((lambda Q: matvec(Q, *operands)) if operands else matvec)

        def expand(V, key, consts, l, nsteps):
            return _expand_cycle_host(mv_host, V, key, l, nsteps, b, jitter)

        consts = ()

    nops = 0
    l = 0
    theta_kept = np.zeros(0)
    theta = np.zeros(nev)
    resid = np.full(nev, np.inf)
    S_keep = None
    converged = False
    restart = 0
    best_resid = np.inf
    stall = 0

    import time as _time

    for restart in range(maxiter):
        nsteps = (ncv - l) // b
        key, sub = jax.random.split(key)
        _t0 = _time.time()
        V, HR_d = expand(V, sub, consts, l=l, nsteps=nsteps)
        _t1 = _time.time()
        nops += nsteps
        # one fetch: stacked (nsteps, ncv+2b, b) = [H | R] along axis 1
        HR = np.asarray(HR_d, dtype=np.float64)
        H, R = HR[:, : ncv + b], HR[:, ncv + b:]
        _t2 = _time.time()

        # -- assemble symmetric T on host -----------------------------------
        T = np.zeros((ncv, ncv), dtype=np.float64)
        if l > 0:
            T[:l, :l] = np.diag(theta_kept)
        for t in range(nsteps):
            cs = l + t * b
            T[: cs + b, cs: cs + b] = H[t, : cs + b]
            D = T[cs: cs + b, cs: cs + b]
            T[cs: cs + b, cs: cs + b] = 0.5 * (D + D.T)
            T[cs: cs + b, : cs] = T[: cs, cs: cs + b].T
            # (no R[t] writes here: step t+1's H column block and the
            # symmetrization copy cover the off-diagonal coupling --
            # H[t+1] rows cs..cs+b ARE Q_t^T A Q_{t+1}, measured by
            # CGS2 against the final basis.  Only R_last is consumed,
            # for residual estimates and the restart panel.)
        R_last = R[nsteps - 1]

        theta_all, S = np.linalg.eigh(T)
        order = np.argsort(theta_all)[::-1]
        theta_all = theta_all[order]
        S = S[:, order]
        res_all = np.linalg.norm(R_last @ S[ncv - b:, :], axis=0)

        theta = theta_all[:nev]
        resid = res_all[:nev]
        # Spectra-style per-pair tolerance, except the roundoff floor
        # scales with ||A|| ~= theta_max (the achievable f32/f64 residual
        # for ANY pair is ~eps * ||A||, not eps * |theta_i|).
        theta_max = max(abs(theta_all[0]), 1e-300)
        thresh = np.maximum(eps23 * theta_max,
                            tol * np.maximum(np.abs(theta), 1e-300))
        nconv = int(np.sum(resid <= thresh))
        if verbose:
            import sys
            print(f"eigsh_block cycle {restart}: nconv={nconv}/{nev} "
                  f"max_resid={resid.max():.3e} theta_max={theta_max:.4e} "
                  f"[dispatch {_t1 - _t0:.2f}s fetch {_t2 - _t1:.2f}s]",
                  file=sys.stderr, flush=True)
        # Stagnation acceptance: for clustered spectra the attainable
        # residual in finite precision is ~eps * ||A|| amplified by the
        # inverse relative gap; when residuals stop improving but sit
        # below sqrt(eps) * ||A||, that floor has been reached -- accept
        # (the f32 path then refines vectors via polish_subspace).
        rmax = float(resid.max())
        if rmax > 0.9 * best_resid:
            stall += 1
        else:
            stall = 0
        best_resid = min(best_resid, rmax)
        at_floor = rmax <= np.sqrt(eps) * theta_max
        if (nconv >= nev or restart == maxiter - 1
                or (stall >= 5 and at_floor)):
            converged = nconv >= nev or (stall >= 5 and at_floor)
            conv_mask = resid <= thresh
            S_keep = S[:, :nev]
            break

        # -- thick restart ---------------------------------------------------
        l = b * min(ncv // b - 1,
                    max(1, -(-(nev + (ncv - nev) // 2) // b)))
        theta_kept = theta_all[:l]
        S_pad = np.zeros((ncv + b, ncv + b), dtype=np.float64)
        S_pad[:ncv, :l] = S[:, :l]
        S_pad[ncv:, l: l + b] = np.eye(b)        # residual panel -> col l
        V = jnp.dot(V, jnp.asarray(S_pad, dtype=dtype),
                    precision=lax.Precision.HIGHEST)

        # after the rotation, V[:, :l] ARE the kept Ritz vectors
        # (theta_kept, descending) -- a checkpoint costs no extra
        # device compute, just the panel fetch inside checkpoint_fn
        if (checkpoint_fn is not None and checkpoint_every > 0
                and (restart + 1) % checkpoint_every == 0):
            m = min(l, b)   # a v0 warm start seeds at most one panel
            # res_all[:m] pairs 1:1 with theta_kept[:m] so the saved
            # state is self-consistent (vectors/values/residuals all m)
            checkpoint_fn(V[:, :m], theta_kept[:m].copy(),
                          res_all[:m].copy())

    S_pad = np.zeros((ncv + b, S_keep.shape[1]), dtype=np.float64)
    S_pad[:ncv] = S_keep
    U = jnp.dot(V, jnp.asarray(S_pad, dtype=dtype),
                precision=lax.Precision.HIGHEST)

    return EigshResult(
        eigenvalues=theta.copy(),
        eigenvectors=U,
        n_restarts=restart + 1,
        n_ops=nops,
        converged=converged,
        residuals=resid.copy(),
        conv_mask=conv_mask.copy(),
    )
