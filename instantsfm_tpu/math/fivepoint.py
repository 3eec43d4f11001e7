"""Batched Nistér 5-point minimal essential-matrix solver.

TPU-native replacement for the minimal solver inside OpenCV's
``cv2.findEssentialMat`` (used by the reference at
``processors/relpose_estimation.py:52``).  The classical algorithm
(Nistér, "An Efficient Solution to the Five-Point Relative Pose Problem",
PAMI 2004) is re-expressed in fixed-shape batched form:

1. 4-dim nullspace of the 5x9 epipolar constraint matrix via eigh of AtA
   (TPU-friendly: symmetric eig only).
2. The ten cubic constraints (det(E)=0 and 2*E*Et*E - tr(E*Et)*E = 0) are
   assembled with precomputed monomial multiplication tables (einsum over
   0/1 tensors) instead of symbolic expansion.
3. Batched Gauss-Jordan with partial pivoting reduces the 10x20 system;
   rows are regrouped into the 3x3 polynomial matrix B(z) whose
   determinant is the degree-10 polynomial n(z).
4. Real roots of n(z): nonsymmetric eigendecomposition (companion matrix)
   is unavailable on TPU, so roots are isolated with a homogeneous-angle
   sweep — evaluate n_h(sin t, cos t) on a fixed grid of t in (-pi/2, pi/2)
   (z = tan t covers the whole real line with bounded arithmetic), detect
   sign changes, bisect a fixed number of iterations, then Newton-polish in
   z.  Even-multiplicity roots between grid points can be missed; in the
   RANSAC setting that only weakens one hypothesis out of hundreds.
5. For every root, [x, y, 1] spans the null space of B(z); recovered from
   the best-conditioned cross product of two rows.

Every step is static-shape and vmappable over (pairs x hypotheses).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_EPS = 1e-12

# ------------------------------------------------------- monomial machinery
# Polynomials in (x, y, z) up to degree 3, plus univariate polys in z.
# Fixed orderings; multiplication = einsum with a precomputed 0/1 table.

_DEG1 = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]       # x, y, z, 1

_DEG2 = [(i, j, k) for i in range(3) for j in range(3) for k in range(3)
         if i + j + k <= 2]                                  # 10 monomials

# Nistér column order: first ten eliminate to the identity, the tail ten are
# grouped as x*poly(z), y*poly(z), poly(z).
_DEG3 = [(3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
         (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
         (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
         (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0)]


def _mul_table(basis_a, basis_b, basis_out):
    out_index = {m: i for i, m in enumerate(basis_out)}
    T = np.zeros((len(basis_a), len(basis_b), len(basis_out)), np.float32)
    for i, ma in enumerate(basis_a):
        for j, mb in enumerate(basis_b):
            m = (ma[0] + mb[0], ma[1] + mb[1], ma[2] + mb[2])
            T[i, j, out_index[m]] = 1.0
    return T


_T11 = _mul_table(_DEG1, _DEG1, _DEG2)       # deg1 * deg1 -> deg2
_T21 = _mul_table(_DEG2, _DEG1, _DEG3)       # deg2 * deg1 -> deg3


def _table_mul(a, b, T):
    """sum_ij a_i b_j T[i,j,k] as outer-product-flatten + ONE [ij, k] matmul.

    XLA lowers the naive three-operand einsum to per-problem tiny batched
    matmuls (~1% MXU tile utilization, bf16-rounded); flattening the batch
    into matmul rows makes it a single large MXU contraction (the same fix as
    the LM engine's system products, solve/block_lm.py)."""
    ab = (a[..., :, None] * b[..., None, :]).reshape(a.shape[:-1] + (-1,))
    Tf = jnp.asarray(T.reshape(-1, T.shape[-1]), a.dtype)
    return jax.lax.dot_general(ab, Tf, (((ab.ndim - 1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=a.dtype)


def _mul11(a, b):
    return _table_mul(a, b, _T11)


def _mul21(a, b):
    return _table_mul(a, b, _T21)


def _polymul_table(na, nb):
    T = np.zeros((na, nb, na + nb - 1), np.float32)
    for i in range(na):
        for j in range(nb):
            T[i, j, i + j] = 1.0
    return T


def _polymul(a, b):
    """Univariate poly product, descending-degree coefficient vectors."""
    return _table_mul(a, b, _polymul_table(a.shape[-1], b.shape[-1]))


# ------------------------------------------------------------ core pipeline

def _nullspace4(x1, x2):
    """Orthonormal basis of the 4-dim nullspace of the 5x9 constraint
    matrix, via 5 batched Householder reflections (QR of the transpose).

    x1, x2: [..., 5, 2] normalized image coords.  Returns basis
    [..., 4, 3, 3] so that E = xs*B0 + ys*B1 + zs*B2 + B3.

    Any orthonormal nullspace basis is equivalent for Nistér's algorithm
    (E is re-parameterized over it), so the eigenvector choice of
    ``eigh(AtA)`` is not needed — and batched small eigh is the TPU wall:
    measured 12 us per 9x9 on v5e (~600 ms for one RANSAC chunk's 49k
    samples, 90% of the solver; PERF_NOTES.md).  The unrolled reflections
    are pure vectorized elementwise ops."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(u1)
    rows = jnp.stack([u2 * u1, u2 * v1, u2,
                      v2 * u1, v2 * v1, v2,
                      u1, v1, one], axis=-1)                 # [..., 5, 9]
    A = jnp.swapaxes(rows, -1, -2)                           # [..., 9, 5]
    dtype = A.dtype
    eps = jnp.asarray(1e-30, dtype)
    idx = jnp.arange(9)

    # Householder QR of A: after k steps column k is zero below the
    # diagonal.  Store the reflectors (padded to 9) to build Q's tail.
    vs = []
    for k in range(5):
        x = jnp.where(idx >= k, A[..., :, k], 0.0)           # [..., 9]
        xk = x[..., k]
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1) + eps)
        alpha = -jnp.sign(jnp.where(xk == 0, 1.0, xk)) * norm
        v = x - alpha[..., None] * (idx == k)
        vn = jnp.sqrt(jnp.sum(v * v, axis=-1) + eps)
        # degenerate column (already zero): identity reflector
        v = jnp.where((norm > 1e-12)[..., None], v / vn[..., None],
                      (idx == k).astype(dtype))
        vs.append(v)
        A = A - 2.0 * v[..., :, None] * jnp.sum(
            v[..., :, None] * A, axis=-2, keepdims=True)

    # nullspace columns: q_j = H0 H1 H2 H3 H4 e_{5+j}
    cols = []
    for j in range(4):
        q = jnp.broadcast_to((idx == 5 + j).astype(dtype),
                             A.shape[:-2] + (9,))
        for v in reversed(vs):
            q = q - 2.0 * v * jnp.sum(v * q, axis=-1, keepdims=True)
        cols.append(q)
    basis = jnp.stack(cols, axis=-2)                         # [..., 4, 9]
    return basis.reshape(basis.shape[:-1] + (3, 3))


def _constraint_matrix(basis):
    """Ten cubic constraints as a [..., 10, 20] coefficient matrix over
    the _DEG3 monomials.  basis: [..., 4, 3, 3]."""
    # E entries as deg1 polynomials: Ep[..., i, j, 4] with coeff order x,y,z,1
    Ep = jnp.moveaxis(basis, -3, -1)                         # [..., 3, 3, 4]

    def e(i, j):
        return Ep[..., i, j, :]

    # det(E) = 0
    def minor(a, b, c, d):
        return _mul11(e(*a), e(*b)) - _mul11(e(*c), e(*d))

    det = (_mul21(minor((1, 1), (2, 2), (1, 2), (2, 1)), e(0, 0))
           + _mul21(minor((1, 2), (2, 0), (1, 0), (2, 2)), e(0, 1))
           + _mul21(minor((1, 0), (2, 1), (1, 1), (2, 0)), e(0, 2)))

    # 2*E*Et*E - tr(E*Et)*E = 0   (nine equations)
    M = [[None] * 3 for _ in range(3)]                       # E Et, deg2
    for i in range(3):
        for j in range(3):
            M[i][j] = sum(_mul11(e(i, k), e(j, k)) for k in range(3))
    tr = M[0][0] + M[1][1] + M[2][2]
    eqs = [det]
    for i in range(3):
        for j in range(3):
            Cij = [2.0 * M[i][k] - (tr if k == i else 0.0) for k in range(3)]
            eqs.append(sum(_mul21(Cij[k], e(k, j)) for k in range(3)))
    return jnp.stack(eqs, axis=-2)                           # [..., 10, 20]


def _gauss_jordan10(A):
    """Reduce [..., 10, 20] to [I | G] over the first ten columns with
    partial pivoting.  Returns (G [..., 10, 10], ok [...])."""
    n = 10
    ok = jnp.ones(A.shape[:-2], bool)
    rowidx = jnp.arange(n)
    for i in range(n):
        col = jnp.abs(A[..., :, i])
        col = jnp.where(rowidx < i, -jnp.inf, col)
        p = jnp.argmax(col, axis=-1)                         # [...]
        pv = jnp.take_along_axis(col, p[..., None], axis=-1)[..., 0]
        ok = ok & (pv > 1e3 * jnp.finfo(A.dtype).tiny)
        # swap rows i <-> p with ONE single-row gather + where-blend (a
        # whole-matrix permutation gather hits XLA's slow fused-gather path)
        Ap = jnp.take_along_axis(A, p[..., None, None], axis=-2)  # [..., 1, 20]
        Ai = A[..., i:i + 1, :]
        mask_i = (rowidx == i)[:, None]
        mask_p = (rowidx == p[..., None])[..., None]
        A = jnp.where(mask_i, Ap, jnp.where(mask_p, Ai, A))
        piv = A[..., i, :]
        piv = piv / jnp.where(jnp.abs(piv[..., i:i + 1]) < _EPS, 1.0,
                              piv[..., i:i + 1])
        fac = A[..., :, i:i + 1]
        A = A - fac * piv[..., None, :]
        A = jnp.where((rowidx == i)[..., :, None], piv[..., None, :], A)
    return A[..., 10:], ok


def _klm_rows(G):
    """Build the 3x3 polynomial matrix B(z) rows from the reduced tail G.

    Rows of G lead with monomials [x3, y3, x2y, xy2, x2z, x2, y2z, y2,
    xyz, xy]; tail columns are [xz2, xz, x, yz2, yz, y, z3, z2, z, 1].
    k = <row4> - z<row5>, l = <row6> - z<row7>, m = <row8> - z<row9>.
    Returns (bx [..., 3, 4], by [..., 3, 4], b1 [..., 3, 5]) stacked over
    (k, l, m); coefficients descending in z.
    """
    def combine(a, b):
        # a - z*b over the tail monomials
        cx = jnp.stack([-b[..., 0], a[..., 0] - b[..., 1],
                        a[..., 1] - b[..., 2], a[..., 2]], axis=-1)
        cy = jnp.stack([-b[..., 3], a[..., 3] - b[..., 4],
                        a[..., 4] - b[..., 5], a[..., 5]], axis=-1)
        c1 = jnp.stack([-b[..., 6], a[..., 6] - b[..., 7],
                        a[..., 7] - b[..., 8], a[..., 8] - b[..., 9],
                        a[..., 9]], axis=-1)
        return cx, cy, c1

    kx, ky, k1 = combine(G[..., 4, :], G[..., 5, :])
    lx, ly, l1 = combine(G[..., 6, :], G[..., 7, :])
    mx, my, m1 = combine(G[..., 8, :], G[..., 9, :])
    bx = jnp.stack([kx, lx, mx], axis=-2)
    by = jnp.stack([ky, ly, my], axis=-2)
    b1 = jnp.stack([k1, l1, m1], axis=-2)
    return bx, by, b1


def _det_poly(bx, by, b1):
    """Degree-10 polynomial det B(z), coefficients descending: [..., 11]."""
    kx, lx, mx = bx[..., 0, :], bx[..., 1, :], bx[..., 2, :]
    ky, ly, my = by[..., 0, :], by[..., 1, :], by[..., 2, :]
    k1, l1, m1 = b1[..., 0, :], b1[..., 1, :], b1[..., 2, :]
    t1 = _polymul(ly, m1) - _polymul(l1, my)                 # [..., 8]
    t2 = _polymul(lx, m1) - _polymul(l1, mx)                 # [..., 8]
    t3 = _polymul(lx, my) - _polymul(ly, mx)                 # [..., 7]
    return _polymul(kx, t1) - _polymul(ky, t2) + _polymul(k1, t3)


def _eval_homog(coef, s, c):
    """Evaluate sum_i coef[i] * s^(n-i) * c^i (descending coeffs) — the
    homogenized polynomial at z = s/c, scaled by c^n.  Bounded for all
    angles, so the sweep covers the whole real line."""
    n = coef.shape[-1] - 1
    acc = coef[..., 0:1] * jnp.ones_like(s)
    cp = jnp.ones_like(c)
    for i in range(1, n + 1):
        cp = cp * c
        acc = acc * s + coef[..., i:i + 1] * cp
    return acc


NUM_ROOT_SLOTS = 14         # 10 sign-change isolations + 4 dip-Newton seeds


def _real_roots10(coef, grid=512, bisect_iters=40, newton_iters=2,
                  n_dips=4, dip_newton_iters=24):
    """Real roots of a degree-10 polynomial (descending coeffs).

    Returns (roots [..., 14], valid [..., 14]).  Odd-multiplicity roots are
    isolated by sign changes of the homogenized polynomial on a fixed angle
    grid (z = tan t) and refined by bisection + Newton.  Root *pairs* closer
    than one grid cell produce no sign change; those cells show up as local
    minima of |f| instead — the ``n_dips`` deepest same-sign dips seed plain
    Newton iterations, accepted under a backward-error test
    |n(z)| <= tol * sum_i |a_i z^i|.
    """
    dtype = coef.dtype
    scale = jnp.max(jnp.abs(coef), axis=-1, keepdims=True)
    coef = coef / jnp.maximum(scale, _EPS)

    half = np.pi / 2 - 1e-4
    theta = jnp.linspace(-half, half, grid, dtype=dtype)
    f = _eval_homog(coef, jnp.sin(theta), jnp.cos(theta))    # [..., G]
    sgn = jnp.sign(f)
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    change = sgn[..., :-1] * sgn[..., 1:] < 0                # [..., G-1]
    cum = jnp.cumsum(change, axis=-1)
    slot = jnp.arange(1, 11, dtype=cum.dtype)                # [10]
    sel = change[..., None, :] & (cum[..., None, :] == slot[:, None])
    valid = jnp.any(sel, axis=-1)                            # [..., 10]
    g = jnp.argmax(sel, axis=-1)                             # [..., 10]

    lo = theta[g]
    hi = theta[g + 1]
    flo = jnp.take_along_axis(f, g, axis=-1)

    def body(_, carry):
        lo, hi, flo = carry
        mid = 0.5 * (lo + hi)
        fm = _eval_homog(coef, jnp.sin(mid), jnp.cos(mid))
        left = flo * fm < 0
        return (jnp.where(left, lo, mid), jnp.where(left, mid, hi), flo)

    lo, hi, _ = jax.lax.fori_loop(0, bisect_iters, body, (lo, hi, flo))
    z = jnp.tan(0.5 * (lo + hi))

    dcoef = coef[..., :-1] * jnp.arange(10, 0, -1, dtype=dtype)

    def horner(c, x):
        acc = jnp.broadcast_to(c[..., :1], x.shape)
        for i in range(1, c.shape[-1]):
            acc = acc * x + c[..., i:i + 1]
        return acc

    # Newton polish of the bisection roots
    for _ in range(newton_iters):
        fz = horner(coef, z)
        fpz = horner(dcoef, z)
        step = fz / jnp.where(jnp.abs(fpz) < _EPS, 1.0, fpz)
        znew = z - step
        use = (jnp.abs(fpz) > _EPS) & (jnp.abs(z) < 1e4) \
            & (jnp.abs(horner(coef, znew)) < jnp.abs(fz))
        z = jnp.where(use, znew, z)

    # Dip candidates: interior local minima of |f| with no adjacent sign flip
    af = jnp.abs(f)
    interior = af[..., 1:-1]
    is_dip = (interior < af[..., :-2]) & (interior <= af[..., 2:]) \
        & ~change[..., :-1] & ~change[..., 1:]
    dip_score = jnp.where(is_dip, -interior, -jnp.inf)
    _, dip_idx = jax.lax.top_k(dip_score, n_dips)            # [..., n_dips]
    dip_ok = jnp.take_along_axis(is_dip, dip_idx, axis=-1)
    zd = jnp.tan(theta[dip_idx + 1])

    def dip_body(_, zd):
        fz = horner(coef, zd)
        fpz = horner(dcoef, zd)
        step = fz / jnp.where(jnp.abs(fpz) < _EPS, jnp.sign(fpz) + 0.5, fpz)
        return zd - jnp.clip(step, -1.0, 1.0)

    zd = jax.lax.fori_loop(0, dip_newton_iters, dip_body, zd)
    # backward-error acceptance: |n(z)| small relative to |a_i||z|^i sum
    acoef = jnp.abs(coef)
    nval = jnp.abs(horner(coef, zd))
    nabs = horner(acoef, jnp.abs(zd))
    tol = 1e4 * jnp.finfo(dtype).eps
    dip_ok = dip_ok & (nval <= tol * jnp.maximum(nabs, _EPS)) \
        & jnp.isfinite(zd)

    z = jnp.concatenate([z, zd], axis=-1)
    valid = jnp.concatenate([valid, dip_ok], axis=-1)
    return z, valid


def _mono20(x, y, z):
    """The 20 _DEG3 monomials at (x, y, z); inputs broadcastable."""
    terms = [x ** int(i) * y ** int(j) * z ** int(k) for i, j, k in _DEG3]
    return jnp.stack(terms, axis=-1)


def _gn_polish(A, xs, ys, zs, iters=4):
    """Gauss-Newton on the 10 cubic constraints over (x, y, z).

    The five epipolar constraints are satisfied identically (the basis spans
    their nullspace), so polishing the essential-manifold constraints is a
    well-conditioned 3-dof solve — it recovers precision the degree-10
    resultant chain loses in float32 and at near-double roots.
    A: [..., 10, 20]; xs/ys/zs: [..., R].  Returns refined (xs, ys, zs).
    """
    def dmono(x, y, z, axis):
        terms = []
        for i, j, k in _DEG3:
            e = (i, j, k)[axis]
            if e == 0:
                terms.append(jnp.zeros_like(x))
                continue
            p = [i, j, k]
            p[axis] -= 1
            terms.append(float(e) * x ** p[0] * y ** p[1] * z ** p[2])
        return jnp.stack(terms, axis=-1)

    def step(carry, _):
        x, y, z = carry
        m = _mono20(x, y, z)                                   # [..., R, 20]
        dm = jnp.stack([dmono(x, y, z, 0),
                        dmono(x, y, z, 1),
                        dmono(x, y, z, 2)], axis=-1)           # [..., R, 20, 3]
        r = jnp.einsum("...ec,...rc->...re", A, m)             # [..., R, 10]
        J = jnp.einsum("...ec,...rcd->...red", A, dm)          # [..., R, 10, 3]
        JtJ = jnp.einsum("...red,...ref->...rdf", J, J)
        Jtr = jnp.einsum("...red,...re->...rd", J, r)
        lam = 1e-8 * jnp.trace(JtJ, axis1=-2, axis2=-1)[..., None, None] \
            + jnp.finfo(A.dtype).tiny
        delta = jnp.linalg.solve(
            JtJ + lam * jnp.eye(3, dtype=A.dtype), Jtr[..., None])[..., 0]
        # accept only improving steps
        mn = _mono20(x - delta[..., 0], y - delta[..., 1], z - delta[..., 2])
        rn = jnp.einsum("...ec,...rc->...re", A, mn)
        better = jnp.sum(rn * rn, -1) < jnp.sum(r * r, -1)
        x = jnp.where(better, x - delta[..., 0], x)
        y = jnp.where(better, y - delta[..., 1], y)
        z = jnp.where(better, z - delta[..., 2], z)
        return (x, y, z), None

    (xs, ys, zs), _ = jax.lax.scan(step, (xs, ys, zs), None, length=iters)
    return xs, ys, zs


def five_point(x1, x2, polish: bool = True):
    """Candidate essential matrices from five correspondences.

    x1, x2: [..., 5, 2] normalized (z=1) coords, convention x2^T E x1 = 0.
    Returns (E [..., NUM_ROOT_SLOTS, 3, 3] Frobenius-normalized,
    valid [..., NUM_ROOT_SLOTS]).  Invalid slots hold identity placeholders.
    ``polish=False`` skips the Gauss-Newton constraint polish — inside RANSAC
    the unpolished candidates score within noise of polished ones and the
    LO re-estimation refines the winner anyway, while the polish costs more
    than the rest of the solver combined.
    """
    basis = _nullspace4(x1, x2)                              # [..., 4, 3, 3]
    A = _constraint_matrix(basis)
    G, ok = _gauss_jordan10(A)
    bx, by, b1 = _klm_rows(G)
    n = _det_poly(bx, by, b1)                                # [..., 11]
    z, valid = _real_roots10(n)
    valid = valid & ok[..., None]

    # Evaluate B(z) rows and recover [x, y, 1] from the best cross product.
    def polyval(c, zz):                                      # c [..., 3, n]
        acc = jnp.broadcast_to(c[..., :1], c.shape[:-1] + (zz.shape[-1],))
        for i in range(1, c.shape[-1]):
            acc = acc * zz[..., None, :] + c[..., i:i + 1]
        return acc                                           # [..., 3, 10]

    Bx = polyval(bx, z)                                      # [..., 3row, 10]
    By = polyval(by, z)
    B1 = polyval(b1, z)
    B = jnp.stack([Bx, By, B1], axis=-2)                     # [..., 3row, 3col, 10]
    B = jnp.moveaxis(B, -1, -3)                              # [..., 10, 3row, 3col]

    r0, r1, r2 = B[..., 0, :], B[..., 1, :], B[..., 2, :]
    cands = jnp.stack([jnp.cross(r0, r1), jnp.cross(r0, r2),
                       jnp.cross(r1, r2)], axis=-2)          # [..., 10, 3, 3]
    norms = jnp.abs(cands[..., 2])                           # weight by |w|
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    w = v[..., 2]
    valid = valid & (jnp.abs(w) > 1e-10)
    wsafe = jnp.where(jnp.abs(w) < _EPS, 1.0, w)
    xs = v[..., 0] / wsafe
    ys = v[..., 1] / wsafe
    if polish:
        xs, ys, z = _gn_polish(A, xs, ys, z)

    coeff = jnp.stack([xs, ys, z, jnp.ones_like(z)], axis=-1)  # [..., R, 4]
    E = jnp.einsum("...rc,...cij->...rij", coeff,
                   basis)                                    # [..., 10, 3, 3]
    fro = jnp.linalg.norm(E.reshape(E.shape[:-2] + (9,)), axis=-1)
    E = E / jnp.maximum(fro[..., None, None], _EPS)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=E.dtype), E.shape)
    E = jnp.where(valid[..., None, None], E, eye)
    return E, valid
