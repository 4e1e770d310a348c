"""Pair-potential zoo: analytic, tabulated and spline models (pure JAX).

Parity target: /root/reference/torchmd/potentials.py.  The reference wraps
each functional form in an ``nn.Module`` with ``nn.Parameter`` leaves so the
adjoint can reach them.  The TPU-native design separates *structure* from
*state*: each potential here is a small static Python object with

    ``init_params() -> params``   a JAX pytree of learnable leaves
    ``__call__(params, r) -> u``  per-pair energy, pure in (params, r)

so the whole force field is an explicit pytree that `jax.grad` /
`optax` traverse directly -- no parameter flattening (contrast reference
sovlers.py:319 ``_flatten(func.parameters())``).

All forms accept ``r`` of any shape and broadcast; fitting drivers call them
on (P, 1) padded distance columns.
"""

import numpy as np
import jax
import jax.numpy as jnp


class PairPotentialBase:
    """Mixin providing params-free convenience evaluation."""

    def init_params(self):
        return {}

    def __call__(self, params, r):
        raise NotImplementedError


class LennardJones(PairPotentialBase):
    """4 eps ((s/r)^12 - (s/r)^6) (reference potentials.py:317-327)."""

    def __init__(self, sigma=1.0, epsilon=1.0):
        self.sigma, self.epsilon = sigma, epsilon

    def init_params(self):
        return {"sigma": jnp.asarray(self.sigma),
                "epsilon": jnp.asarray(self.epsilon)}

    def __call__(self, params, r):
        sr = params["sigma"] / r
        return 4 * params["epsilon"] * (sr ** 12 - sr ** 6)


class LennardJones69(PairPotentialBase):
    """4 eps ((s/r)^9 - (s/r)^6) (reference potentials.py:329-339)."""

    def __init__(self, sigma=1.0, epsilon=1.0):
        self.sigma, self.epsilon = sigma, epsilon

    def init_params(self):
        return {"sigma": jnp.asarray(self.sigma),
                "epsilon": jnp.asarray(self.epsilon)}

    def __call__(self, params, r):
        sr = params["sigma"] / r
        return 4 * params["epsilon"] * (sr ** 9 - sr ** 6)


class LJFamily(PairPotentialBase):
    """Generalized Mie / LJ with integer attr/rep powers
    (reference potentials.py:61-73); powers are static."""

    def __init__(self, sigma=1.0, epsilon=1.0, attr_pow=6, rep_pow=12):
        self.sigma, self.epsilon = sigma, epsilon
        self.attr_pow, self.rep_pow = attr_pow, rep_pow

    def init_params(self):
        return {"sigma": jnp.asarray(self.sigma),
                "epsilon": jnp.asarray(self.epsilon)}

    def __call__(self, params, r):
        sr = params["sigma"] / r
        return 4 * params["epsilon"] * (sr ** self.rep_pow
                                        - sr ** self.attr_pow)


class ExcludedVolume(PairPotentialBase):
    """Purely repulsive 4 eps (s/r)^p prior (reference potentials.py:341-352).
    Used as the short-range prior under SchNet in the water RDF fit."""

    def __init__(self, sigma=1.0, epsilon=1.0, power=12):
        self.sigma, self.epsilon, self.power = sigma, epsilon, power

    def init_params(self):
        return {"sigma": jnp.asarray(self.sigma),
                "epsilon": jnp.asarray(self.epsilon)}

    def __call__(self, params, r):
        return 4 * params["epsilon"] * (params["sigma"] / r) ** self.power


class GaussianCore(PairPotentialBase):
    """Bounded soft-core prior eps * exp(-(r/sigma)^2) (Stillinger
    Gaussian-core model).  Suits fits whose target potential is itself
    bounded at r=0 -- e.g. the 2-D stripe SplineOverlap (reference
    potentials.py:123-149 caps at V0/(16 pi)): a hard r^-p prior there
    teaches Boltzmann-inversion pretraining to cancel it wherever the
    target g(r) > 0, leaving a cliff below the data range that blows up
    the MD; a bounded prior has no cliff to cancel."""

    def __init__(self, sigma=0.5, epsilon=2.0):
        self.sigma, self.epsilon = sigma, epsilon

    def init_params(self):
        return {"sigma": jnp.asarray(self.sigma),
                "epsilon": jnp.asarray(self.epsilon)}

    def __call__(self, params, r):
        return params["epsilon"] * jnp.exp(-(r / params["sigma"]) ** 2)


class Buck(PairPotentialBase):
    """Buckingham A exp(-B r) - C r^-6 (reference potentials.py:354-365)."""

    def __init__(self, A=1.0, B=1.0, C=1.0):
        self.A, self.B, self.C = A, B, C

    def init_params(self):
        return {"A": jnp.asarray(self.A), "B": jnp.asarray(self.B),
                "C": jnp.asarray(self.C)}

    def __call__(self, params, r):
        return params["A"] * jnp.exp(-params["B"] * r) - params["C"] / r ** 6


class Yukawa(PairPotentialBase):
    """Screened Coulomb eps * exp(-kappa r) * sigma / r.

    The reference fits Yukawa targets (data at /root/reference/data/
    Yukawa_data, registry scripts/data.py) but only ships the fitted pair
    MLP; the analytic form is provided here for target generation.
    """

    def __init__(self, epsilon=1.0, kappa=1.0, sigma=1.0):
        self.epsilon, self.kappa, self.sigma = epsilon, kappa, sigma

    def init_params(self):
        return {"epsilon": jnp.asarray(self.epsilon),
                "kappa": jnp.asarray(self.kappa),
                "sigma": jnp.asarray(self.sigma)}

    def __call__(self, params, r):
        return (params["epsilon"] * params["sigma"] / r
                * jnp.exp(-params["kappa"] * r))


class Morse(PairPotentialBase):
    """D (1 - exp(-a (r - r0)))^2 - D."""

    def __init__(self, D=1.0, a=1.0, r0=1.0):
        self.D, self.a, self.r0 = D, a, r0

    def init_params(self):
        return {"D": jnp.asarray(self.D), "a": jnp.asarray(self.a),
                "r0": jnp.asarray(self.r0)}

    def __call__(self, params, r):
        x = jnp.exp(-params["a"] * (r - params["r0"]))
        return params["D"] * (1.0 - x) ** 2 - params["D"]


class ModifiedMorse(PairPotentialBase):
    """Modified Morse of reference potentials.py:75-93 (a, phi static)."""

    def __init__(self, a, phi):
        self.a, self.phi = a, phi
        self.A = 0.0 if phi >= 0 else float(np.exp(2 * a / phi)
                                            - 2 * np.exp(a / phi))

    def __call__(self, params, r):
        exponent = self.a * (1 - r ** self.phi) / self.phi
        return ((jnp.exp(2 * exponent) - 2 * jnp.exp(exponent) - self.A)
                / (1 + self.A))


class PairTab(PairPotentialBase):
    """Learnable tabulated potential on a uniform grid
    (reference potentials.py:152-160 used xitorch cubic ``Interp1D``).

    Default ``kind='cubic'`` is a natural cubic spline: second
    derivatives at the knots are ``M = B @ tab`` where ``B`` folds the
    (static, grid-only) tridiagonal solve into one dense matrix
    precomputed at init -- per call it is a single (nbins, nbins)
    matmul on the MXU plus a Hermite-segment evaluation, so dU/dr is
    continuous across knots (the round-1 linear interp had force kinks).
    ``kind='linear'`` keeps the round-1 behavior."""

    def __init__(self, nbins=1000, rc=2.5, kind="cubic"):
        self.nbins, self.rc, self.kind = nbins, rc, kind
        self.x = jnp.linspace(0.0, rc, nbins)
        self.h = rc / (nbins - 1)
        if kind == "cubic":
            h = self.h
            m = nbins - 2  # interior knots; natural BC M_0 = M_{n-1} = 0
            T = (np.diag(np.full(m, 2 * h / 3))
                 + np.diag(np.full(m - 1, h / 6), 1)
                 + np.diag(np.full(m - 1, h / 6), -1))
            D = np.zeros((m, nbins))
            for i in range(m):
                D[i, i:i + 3] = [1.0 / h, -2.0 / h, 1.0 / h]
            B = np.zeros((nbins, nbins))
            B[1:-1] = np.linalg.solve(T, D)
            self._B = jnp.asarray(B, dtype=jnp.float32)
        elif kind != "linear":
            raise ValueError(f"unknown interpolation kind {kind!r}")

    def init_params(self):
        return {"tab": jnp.zeros(self.nbins)}

    def __call__(self, params, r):
        shape = r.shape
        rf = jnp.clip(r.reshape(-1), 0.0, self.rc)
        y = params["tab"]
        if self.kind == "linear":
            return jnp.interp(rf, self.x, y).reshape(shape)
        # small geometry-free matmul, but values feed forces: keep f32
        M = jnp.matmul(self._B, y, precision=jax.lax.Precision.HIGHEST)
        h = self.h
        i = jnp.clip((rf / h).astype(jnp.int32), 0, self.nbins - 2)
        t = rf - self.x[i]
        yi, yj, Mi, Mj = y[i], y[i + 1], M[i], M[i + 1]
        u = (yi
             + t * ((yj - yi) / h - h / 6.0 * (2.0 * Mi + Mj))
             + t ** 2 * Mi / 2.0
             + t ** 3 * (Mj - Mi) / (6.0 * h))
        return u.reshape(shape)


class Harmonic(PairPotentialBase):
    """0.5 k x^2 toy potential (reference Harmonic1D potentials.py:34-43,
    used for adjoint-gradient validation)."""

    def __init__(self, k=1.0):
        self.k = k

    def init_params(self):
        return {"k": jnp.asarray(self.k)}

    def __call__(self, params, x):
        return 0.5 * params["k"] * x ** 2


# ---------------------------------------------------------------------------
# natural cubic splines (host-fit coefficients, JAX evaluation)
# ---------------------------------------------------------------------------

def _natural_cubic_coeffs(x, y):
    """Natural cubic spline coefficients (numpy, host side)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x) - 1
    h = np.diff(x)
    # solve for second derivatives M with natural BCs (M0 = Mn = 0)
    a = np.zeros((n + 1, n + 1))
    b = np.zeros(n + 1)
    a[0, 0] = a[n, n] = 1.0
    for i in range(1, n):
        a[i, i - 1] = h[i - 1]
        a[i, i] = 2 * (h[i - 1] + h[i])
        a[i, i + 1] = h[i]
        b[i] = 3 * ((y[i + 1] - y[i]) / h[i] - (y[i] - y[i - 1]) / h[i - 1])
    c = np.linalg.solve(a, b)
    b_coef = (y[1:] - y[:-1]) / h - h * (2 * c[:-1] + c[1:]) / 3
    d_coef = (c[1:] - c[:-1]) / (3 * h)
    return x, y[:-1], b_coef, c[:-1], d_coef


class CubicSpline(PairPotentialBase):
    """Static natural cubic spline u(r); coefficients fit on the host."""

    def __init__(self, x, y):
        knots, a, b, c, d = _natural_cubic_coeffs(x, y)
        self.knots = jnp.asarray(knots)
        self.coef = tuple(jnp.asarray(v) for v in (a, b, c, d))

    def __call__(self, params, r):
        shape = r.shape
        r = r.reshape(-1)
        i = jnp.clip(jnp.searchsorted(self.knots, r) - 1,
                     0, len(self.knots) - 2)
        a, b, c, d = self.coef
        t = r - self.knots[i]
        u = a[i] + b[i] * t + c[i] * t ** 2 + d[i] * t ** 3
        return u.reshape(shape)


def boltzmann_inversion_spline(rdf_range, rdf, kT=1.0, eps=1e-30):
    """-kT log g(r) spline: the Boltzmann-inverted pair potential.

    Note: the reference class stores +kT log g (potentials.py:114) while
    its pretraining code uses -kT log g (fit_rdf_gnn.py:264); this
    function matches its name (and the physics), i.e. the pretraining
    convention.  NaN/inf from log(0) are clamped the way the drivers do
    with ``nan_to_num`` (reference fit_rdf_gnn.py:267).
    """
    g = np.asarray(rdf, dtype=np.float64)
    u = -kT * np.log(np.maximum(g, eps))
    u = np.nan_to_num(u, posinf=u[np.isfinite(u)].max() if
                      np.isfinite(u).any() else 0.0)
    return CubicSpline(np.asarray(rdf_range), u)


def spline_overlap(K, V0, n_splines=600, rmax=15.0, rmin=1e-3):
    """Stripe-phase overlap potential spline (reference potentials.py:123-149,
    PhysRevE.80.031105): V0 / (pi (K x)^2) * J1(K x / 2)^2."""
    from scipy import special
    x = np.linspace(rmin, rmax, n_splines)
    y = V0 * (1.0 / (np.pi * (K * x) ** 2)) * special.jv(1, (K * x) / 2) ** 2
    return CubicSpline(x, y)


# ---------------------------------------------------------------------------
# toy 2-D PES models (reference potentials.py:220-295) -- functions of (x, y)
# ---------------------------------------------------------------------------

class Toy2d(PairPotentialBase):
    """Double-well 2-D PES (reference potentials.py:220-246)."""

    def __call__(self, params, xy):
        xy = jnp.atleast_2d(xy)
        x, y = xy[:, 0], xy[:, 1]
        return ((x ** 2 + y ** 2) ** 2
                - 10 * jnp.exp(-30 * (x - 0.2) ** 2 - 3 * (y - 0.4) ** 2)
                - 10 * jnp.exp(-30 * (x + 0.2) ** 2 - 3 * (y + 0.4) ** 2))


class LEPS(PairPotentialBase):
    """LEPS surface (reference potentials.py:249-295)."""

    @staticmethod
    def _Q(d, r):
        alpha, r0 = 1.942, 0.742
        return d * (3 * jnp.exp(-2 * alpha * (r - r0)) / 2
                    - jnp.exp(-alpha * (r - r0))) / 2

    @staticmethod
    def _J(d, r):
        alpha, r0 = 1.942, 0.742
        return d * (jnp.exp(-2 * alpha * (r - r0))
                    - 6 * jnp.exp(-alpha * (r - r0))) / 4

    def __call__(self, params, xy):
        xy = jnp.atleast_2d(xy)
        a, b, c = 0.05, 0.3, 0.05
        dAB = dBC = 4.746
        dAC = 3.445
        rAB, rBC = xy[:, 0], xy[:, 1]
        rAC = rAB + rBC
        JAB = self._J(dAB, rAB) / (1 + a)
        JBC = self._J(dBC, rBC) / (1 + b)
        JAC = self._J(dAC, rAC) / (1 + c)
        return (self._Q(dAB, rAB) / (1 + a)
                + self._Q(dBC, rBC) / (1 + b)
                + self._Q(dAC, rAC) / (1 + c)
                - jnp.sqrt(JAB ** 2 + JBC ** 2 + JAC ** 2
                           - JAB * JBC - JBC * JAC - JAB * JAC))
