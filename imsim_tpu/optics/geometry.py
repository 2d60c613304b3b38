"""Geometric ray-surface math, generic over the array namespace.

The reference delegates per-photon optics to batoid's C++ raytracer
(imsim/photon_ops.py:109-124 telescope.trace; imsim/batoid_wcs.py:352-373).
TPU-native replacement: every operation below is branch-free, fixed-shape,
and vectorized over a whole ray bundle, so the identical code runs

  * under jit on device in float32 for the pooled-photon hot path, and
  * in numpy float64 on host for the once-per-CCD WCS fit / OPD maps
    (sub-micron accuracy needs f64; photons only need ~1 um, well inside
    f32 — the atmospheric PSF is ~35 um FWHM at the focal plane).

Pass ``xp=jax.numpy`` or ``xp=numpy``; all functions are elementwise over
ray arrays of shape (N,).

Conventions: lengths in meters; optical axis +z pointing at the sky;
rays from the sky travel with vz < 0. A surface is placed at vertex
z = z0 with sag measured along +z in its local frame.
"""
from __future__ import annotations


# fixed Newton iteration count: rays are near-paraxial after the first
# sphere-intersection guess; 4 iterations converge to <1e-12 m in f64
NEWTON_ITERS = 4        # legacy fixed budget (kept for reference/tests)
NEWTON_POLISH = 1       # Newton steps after the closed-form conic root


def conic_sag(xp, r2, c, kappa):
    """Sag of a conic: z = c r^2 / (1 + sqrt(1 - (1+kappa) c^2 r^2))."""
    arg = 1.0 - (1.0 + kappa) * c * c * r2
    return c * r2 / (1.0 + xp.sqrt(xp.maximum(arg, 1e-12)))


def conic_sag_slope(xp, r2, c, kappa):
    """d(sag)/d(r^2)."""
    arg = xp.maximum(1.0 - (1.0 + kappa) * c * c * r2, 1e-12)
    s = xp.sqrt(arg)
    # d/dr2 [c r2 / (1+s)] = c/(1+s) + c r2 * (c^2 (1+kappa)/2) / (s (1+s)^2)
    return c / (1.0 + s) + c * r2 * (c * c * (1.0 + kappa) * 0.5) \
        / (s * (1.0 + s) ** 2)


def surface_sag(xp, x, y, c, kappa, coefs):
    """Conic + even-polynomial asphere: sag(r) = conic + sum a_i r^(4+2i).

    coefs: sequence of floats (a0*r^4, a1*r^6, ...); empty for pure conic.
    """
    r2 = x * x + y * y
    z = conic_sag(xp, r2, c, kappa)
    if len(coefs):
        # Horner in r^2, overall factor r^4
        acc = 0.0
        for a in reversed(coefs):
            acc = acc * r2 + a
        z = z + r2 * r2 * acc
    return z


def surface_normal(xp, x, y, c, kappa, coefs):
    """Unit normal of z = sag(x, y), oriented toward -z (into incoming
    rays): n = normalize(-dz/dx, -dz/dy, 1) flipped to (-,-,+)->(+,+,-)?
    We return the +z-facing normal (nz > 0); reflection/refraction formulas
    below are insensitive to the overall sign."""
    r2 = x * x + y * y
    dzdr2 = conic_sag_slope(xp, r2, c, kappa)
    if len(coefs):
        acc = 0.0
        dacc = 0.0
        # d/dr2 [r^4 * P(r2)] where P = sum a_i r2^i
        for i, a in reversed(list(enumerate(coefs))):
            dacc = dacc * r2 + a * (i + 2)  # derivative picks (i+2) r2^(i+1)
        dzdr2 = dzdr2 + r2 * dacc
    dzdx = 2.0 * x * dzdr2
    dzdy = 2.0 * y * dzdr2
    inv = 1.0 / xp.sqrt(1.0 + dzdx * dzdx + dzdy * dzdy)
    return -dzdx * inv, -dzdy * inv, inv


def _conic_F(xp, px, py, pz, vx, vy, vz, c, kappa, coefs, t):
    """F(t) = z(t) - sag(r2(t)) and dF/dt along the ray."""
    x = px + t * vx
    y = py + t * vy
    z = pz + t * vz
    r2 = x * x + y * y
    s = conic_sag(xp, r2, c, kappa)
    ds = conic_sag_slope(xp, r2, c, kappa)
    if len(coefs):
        acc = 0.0
        dacc = 0.0
        for i, a in reversed(list(enumerate(coefs))):
            acc = acc * r2 + a
            dacc = dacc * r2 + a * (i + 2)
        s = s + r2 * r2 * acc
        ds = ds + r2 * dacc
    dr2dt = 2.0 * (x * vx + y * vy)
    return z - s, vz - ds * dr2dt


def intersect(xp, px, py, pz, vx, vy, vz, c, kappa, coefs):
    """Propagate rays (p, v) to the surface z = sag(x, y) (local frame).

    The conic part is solved in CLOSED FORM: the conic z = sag(r) is
    the near-vertex branch of the quadric c(x^2+y^2) + c(1+kappa)z^2
    - 2z = 0 (this scaling degenerates smoothly to the z = 0 plane at
    c -> 0).  The quadratic is ANCHORED at the ray's z = 0 plane hit
    (t0 = -pz/vz): there C = c*r0^2 (<~ 1) and B ~ -2vz, so the near
    root s ~ sag-scale while the far sheet sits tens of meters away —
    picking the smaller |s| is branch-stable even in f32, and the
    meter-scale cancellations of the raw (p, v) quadratic (which cost
    ~0.2 px of f32 noise and could flip branches on grazing rays)
    never enter.  Citardauq/quadratic stable-root pair as usual.
    Aspheric surfaces (nonzero even-polynomial coefs) then run extra
    Newton steps from the conic point — the asphere terms are mm-scale
    there, so convergence is immediate.  This replaced a 4-iteration
    Newton from the z = 0 plane for EVERY surface: the trace is pure
    VPU arithmetic and the fixed Newton budget was ~half its cost
    (benchmarks/profile_stages.py dcr+diffr+trace).

    Returns (x, y, z, t, F) with t the path length (|v| = 1) and F the
    final residual (graze/miss detector — trace() flags |F| > 1e-5).
    """
    k1 = 1.0 + kappa
    t0 = -pz / vz
    x0 = px + t0 * vx
    y0 = py + t0 * vy
    A = c * (vx * vx + vy * vy + k1 * vz * vz)
    B = 2.0 * c * (x0 * vx + y0 * vy) - 2.0 * vz
    C = c * (x0 * x0 + y0 * y0)
    disc = xp.maximum(B * B - 4.0 * A * C, 0.0)
    sq = xp.sqrt(disc)
    sgn = xp.where(B >= 0.0, 1.0, -1.0)
    q = -0.5 * (B + sgn * sq)
    eps = 1e-30
    s_a = q / xp.where(xp.abs(A) < eps, eps, A)
    s_b = C / xp.where(xp.abs(q) < eps, eps, q)
    # near-vertex branch = the root nearer the plane point (the far
    # sheet sits at z ~ 2/(c(1+kappa)), |s| ~ tens of meters; for
    # paraboloids/planes the degenerate root blows up and loses
    # automatically)
    t = t0 + xp.where(xp.abs(s_a) < xp.abs(s_b), s_a, s_b)

    # polish: exact cleanup of f32 rounding, and the full Newton for
    # the asphere terms (absent terms make this a single cheap step).
    # F is returned from the LAST step's evaluation point (matching
    # the previous fixed-budget behavior): at convergence it is the
    # pre-update residual, rounding-level for real rays and large for
    # grazing/missing rays (trace() vignettes on |F| > 1e-5).
    # aspheres carry mm-scale polynomial sag (M2 a4 r^4 ~ 1 mm), so the
    # first Newton step from the conic point leaves ~1e-8 m; two steps
    # reach rounding level (and the returned residual F is evaluated
    # pre-update, i.e. reflects the previous step's convergence)
    n_iter = NEWTON_POLISH + (2 if len(coefs) else 0)
    F = None
    for _ in range(n_iter):
        F, dF = _conic_F(xp, px, py, pz, vx, vy, vz, c, kappa, coefs, t)
        t = t - F / dF
    x = px + t * vx
    y = py + t * vy
    z = pz + t * vz
    return x, y, z, t, F


def reflect(xp, vx, vy, vz, nx, ny, nz):
    """v' = v - 2 (v.n) n for unit normal n."""
    d = vx * nx + vy * ny + vz * nz
    return vx - 2 * d * nx, vy - 2 * d * ny, vz - 2 * d * nz


def refract(xp, vx, vy, vz, nx, ny, nz, n1_over_n2):
    """Snell refraction of unit vector v at unit normal n.

    Uses the vector form v' = eta v + (eta c1 - c2) n with
    c1 = -v.n (normal oriented against v), c2 = sqrt(1 - eta^2 (1-c1^2)).
    Total internal reflection is clamped (never happens in this system).
    """
    eta = n1_over_n2
    d = vx * nx + vy * ny + vz * nz
    # orient normal against the ray
    sign = xp.where(d > 0, -1.0, 1.0)
    nx, ny, nz, d = nx * sign, ny * sign, nz * sign, d * sign
    c1 = -d
    c2sq = 1.0 - eta * eta * (1.0 - c1 * c1)
    c2 = xp.sqrt(xp.maximum(c2sq, 1e-12))
    k = eta * c1 - c2
    return eta * vx + k * nx, eta * vy + k * ny, eta * vz + k * nz


def silica_index(xp, wavelength_nm):
    """Fused-silica refractive index (Malitson 1965 Sellmeier), the glass
    of all three LSST camera lenses and the filter substrates."""
    w2 = (wavelength_nm * 1e-3) ** 2  # microns^2
    n2 = (1.0
          + 0.6961663 * w2 / (w2 - 0.0684043**2)
          + 0.4079426 * w2 / (w2 - 0.1162414**2)
          + 0.8974794 * w2 / (w2 - 9.896161**2))
    return xp.sqrt(n2)


def air_index_excess(xp, wavelength_nm, pressure_kpa=69.33,
                     temperature_k=293.15, h2o_pressure_kpa=1.0):
    """n_air - 1 (Edlen-style formula, the same parametrization GalSim
    uses for DCR; pressure default is the 2715 m Rubin altitude).
    Returned as the excess directly so float32 device code never does
    the catastrophic (1 + 2.7e-4) - 1 cancellation."""
    sigma2 = (1000.0 / xp.asarray(wavelength_nm)) ** 2  # 1/um^2
    # dry air at 15C, 101.325 kPa
    n_m1e6 = 64.328 + 29498.1 / (146.0 - sigma2) + 255.4 / (41.0 - sigma2)
    p_mbar = pressure_kpa * 10.0
    t_c = temperature_k - 273.15
    n_m1e6 = n_m1e6 * p_mbar * (1.0 + (1.049 - 0.0157 * t_c) * 1e-6 * p_mbar) \
        / (720.883 * (1.0 + 0.003661 * t_c))
    w_mbar = h2o_pressure_kpa * 10.0
    n_m1e6 = n_m1e6 - ((0.0624 - 0.000680 * sigma2)
                       / (1.0 + 0.003661 * t_c)) * w_mbar
    return 1e-6 * n_m1e6


def air_index(xp, wavelength_nm, pressure_kpa=69.33, temperature_k=293.15,
              h2o_pressure_kpa=1.0):
    return 1.0 + air_index_excess(xp, wavelength_nm, pressure_kpa,
                                  temperature_k, h2o_pressure_kpa)
