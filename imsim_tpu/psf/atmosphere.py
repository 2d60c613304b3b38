"""Atmospheric PSF: frozen-flow von Karman phase screens on device.

Capability parity with imsim/atmPSF.py (AtmosphericPSF):
  * 6 layers at Ellerbroek altitudes with randomized weights/winds
    (atmPSF.py:244-296)
  * r0_500 solved so the delivered von Karman FWHM hits the target seeing
    (atmPSF.py:217-242 does this by bisection on GalSim's profile)
  * first/second-kick split at kcrit (atmPSF.py:164-205): screens carry
    only k < kcrit turbulence; the high-k tail + diffraction is the
    analytic SecondKick (photons.profiles.second_kick_cdf)

TPU-native design: the reference instantiates screens with a fork pool +
shared memory (atmPSF.py:166-189).  Here each screen is one jitted FFT of
filtered complex noise (milliseconds on the MXU), stored as OPD gradient
fields; the per-photon "first kick" is a row-gather of the packed
(ddx, ddy) texel at the wind-advected pupil position.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..photons import profiles as P
from ..photons.batch import PhotonBatch

# Ellerbroek-style layer altitudes (km) and mean weights (atmPSF.py uses
# Ellerbroek 2002 interpolated + uniform randomization)
LAYER_ALTITUDES_KM = np.array([0.0, 2.58, 5.16, 7.73, 12.89, 15.46])
LAYER_WEIGHTS = np.array([0.652, 0.172, 0.055, 0.025, 0.074, 0.022])


def vk_fwhm_factor(r0, L0):
    """von Karman FWHM / Kolmogorov FWHM (Tokovinin 2002 approximation)."""
    x = 2.183 * (r0 / L0) ** 0.356
    return np.sqrt(max(1.0 - x, 1e-4))


def solve_r0_500(fwhm_arcsec, L0=25.0):
    """Invert fwhm = 0.9758834 * lam/r0 * vk_factor(r0, L0) at 500nm by
    bisection (the reference's approach, atmPSF.py:217-242)."""
    arcsec = np.pi / 180 / 3600
    lam = 500e-9

    def fwhm_of(r0):
        return 0.9758834 * lam / r0 / arcsec * vk_fwhm_factor(r0, L0)

    lo, hi = 0.01, 2.0
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if fwhm_of(mid) > fwhm_arcsec:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


@dataclasses.dataclass
class AtmConfig:
    fwhm: float = 0.8            # target seeing at 500nm, zenith (arcsec)
    L0: float = 25.0             # outer scale (m)
    kcrit: float = 0.2           # first/second kick split (units 1/r0)
    screen_size: float = 819.2   # m
    # screens only hold k < kcrit ~ 1.4 rad/m (the high-k tail is the
    # analytic second kick), so 0.8 m texels still oversample Nyquist
    # ~2.8x -- and the 4x-smaller texture gathers ~40% faster on v5e
    # (8 MB/layer; random-gather rate improves as the table shrinks)
    screen_scale: float = 0.8    # m
    nlayers: int = 6
    altitude_deg: float = 90.0   # for airmass scaling of r0
    exptime: float = 30.0
    # exposure start time offset (s) against the frozen-flow screens'
    # origin (imsim/atmPSF.py t0): matters when a SAVED atmosphere is
    # reused for a later snap of the same visit — the screens advect by
    # wind * (t0 + t)
    t0: float = 0.0


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class AtmScreens:
    """Gradient screens: grad[(L, n, n, 2)] = (dOPD/dx, dOPD/dy) in
    radians of deflection; winds[(L, 2)] m/s; scale m/texel; size m.

    packed[(L, n*n)] uint32 optionally holds the same gradients as two
    f16 in microradians.  Measured on v5e the f32x2 row gather is ~10%
    faster than packed+unpack (gathers cost per row, width ~free, and
    the bit-unpack adds VPU work), so packed is None by default; the
    first kick uses it only when present.
    """

    grad: jax.Array
    winds: jax.Array
    scale: float
    size: float
    packed: jax.Array = None
    # exposure start offset (s): screens sampled at wind * (t0 + t)
    t0: float = 0.0
    # per-layer turbulence weights (STATIC python tuple, not a traced
    # array): lets first_kick_angles partition layers into strong/weak
    # at trace time for stratified draw sharing (see `share` there)
    weights: tuple = None

    def tree_flatten(self):
        return (self.grad, self.winds, self.packed), (self.scale,
                                                      self.size, self.t0,
                                                      self.weights)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1], children[2],
                   aux[2] if len(aux) > 2 else 0.0,
                   aux[3] if len(aux) > 3 else None)


def _screen_spectrum_amplitude(n, scale, r0, L0, kcrit_rad):
    """sqrt(power) filter for FFT screen generation, zeroed above kcrit
    (numpy, host): returns (n, n) array over FFT freq grid [rad/m]."""
    k1 = 2 * np.pi * np.fft.fftfreq(n, d=scale)
    kx, ky = np.meshgrid(k1, k1)
    k = np.hypot(kx, ky)
    Phi = P.vonkarman_phase_spectrum(np.maximum(k, 1e-9), r0, L0)
    Phi = np.where(k <= kcrit_rad, Phi, 0.0)
    Phi[0, 0] = 0.0
    dk = 2 * np.pi / (n * scale)
    # Var(screen) = sum |A|^2 with screen = Re(ifft2(xi * A)) * n^2 and
    # xi = N(0,1) + i N(0,1).  vonkarman_phase_spectrum is calibrated for
    # D(rho) = 2 int (1-J0) Phi k dk; summing Phi dk^2 over the 2D k-plane
    # gives 2*int(1-J0) Phi * 2pi k dk = 2pi x that, so divide by 2pi:
    # A = sqrt(Phi / 2pi) * dk.
    return np.sqrt(Phi / (2 * np.pi)) * dk


def make_screens(seed: int, cfg: AtmConfig,
                 rng: np.random.Generator | None = None) -> AtmScreens:
    """Generate all layers. Host builds the spectral filters; the noise
    FFT runs on device."""
    rng = rng or np.random.default_rng(seed)
    # randomized layer weights (reference randomizes Ellerbroek weights,
    # atmPSF.py:266-276)
    w = LAYER_WEIGHTS * rng.uniform(0.75, 1.25, len(LAYER_WEIGHTS))
    w = w[: cfg.nlayers]
    w /= w.sum()
    airmass = 1.0 / max(np.sin(np.radians(cfg.altitude_deg)), 0.1)
    r0_500 = solve_r0_500(cfg.fwhm, cfg.L0) * airmass ** (-3.0 / 5.0)
    r0_layer = r0_500 * w ** (-3.0 / 5.0)

    # winds: speed ~ layer-dependent, direction uniform
    speeds = rng.uniform(0.0, 20.0, cfg.nlayers)
    dirs = rng.uniform(0.0, 2 * np.pi, cfg.nlayers)
    winds = np.stack([speeds * np.cos(dirs), speeds * np.sin(dirs)], -1)

    n = int(round(cfg.screen_size / cfg.screen_scale))
    kcrit_rad = cfg.kcrit / r0_500  # GalSim kcrit convention: 1/r0 units

    lam500 = 500e-9
    A = jnp.asarray(np.stack([
        _screen_spectrum_amplitude(n, cfg.screen_scale, r0_layer[i],
                                   cfg.L0, kcrit_rad)
        for i in range(cfg.nlayers)]), jnp.float32)
    keys = jnp.stack([jax.random.PRNGKey(seed + 1000 * i)
                      for i in range(cfg.nlayers)])
    grad = _synthesize_screens(keys, A, cfg.screen_scale,
                               lam500 / (2 * np.pi))
    # NOTE: measured on v5e — f32x2 row gathers beat u32-packed f16
    # pairs by ~10% here (the unpack bitops cost more than the narrower
    # row saves), so `packed` stays None by default; _pack_screens is
    # kept for experiments.
    return AtmScreens(grad=grad, winds=jnp.asarray(winds, jnp.float32),
                      scale=cfg.screen_scale, size=cfg.screen_size,
                      packed=None, t0=cfg.t0,
                      weights=tuple(float(x) for x in w))


@jax.jit
def _pack_screens(grad):
    """(L, n, n, 2) f32 radians -> (L, n*n) uint32 of two f16 in urad."""
    L, n = grad.shape[0], grad.shape[1]
    g = (grad * 1e6).astype(jnp.float16).reshape(L, n * n, 2)
    u = jax.lax.bitcast_convert_type(g, jnp.uint16).astype(jnp.uint32)
    return u[..., 0] | (u[..., 1] << 16)


@jax.jit
def _synthesize_screens(keys, A, scale, opd_per_rad):
    """All layers in one compiled program: FFT of filtered complex noise
    -> OPD gradient fields (L, n, n, 2)."""
    def one(key, Ai):
        n = Ai.shape[0]
        k1, k2 = jax.random.split(key)
        noise = (jax.random.normal(k1, (n, n))
                 + 1j * jax.random.normal(k2, (n, n)))
        phase = jnp.real(jnp.fft.ifft2(noise * Ai)) * (n * n)  # rad @500nm
        # deflection = grad(OPD) = (lam/2pi) grad(phase) [rad], achromatic
        opd = phase * opd_per_rad
        gx = (jnp.roll(opd, -1, 1) - jnp.roll(opd, 1, 1)) / (2 * scale)
        gy = (jnp.roll(opd, -1, 0) - jnp.roll(opd, 1, 0)) / (2 * scale)
        return jnp.stack([gx, gy], axis=-1)

    return jax.vmap(one)(keys, A)


def strong_layer_mask(weights, strong_cum: float = 0.8):
    """STATIC per-layer strong/weak partition: layers in descending
    weight order are 'strong' until their cumulative weight reaches
    `strong_cum` (at least one layer always strong).  Weak layers carry
    the small remainder of the turbulence variance (deflection variance
    per layer is proportional to its weight), so their screen draws can
    be shared across more photons with negligible effect on the
    delivered PSF — validated in benchmarks/pair_experiment.py."""
    order = sorted(range(len(weights)), key=lambda i: -weights[i])
    mask = [False] * len(weights)
    acc = 0.0
    for i in order:
        mask[i] = True
        acc += weights[i]
        if acc >= strong_cum:
            break
    return tuple(mask)


def first_kick_angles(pupil_u, pupil_v, time, screens: AtmScreens,
                      theta_x=0.0, theta_y=0.0, share: int = 1,
                      strong_cum: float = 0.8):
    """Geometric phase-screen deflection [radians] for every photon:
    for each layer, look up grad(OPD) at the wind-advected pupil position
    (+ the field-angle offset theta * altitude for off-axis objects).
    Nearest-texel sampling (screens are smooth at the 0.4 m scale);
    deflections are achromatic OPD gradients.  theta_* may be scalars or
    per-photon arrays (pooled multi-object batches).

    share > 1 enables STRATIFIED draw sharing: strong layers (cumulative
    weight >= strong_cum, typically the 2 lowest — ~80% of the
    turbulence) gather one texel per input slot as before, while the
    weak layers gather only for the first n//share slots and broadcast
    that draw to groups of `share` slots.  Callers on the pooled
    block-shared layout (photon_pooling.build_obj_map with matching
    pair/share) arrange slots so the broadcast groups hold ADJACENT
    global photons and the broadcast is a free outer-dim reshape.  The
    weak-layer kick is then evaluated at the group representative's
    pupil/time/field position; the other members borrow the value — a
    statistically identical draw from the same stationary Gaussian
    field carrying <= 1-strong_cum of the deflection variance.
    Requires n % share == 0; falls back to share=1 when weights are
    unavailable."""
    n_tex = screens.grad.shape[1]
    L = screens.grad.shape[0]
    n = pupil_u.shape[0]
    flat = screens.grad.reshape(L, n_tex * n_tex, 2)
    t_eff = time + screens.t0 if screens.t0 else time
    if share > 1 and screens.weights is not None and n % share == 0:
        strong = strong_layer_mask(screens.weights, strong_cum)
    else:
        strong, share = (True,) * L, 1
    ns = n // share
    theta_x = jnp.broadcast_to(theta_x, (n,))
    theta_y = jnp.broadcast_to(theta_y, (n,))
    t_eff = jnp.broadcast_to(t_eff, (n,))

    def layer_kick(i, sl):
        alt_m = LAYER_ALTITUDES_KM[i] * 1000.0
        px = pupil_u[sl] + screens.winds[i, 0] * t_eff[sl] \
            + theta_x[sl] * alt_m
        py = pupil_v[sl] + screens.winds[i, 1] * t_eff[sl] \
            + theta_y[sl] * alt_m
        ix = jnp.round(px / screens.scale).astype(jnp.int32) % n_tex
        iy = jnp.round(py / screens.scale).astype(jnp.int32) % n_tex
        lin = iy * n_tex + ix
        if screens.packed is not None:
            # single-word row gather; unpack two f16 urad components
            g32 = screens.packed[i][lin]
            gx = jax.lax.bitcast_convert_type(
                (g32 & 0xFFFF).astype(jnp.uint16), jnp.float16)
            gy = jax.lax.bitcast_convert_type(
                (g32 >> 16).astype(jnp.uint16), jnp.float16)
            return (gx.astype(jnp.float32) * 1e-6,
                    gy.astype(jnp.float32) * 1e-6)
        g = flat[i][lin]                    # (N, 2) row gather
        return g[:, 0], g[:, 1]

    ddx = jnp.zeros_like(pupil_u)
    ddy = jnp.zeros_like(pupil_v)
    wx = wy = None
    for i in range(L):
        if strong[i]:
            gx, gy = layer_kick(i, slice(None))
            ddx, ddy = ddx + gx, ddy + gy
        else:
            gx, gy = layer_kick(i, slice(0, ns))
            wx = gx if wx is None else wx + gx
            wy = gy if wy is None else wy + gy
    if wx is not None:
        # group q's draw lands on slots {r*ns + q}: outer-dim broadcast
        ddx = ddx + jnp.broadcast_to(wx, (share, ns)).reshape(n)
        ddy = ddy + jnp.broadcast_to(wy, (share, ns)).reshape(n)
    return ddx, ddy


def first_kick(photons: PhotonBatch, screens: AtmScreens,
               pixel_scale: float = 0.2,
               theta_x: float = 0.0, theta_y: float = 0.0) -> PhotonBatch:
    """Image-domain wrapper: deflect photon pixel positions."""
    arcsec = np.pi / 180 / 3600
    ddx, ddy = first_kick_angles(photons.pupil_u, photons.pupil_v,
                                 photons.time, screens, theta_x, theta_y)
    return photons.replace(x=photons.x + ddx / arcsec / pixel_scale,
                           y=photons.y + ddy / arcsec / pixel_scale)


def save_screens(path: str, screens: AtmScreens) -> None:
    """Persist screens (the reference pickles its phase screens so a
    multi-CCD run instantiates them once, imsim/atmPSF.py:149-162)."""
    kw = {}
    if screens.weights is not None:
        kw["weights"] = np.asarray(screens.weights)
    np.savez_compressed(path, grad=np.asarray(screens.grad),
                        winds=np.asarray(screens.winds),
                        scale=screens.scale, size=screens.size, **kw)


def load_screens(path: str, t0: float = 0.0) -> AtmScreens:
    """t0: start-time offset for this exposure against the saved
    screens' origin (a saved atmosphere reused for a later snap passes
    the snap's t0, imsim/atmPSF.py AtmLoader t0)."""
    z = np.load(path)
    grad = jnp.asarray(z["grad"])
    w = tuple(float(x) for x in z["weights"]) if "weights" in z else None
    return AtmScreens(grad=grad, winds=jnp.asarray(z["winds"]),
                      scale=float(z["scale"]), size=float(z["size"]),
                      packed=None, t0=t0, weights=w)


def second_kick_table(cfg: AtmConfig, lam_nm: float, diam=8.36,
                      obscuration=0.612):
    r0_500 = solve_r0_500(cfg.fwhm, cfg.L0)
    r0 = r0_500 * (lam_nm / 500.0) ** (6.0 / 5.0)
    return P.second_kick_cdf(float(lam_nm), float(r0), diam, obscuration,
                             cfg.kcrit, cfg.L0)
