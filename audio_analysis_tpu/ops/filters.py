"""IIR band-pass filtering, TPU-native.

The reference band-passes track audio with a scipy order-2 Butterworth SOS
filter (src/identify_tracks.py:1039-1056). Here the filter *design* runs on
host in float64 (pure numpy — poles/zeros via the bilinear transform), and the
*application* runs on device as an O(log N)-depth ``associative_scan`` over
affine state maps — the parallel-prefix formulation of the order-2 linear
recurrence — instead of a 144k-step sequential loop.
"""

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Host-side Butterworth design (float64 numpy; no scipy dependency)
# ---------------------------------------------------------------------------


def _butter_analog_poles(order: int) -> np.ndarray:
    k = np.arange(-order + 1, order, 2)
    return -np.exp(1j * np.pi * k / (2 * order))


def _bilinear_zpk(z, p, k, fs):
    fs2 = 2.0 * fs
    z = np.asarray(z, dtype=complex)
    p = np.asarray(p, dtype=complex)
    degree = len(p) - len(z)
    z_d = (fs2 + z) / (fs2 - z)
    p_d = (fs2 + p) / (fs2 - p)
    z_d = np.append(z_d, -np.ones(degree))
    k_d = k * np.real(np.prod(fs2 - z) / np.prod(fs2 - p))
    return z_d, p_d, k_d


def _poly_from_roots(roots: np.ndarray) -> np.ndarray:
    c = np.array([1.0 + 0j])
    for r in roots:
        c = np.convolve(c, np.array([1.0, -r]))
    return c


@lru_cache(maxsize=128)
def butter_bandpass_sos(lowcut: float, highcut: float, fs: float, order: int = 2) -> tuple:
    """Design a digital Butterworth filter as second-order sections.

    Mirrors the reference's design entry (src/identify_tracks.py:1039-1050):
    ``lowcut <= 0`` degrades to a low-pass at ``highcut``. Returns a tuple of
    ``(b0, b1, b2, a1, a2)`` float tuples (a0 normalised to 1).
    """
    nyq = 0.5 * fs
    fs_design = 2.0
    if lowcut > 0:
        wn = np.array([lowcut / nyq, highcut / nyq])
        warped = 2.0 * fs_design * np.tan(np.pi * wn / fs_design)
        bw = warped[1] - warped[0]
        wo = np.sqrt(warped[0] * warped[1])
        p_lp = _butter_analog_poles(order)
        k = 1.0
        # lp2bp
        p_scaled = p_lp * bw / 2.0
        p_bp = np.concatenate(
            [
                p_scaled + np.sqrt(p_scaled**2 - wo**2),
                p_scaled - np.sqrt(p_scaled**2 - wo**2),
            ]
        )
        z_bp = np.zeros(order)
        k_bp = k * bw**order
        z, p, kd = _bilinear_zpk(z_bp, p_bp, k_bp, fs_design)
        # Pair conjugate pole pairs with zeros scipy-style (zpk2sos
        # 'nearest'): process poles closest to the unit circle first, give
        # each pair the two nearest available zeros (all zeros are at +/-1
        # for a Butterworth bandpass), then order sections low-Q first with
        # the overall gain folded into the first output section.
        p_pos = sorted(p[np.imag(p) >= 0], key=lambda q: -abs(q))
        zero_pool = [1.0] * order + [-1.0] * order
        sections = []
        for pp in p_pos:
            den = np.real(_poly_from_roots(np.array([pp, np.conj(pp)])))
            zz = []
            for _ in range(2):
                zv = min(zero_pool, key=lambda v: abs(v - pp))
                zero_pool.remove(zv)
                zz.append(zv)
            num = np.real(_poly_from_roots(np.asarray(zz, dtype=complex)))
            sections.append(
                (num[0], num[1], num[2], den[1] / den[0], den[2] / den[0])
            )
        sections = sections[::-1]
        first = sections[0]
        sections[0] = (first[0] * kd, first[1] * kd, first[2] * kd, first[3], first[4])
    else:
        wn = highcut / nyq
        warped = 2.0 * fs_design * np.tan(np.pi * wn / fs_design)
        p_lp = _butter_analog_poles(order) * warped
        k = warped**order
        z, p, kd = _bilinear_zpk(np.array([]), p_lp, k, fs_design)
        p_pos = sorted(p[np.imag(p) >= 0], key=lambda q: -abs(q))
        sections = []
        gain = kd
        zeros_iter = list(z)
        for pp in p_pos:
            den = np.real(_poly_from_roots(np.array([pp, np.conj(pp)])))
            zz = zeros_iter[:2]
            zeros_iter = zeros_iter[2:]
            num = np.real(_poly_from_roots(np.asarray(zz, dtype=complex))) * gain
            gain = 1.0
            if len(num) < 3:
                num = np.concatenate([num, np.zeros(3 - len(num))])
            sections.append(
                (num[0], num[1], num[2], den[1] / den[0], den[2] / den[0])
            )
    return tuple(tuple(float(c) for c in s) for s in sections)


# ---------------------------------------------------------------------------
# Device-side application: parallel-prefix IIR
# ---------------------------------------------------------------------------


def _sos_section_scan(x: jnp.ndarray, coefs) -> jnp.ndarray:
    """Apply one direct-form-II-transposed section along the last axis.

    State recurrence (s1, s2):
        y[n]  = b0*x[n] + s1[n]
        s1'   = -a1*s1 + s2 + (b1 - a1*b0)*x[n]
        s2'   = -a2*s1 +      (b2 - a2*b0)*x[n]
    i.e. s[n+1] = A @ s[n] + g * x[n] — an affine map composed with
    ``jax.lax.associative_scan`` in O(log N) depth.
    """
    b0, b1, b2, a1, a2 = (jnp.asarray(c, dtype=jnp.float32) for c in coefs)
    g1 = b1 - a1 * b0
    g2 = b2 - a2 * b0

    T = x.shape[-1]
    # Affine elements: constant A per step, u = g * x.
    a11 = jnp.broadcast_to(-a1, x.shape)
    a12 = jnp.broadcast_to(jnp.float32(1.0), x.shape)
    a21 = jnp.broadcast_to(-a2, x.shape)
    a22 = jnp.broadcast_to(jnp.float32(0.0), x.shape)
    u1 = g1 * x
    u2 = g2 * x

    def compose(left, right):
        la11, la12, la21, la22, lu1, lu2 = left
        ra11, ra12, ra21, ra22, ru1, ru2 = right
        # later (right) after earlier (left): A = rA @ lA ; u = rA @ lu + ru
        return (
            ra11 * la11 + ra12 * la21,
            ra11 * la12 + ra12 * la22,
            ra21 * la11 + ra22 * la21,
            ra21 * la12 + ra22 * la22,
            ra11 * lu1 + ra12 * lu2 + ru1,
            ra21 * lu1 + ra22 * lu2 + ru2,
        )

    scanned = jax.lax.associative_scan(
        compose, (a11, a12, a21, a22, u1, u2), axis=-1
    )
    s1_incl = scanned[4]  # state AFTER consuming sample n
    # State before sample n: shift right by one, zero init.
    s1 = jnp.concatenate(
        [jnp.zeros_like(s1_incl[..., :1]), s1_incl[..., : T - 1]], axis=-1
    )
    return b0 * x + s1


def sosfilt(sos, x: jnp.ndarray) -> jnp.ndarray:
    """Apply cascaded second-order sections along the last axis (zero init),
    matching scipy.signal.sosfilt semantics (reference:
    src/identify_tracks.py:1053-1056)."""
    y = x
    for section in sos:
        y = _sos_section_scan(y, section)
    return y


def sosfilt_array(sos: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """sosfilt with traced coefficients: ``sos`` is [n_sections, 5] or
    [B, n_sections, 5] (per-example filters, e.g. per-track band-passes over
    a padded track stack). Coefficient layout (b0, b1, b2, a1, a2)."""
    sos = jnp.asarray(sos, dtype=jnp.float32)
    n_sections = sos.shape[-2]
    y = x
    for i in range(n_sections):
        c = sos[..., i, :]
        if c.ndim > 1:
            coefs = tuple(c[..., k][..., None] for k in range(5))
        else:
            coefs = tuple(c[k] for k in range(5))
        y = _sos_section_scan(y, coefs)
    return y


def butter_bandpass_filter(
    x: jnp.ndarray, lowcut: float, highcut: float, fs: float, order: int = 2
) -> jnp.ndarray:
    """Design + apply in one call (reference: src/identify_tracks.py:1053)."""
    sos = butter_bandpass_sos(float(lowcut), float(highcut), float(fs), order)
    return sosfilt(sos, x)
