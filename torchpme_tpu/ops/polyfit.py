"""Minimax-ish polynomial fits for transcendental-free TPU kernels.

The fused Pallas pair-window kernel
(:mod:`torchpme_tpu.ops.pallas.window_pallas`) replaces the SR pair math's
transcendentals (``erfc``, ``exp``) with Horner polynomials evaluated in VMEM:
both are *entire* functions, so a Chebyshev least-squares fit on the full
``[0, cutoff]`` pair-distance domain converges fast (degree 13–21 reaches
~1.5e-7 absolute — below f32 roundoff) and needs **no domain guard**: the fit
is valid down to r = 0, where the masked-candidate placeholder d = 1 also
lives.  Coefficients are computed in f64 at trace time (the potential's
parameters are concrete floats there — the same gate as the analytic-force
hook) and baked into the kernel as f32 constants.

No reference counterpart (the reference evaluates ``torch.erfc`` per pair);
this is a TPU-kernel enabler, not a numerical shortcut — the fit error is
below the f32 rounding already incurred by the fast path.
"""

from __future__ import annotations

import numpy as np

__all__ = ["fit_f32_horner", "horner"]


def fit_f32_horner(fn, lo, hi, tol=4e-7, max_degree=22):
    """Power-basis coefficients of a fit of ``fn`` on ``[lo, hi]``.

    Fits in the normalized variable ``u = 2(r - lo)/(hi - lo) - 1`` by
    Chebyshev least squares in f64, converts to the power basis, and verifies
    the **f32 Horner** evaluation (the exact arithmetic the kernel performs)
    against f64 ground truth on a dense grid.  Returns the f32 coefficient
    array (highest degree last) of the lowest degree whose verified error is
    ``< tol``, or ``None`` if no degree up to ``max_degree`` reaches it —
    callers fall back to the transcendental path.
    """
    lo, hi = float(lo), float(hi)
    r = np.linspace(lo, hi, 8001)
    u = 2.0 * (r - lo) / (hi - lo) - 1.0
    y = np.asarray(fn(r), np.float64)
    uf = u.astype(np.float32)
    for deg in range(4, max_degree + 1):
        cheb = np.polynomial.chebyshev.chebfit(u, y, deg)
        p = np.polynomial.chebyshev.cheb2poly(cheb).astype(np.float32)
        err = np.max(np.abs(horner(p, uf).astype(np.float64) - y))
        if err < tol:
            return p
    return None


def horner(coeffs, u):
    """Evaluate power-basis ``coeffs`` (lowest degree first) at ``u`` by
    Horner's rule — one fused multiply-add per degree; works on numpy and
    jnp arrays alike (the kernel calls it on VMEM tiles)."""
    acc = u * 0.0 + coeffs[-1]
    for c in coeffs[-2::-1]:
        acc = acc * u + c
    return acc
