"""Pure camera projection kernels (jnp, differentiable, vmappable).

Shared by the user-facing camera classes and the batched residual kernels.
Reference behavior:

- Pinhole (/root/reference/cpplib/include/kontiki/sensors/pinhole_camera.h:
  47-67): ``y = (K X).hnormalized()``; time-derivative ``dy`` by the quotient
  rule with an ``eps = 1e-32`` denominator guard; ``unproject = K^-1 (u,v,1)``.
- Atan / Devernay-Faugeras FOV (atan_camera.h:54-103): with ``A = X.xy/X.z``,
  ``L = A - wc``, ``r = |L|``, ``f = atan(r*gamma)/gamma``, the projection is
  ``K (wc + f L / r, 1)``; the derivative propagates analytically. The same
  ``eps = 1e-32`` guards appear inside norms and quotients.

Camera intrinsics (K, wc, gamma) live in the measurement's static data — not
optimizable — matching the reference (PinholeMeta carries K; FIXME noted
there at pinhole_camera.h:25).
"""
import jax.numpy as jnp

_EPS = 1e-32


def pinhole_project(K, X):
    """[..., 3] camera-frame point -> [..., 2] pixel."""
    p = jnp.einsum("ij,...j->...i", K, X)
    return p[..., :2] / p[..., 2:3]


def pinhole_evaluate(K, X, dX):
    """Projection + its time derivative given dX/dt. Returns (y, dy)."""
    p = jnp.einsum("ij,...j->...i", K, X)
    dp = jnp.einsum("ij,...j->...i", K, dX)
    y = p[..., :2] / p[..., 2:3]
    denominator = p[..., 2] * p[..., 2] + _EPS
    dy = (dp[..., :2] * p[..., 2:3] - p[..., :2] * dp[..., 2:3]) / denominator[..., None]
    return y, dy


def pinhole_unproject(K_inv, y):
    """[..., 2] pixel -> [..., 3] unit-depth camera ray (z = 1 plane)."""
    ones = jnp.ones(y.shape[:-1] + (1,), dtype=y.dtype)
    yh = jnp.concatenate([y, ones], axis=-1)
    return jnp.einsum("ij,...j->...i", K_inv, yh)


def atan_project(K, wc, gamma, X):
    """Devernay-Faugeras FOV model projection."""
    A = X[..., :2] / (X[..., 2:3] + _EPS)
    L = A - wc
    r = jnp.sqrt(jnp.sum(L * L, axis=-1) + _EPS)
    f = jnp.arctan(r * gamma) / gamma
    g = L / r[..., None]
    Yxy = wc + f[..., None] * g
    ones = jnp.ones(Yxy.shape[:-1] + (1,), dtype=Yxy.dtype)
    Y = jnp.concatenate([Yxy, ones], axis=-1)
    return jnp.einsum("ij,...j->...i", K, Y)[..., :2]


def atan_evaluate(K, wc, gamma, X, dX):
    """Atan projection + time derivative. Returns (y, dy)."""
    A = X[..., :2] / (X[..., 2:3] + _EPS)
    L = A - wc
    r = jnp.sqrt(jnp.sum(L * L, axis=-1) + _EPS)
    f = jnp.arctan(r * gamma) / gamma
    g = L / r[..., None]
    Yxy = wc + f[..., None] * g
    ones = jnp.ones(Yxy.shape[:-1] + (1,), dtype=Yxy.dtype)
    Y = jnp.concatenate([Yxy, ones], axis=-1)
    y = jnp.einsum("ij,...j->...i", K, Y)[..., :2]

    z2 = X[..., 2] * X[..., 2] + _EPS
    dx = (dX[..., 0] * X[..., 2] - X[..., 0] * dX[..., 2]) / z2
    dyv = (dX[..., 1] * X[..., 2] - X[..., 1] * dX[..., 2]) / z2
    common = g[..., 0] * dx + g[..., 1] * dyv
    df = common / (1.0 + gamma * gamma * r * r)
    dgu = (dx * r - L[..., 0] * common) / (r * r)
    du = f * dgu + df * g[..., 0]
    dgv = (dyv * r - L[..., 1] * common) / (r * r)
    dv = f * dgv + df * g[..., 1]
    zeros = jnp.zeros_like(du)
    dvec = jnp.stack([du, dv, zeros], axis=-1)
    dy = jnp.einsum("ij,...j->...i", K, dvec)[..., :2]
    return y, dy


def atan_unproject(K_inv, wc, gamma, y):
    """Inverse of atan_project onto the z = 1 plane."""
    ones = jnp.ones(y.shape[:-1] + (1,), dtype=y.dtype)
    ph = jnp.concatenate([y, ones], axis=-1)
    phn = jnp.einsum("ij,...j->...i", K_inv, ph)
    L = phn[..., :2] - wc
    r = jnp.sqrt(jnp.sum(L * L, axis=-1) + _EPS)
    f = jnp.tan(r * gamma) / gamma
    Yxy = wc + f[..., None] * L / r[..., None]
    return jnp.concatenate([Yxy, ones], axis=-1)
