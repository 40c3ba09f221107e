"""SE(3) operations (SURVEY.md component G2).

Axis-angle → rotation (Rodrigues / exp map), full SE(3) exp/log, 4×4
compose/invert. All ops are numerically stable near θ→0 via Taylor
expansions, differentiable, and written for XLA: no data-dependent control
flow, everything batched over leading dims.

Rebuild of the family-standard ``transformation_from_parameters``
(Monodepth2 ``layers.py``) required by the reference's pose branch
(/root/reference/README.md:5 — "colonoscopic pose"); no reference code
exists (SURVEY.md §0), so semantics follow the family standard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Below this θ² the closed forms are replaced by their Taylor expansions.
_EPS2 = 1e-8


def _sinc_terms(theta_sq: jnp.ndarray):
    """Return (A, B, C) = (sinθ/θ, (1−cosθ)/θ², (θ−sinθ)/θ³), stable at 0.

    Uses the double-``where`` idiom so the untaken closed-form branch never
    divides by ~0 (which would poison gradients with NaN at θ→0).
    """
    small = theta_sq < _EPS2
    safe_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(safe_sq)
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / safe_sq)
    c = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (safe_sq * theta))
    return a, b, c


def _hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (..., 3) vectors → (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def axis_angle_to_matrix(axisangle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) axis-angle → (..., 3, 3) rotation matrix.

    R = I + A·[w]ₓ + B·[w]ₓ², with A,B the stable sinc terms.
    """
    theta_sq = jnp.sum(axisangle * axisangle, axis=-1, keepdims=True)[..., None]
    a, b, _ = _sinc_terms(theta_sq)
    k = _hat(axisangle)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axisangle.dtype), k.shape)
    return eye + a * k + b * (k @ k)


def matrix_to_axis_angle(rot: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation → (..., 3) axis-angle (log map). Stable near 0."""
    trace = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    # vee of the antisymmetric part: (R − Rᵀ)/2
    w = jnp.stack(
        [
            rot[..., 2, 1] - rot[..., 1, 2],
            rot[..., 0, 2] - rot[..., 2, 0],
            rot[..., 1, 0] - rot[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    # w = 2 sinθ · axis;   axisangle = θ · axis
    scale = jnp.where(theta[..., None] < 1e-4, 0.5 + theta[..., None] ** 2 / 12.0, theta[..., None] / (2.0 * sin_theta[..., None]))
    return w * scale


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Full SE(3) exponential map: (..., 6) twist [w | v] → (..., 4, 4).

    t = V·v with V = I + B·[w]ₓ + C·[w]ₓ² (left Jacobian).
    """
    w, v = xi[..., :3], xi[..., 3:]
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    a, b, c = _sinc_terms(theta_sq)
    k = _hat(w)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), k.shape)
    rot = eye + a * k + b * k2
    vmat = eye + b * k + c * k2
    t = jnp.einsum("...ij,...j->...i", vmat, v)
    return _rt_to_mat(rot, t)


def se3_log(mat: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log map: (..., 4, 4) → (..., 6) twist [w | v]."""
    rot = mat[..., :3, :3]
    t = mat[..., :3, 3]
    w = matrix_to_axis_angle(rot)
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    a, b, c = _sinc_terms(theta_sq)
    k = _hat(w)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=mat.dtype), k.shape)
    # V⁻¹ = I − ½[w]ₓ + (1/θ²)(1 − A/(2B))·[w]ₓ²
    coef = jnp.where(
        theta_sq < _EPS2,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - a / (2.0 * b)) / jnp.maximum(theta_sq, _EPS2),
    )
    vinv = eye - 0.5 * k + coef * k2
    v = jnp.einsum("...ij,...j->...i", vinv, t)
    return jnp.concatenate([w, v], axis=-1)


def _rt_to_mat(rot: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation + (..., 3) translation → (..., 4, 4)."""
    batch = rot.shape[:-2]
    top = jnp.concatenate([rot, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transformation_from_parameters(
    axisangle: jnp.ndarray, translation: jnp.ndarray, invert: bool = False
) -> jnp.ndarray:
    """PoseNet output → 4×4 transform, family-standard semantics.

    ``T = [R(aa) | t]``; with ``invert=True`` returns ``[Rᵀ | −Rᵀ t]``
    (used for the frame t−1 source so both sources map target→source).
    Matches Monodepth2 ``layers.py:transformation_from_parameters``
    behaviorally (SURVEY.md §2.3 G2).
    """
    rot = axis_angle_to_matrix(axisangle)
    if invert:
        rot = jnp.swapaxes(rot, -1, -2)
        translation = -jnp.einsum("...ij,...j->...i", rot, translation)
    return _rt_to_mat(rot, translation)


def invert_transform(mat: jnp.ndarray) -> jnp.ndarray:
    """Invert (..., 4, 4) rigid transforms analytically: [Rᵀ | −Rᵀt]."""
    rot = jnp.swapaxes(mat[..., :3, :3], -1, -2)
    t = -jnp.einsum("...ij,...j->...i", rot, mat[..., :3, 3])
    return _rt_to_mat(rot, t)


def compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose rigid transforms: returns a @ b."""
    return a @ b


def renormalize_rotation(mat: jnp.ndarray) -> jnp.ndarray:
    """Project the rotation block back onto SO(3) via Gram–Schmidt.

    Used when chaining thousands of per-pair poses in the VO driver
    (SURVEY.md §7 hard part 4: drift from fp32 compounding).
    """
    r = mat[..., :3, :3]
    x = r[..., :, 0]
    y = r[..., :, 1]
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = y - jnp.sum(x * y, axis=-1, keepdims=True) * x
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    z = jnp.cross(x, y)
    rot = jnp.stack([x, y, z], axis=-1)
    return _rt_to_mat(rot, mat[..., :3, 3])
