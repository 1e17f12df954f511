"""SO(3) geometry core: pure-jnp Lie-group math, TPU-first.

This module is the jax re-design of the reference geometry layer
(``/root/reference/util.py:62-423``). Everything is shape-polymorphic over
leading batch dims, jit/vmap/grad-safe (no data-dependent control flow, no
boolean-mask assignment), and float32 by default.

Key TPU-first departures from the reference:

* ``exp_skewvec`` uses the closed-form Rodrigues formula instead of
  ``torch.matrix_exp`` + SVD re-orthogonalisation (``util.py:195-205``):
  for so(3) the Rodrigues result is exactly orthogonal to machine precision,
  so the SVD is dead weight on the hot path.
* ``log_rmat`` computes the pi-rotation fallback *unconditionally* from the
  symmetric part (R+I)/2 = nn^T (instead of ``torch.linalg.eigh`` on a
  boolean-masked subset, ``util.py:177-191``) and ``where``-selects it, which
  keeps the function a single fused XLA computation.
* All "small angle" guards are ``where``-based with sanitised denominators so
  gradients are NaN-free on both branches.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "skew2vec",
    "vec2skew",
    "exp_skewvec",
    "log_rmat",
    "log_rmat_vec",
    "aa_to_rmat",
    "rmat_to_aa",
    "rotation_angle",
    "so3_lerp",
    "so3_bezier",
    "so3_scale",
    "rmat2six",
    "six2rmat",
    "quat_to_rmat",
    "rmat_to_euler",
    "euler_to_rmat",
    "orthogonalise",
    "haar_rotations",
]

_EPS = 1e-8

# All 3x3 rotation-composition matmuls run at full float32 precision: on TPU
# the default matmul precision is bfloat16, which is exactly right for the
# big model matmuls but would drift rotation matrices off the manifold by
# ~1e-2 per composition.  These 3x3 products are negligible FLOPs, so
# HIGHEST costs nothing and keeps the geometry exact.
MM = jax.lax.Precision.HIGHEST


def rmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Rotation-matrix product at float32 precision (TPU-safe compose)."""
    return jnp.matmul(a, b, precision=MM)


def _safe_norm(x: jax.Array, axis=-1, keepdims=False) -> jax.Array:
    """L2 norm whose gradient is 0 (not NaN) at the origin: the sqrt input is
    ``where``-sanitised so the unselected branch never produces inf*0."""
    sumsq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    ok = sumsq > 1e-24
    norm = jnp.sqrt(jnp.where(ok, sumsq, 1.0))
    return jnp.where(ok, norm, 0.0)


def skew2vec(skew: jax.Array) -> jax.Array:
    """so(3) matrix -> R^3 vector (reference: ``util.py:79-84``)."""
    return jnp.stack(
        (skew[..., 2, 1], -skew[..., 2, 0], skew[..., 1, 0]), axis=-1
    )


def vec2skew(vec: jax.Array) -> jax.Array:
    """R^3 vector -> so(3) matrix (reference: ``util.py:87-92``)."""
    zero = jnp.zeros_like(vec[..., 0])
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    row0 = jnp.stack((zero, -z, y), axis=-1)
    row1 = jnp.stack((z, zero, -x), axis=-1)
    row2 = jnp.stack((-y, x, zero), axis=-1)
    return jnp.stack((row0, row1, row2), axis=-2)


def exp_skewvec(vec: jax.Array) -> jax.Array:
    """Rodrigues exponential map: R = exp([v]_x), v in R^3.

    Replaces ``torch.matrix_exp`` on the hot path (reference
    ``util.py:195-205,349-361``).  Exactly orthogonal up to fp rounding, so no
    SVD re-orthogonalisation is needed.  Taylor branches keep gradients finite
    at theta -> 0.
    """
    theta_sq = jnp.sum(vec * vec, axis=-1)
    small = theta_sq < 1e-8  # theta < 1e-4
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallback; the sqrt input is
    # sanitised so gradients stay finite at theta == 0.
    theta_safe = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta_safe) / theta_safe)
    b = jnp.where(
        small,
        0.5 - theta_sq / 24.0,
        (1.0 - jnp.cos(theta_safe)) / jnp.where(small, 1.0, theta_sq),
    )
    k = vec2skew(vec)
    k2 = jnp.matmul(k, k, precision=MM)
    eye = jnp.eye(3, dtype=vec.dtype)
    return eye + a[..., None, None] * k + b[..., None, None] * k2


def _pi_axis(r_mat: jax.Array) -> jax.Array:
    """Rotation axis for R ~= rotation by pi, from (R+I)/2 = nn^T.

    Replaces the reference's masked ``torch.linalg.eigh`` fallback
    (``util.py:177-191``) with a branch-free closed form: pick the column of
    nn^T with the largest diagonal (best-conditioned), normalise it.
    The sign of the axis is immaterial for the matrix logarithm at theta=pi
    (exp(+pi n) == exp(-pi n)).
    """
    sym = 0.5 * (r_mat + jnp.swapaxes(r_mat, -1, -2))
    nnt = 0.5 * (sym + jnp.eye(3, dtype=r_mat.dtype))
    diag = jnp.diagonal(nnt, axis1=-2, axis2=-1)  # (..., 3) = n_i^2
    k = jnp.argmax(diag, axis=-1)  # best-conditioned column
    col = jnp.take_along_axis(nnt, k[..., None, None].repeat(3, axis=-2), axis=-1)[
        ..., 0
    ]
    norm = _safe_norm(col, keepdims=True)
    return col / jnp.maximum(norm, _EPS)


def log_rmat(r_mat: jax.Array) -> jax.Array:
    """Matrix logarithm on SO(3) (reference: ``util.py:164-192``).

    atan2-based angle for stability near 0; unconditional pi-branch via
    ``_pi_axis`` selected with ``where`` (jit-safe, no eigh, no masking).

    Note: the reference's pi-fallback is buggy — it reads the last *row* of
    torch.linalg.eigh's eigenvector matrix (``util.py:188``:
    ``eigvec[...,-1,:]``) where the axis is the last *column*, so for exact
    pi-rotations it returns the log about a wrong axis (its own code comment
    says "this *should* just be the last column").  We return the correct
    log: ``exp_skewvec(log_rmat_vec(R)) == R`` holds for all inputs here,
    including theta == pi.
    """
    return vec2skew(log_rmat_vec(r_mat))


def log_rmat_vec(r_mat: jax.Array) -> jax.Array:
    """skew2vec(log_rmat(R)) = theta * axis, fused (saves a skew round-trip).

    This is the tangent-vector form the diffusion losses consume directly
    (reference computes ``skew2vec(log_rmat(noise))`` at ``diffusion.py:355``).
    """
    skew = r_mat - jnp.swapaxes(r_mat, -1, -2)
    sk_vec = skew2vec(skew)  # = 2 sin(theta) * axis
    s_angle = 0.5 * _safe_norm(sk_vec)
    c_angle = 0.5 * (jnp.trace(r_mat, axis1=-2, axis2=-1) - 1.0)
    angle = jnp.arctan2(s_angle, c_angle)

    # Regular branch: v = angle/(2 s_angle) * sk_vec, 0 when angle == 0.
    near_zero = angle < 1e-6
    near_pi = s_angle < 1e-6  # with c_angle<0 this is theta ~= pi; the
    # reference only leaves its atan2 branch when scale is NaN (s_angle==0).
    denom = jnp.where(near_pi | near_zero, 1.0, 2.0 * s_angle)
    scale = jnp.where(near_zero, 0.0, angle / denom)
    v_reg = scale[..., None] * sk_vec

    # Pi branch: v = theta * axis(R) with axis from (R+I)/2 = nn^T.
    v_pi = angle[..., None] * _pi_axis(r_mat)

    use_pi = (near_pi & (c_angle < 0.0))[..., None]
    return jnp.where(use_pi, v_pi, v_reg)


def rotation_angle(r_mat: jax.Array) -> jax.Array:
    """Geodesic angle theta in [0, pi] of a rotation matrix (atan2 form)."""
    skew = r_mat - jnp.swapaxes(r_mat, -1, -2)
    sk_vec = skew2vec(skew)
    s_angle = 0.5 * _safe_norm(sk_vec)
    c_angle = 0.5 * (jnp.trace(r_mat, axis1=-2, axis2=-1) - 1.0)
    return jnp.arctan2(s_angle, c_angle)


def aa_to_rmat(rot_axis: jax.Array, ang: jax.Array) -> jax.Array:
    """Axis-angle -> rotation matrix (reference: ``util.py:195-205``).

    ``ang`` broadcasts against ``rot_axis[..., 0]`` the way the reference's
    ``ang[..., None]`` multiply does (it expects a trailing singleton dim on
    ``ang``; here ``ang`` is the plain angle with shape broadcastable to the
    axis batch shape).
    """
    norm = _safe_norm(rot_axis, keepdims=True)
    axis = rot_axis / jnp.maximum(norm, _EPS)
    return exp_skewvec(axis * ang[..., None])


def rmat_to_aa(r_mat: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Rotation matrix -> (axis, angle), angle in [0, pi] with trailing
    singleton dim to match the reference (``util.py:208-219``).

    Deviation: at the identity the reference returns NaN axis (0/0); we return
    the x-axis.
    """
    v = log_rmat_vec(r_mat)
    angle = _safe_norm(v, keepdims=True)
    axis = v / jnp.maximum(angle, _EPS)
    axis = jnp.where(angle < _EPS, jnp.array([1.0, 0.0, 0.0], dtype=v.dtype), axis)
    return axis, angle


def so3_lerp(rot_a: jax.Array, rot_b: jax.Array, weight: jax.Array) -> jax.Array:
    """Geodesic interpolation (reference: ``util.py:325-338``).

    ``weight`` follows the reference's broadcasting convention: it multiplies
    the (..., 1) angle from ``rmat_to_aa``, so batched weights carry a
    trailing singleton dim (scalars also work).
    """
    rot_c = rmul(jnp.swapaxes(rot_a, -1, -2), rot_b)
    axis, angle = rmat_to_aa(rot_c)
    i_angle = weight * angle  # (..., 1)
    return rmul(rot_a, aa_to_rmat(axis, i_angle[..., 0]))


def so3_bezier(rots, weight):
    """Recursive de-Casteljau on SO(3) (reference: ``util.py:340-346``)."""
    if len(rots) == 2:
        return so3_lerp(rots[0], rots[1], weight)
    a = so3_bezier(rots[:-1], weight)
    b = so3_bezier(rots[1:], weight)
    return so3_lerp(a, b, weight)


def so3_scale(rmat: jax.Array, scalars: jax.Array) -> jax.Array:
    """Fractional rotation power exp(s * log R) (reference: ``util.py:349-361``).

    Fused log->scale->Rodrigues on the 3-vector, avoiding two 3x3 matrix
    round-trips and ``matrix_exp``.
    """
    v = log_rmat_vec(rmat)
    return exp_skewvec(v * scalars[..., None])


def rmat2six(x: jax.Array) -> jax.Array:
    """First two rows flattened: the 6D rotation representation
    (Zhou et al.; reference ``util.py:62-64``)."""
    return jnp.reshape(x[..., :2, :], (*x.shape[:-2], 6))


def six2rmat(x: jax.Array) -> jax.Array:
    """Gram-Schmidt reconstruction from the 6D representation
    (reference: ``util.py:67-76``)."""
    a1 = x[..., :3]
    a2 = x[..., 3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    b1_a2 = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    b2 = a2 - b1_a2 * b1
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-2)


def quat_to_rmat(quaternions: jax.Array) -> jax.Array:
    """Real-first quaternion -> rotation matrix (reference: ``util.py:222-252``)."""
    r, i, j, k = (quaternions[..., n] for n in range(4))
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)
    o = jnp.stack(
        (
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ),
        axis=-1,
    )
    return jnp.reshape(o, (*quaternions.shape[:-1], 3, 3))


def rmat_to_euler(rmat: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """XYZ Euler decomposition (reference: ``util.py:388-393``)."""
    sy = jnp.sqrt(
        rmat[..., 0, 0] * rmat[..., 0, 0] + rmat[..., 1, 0] * rmat[..., 1, 0]
    )
    x = jnp.arctan2(rmat[..., 2, 1], rmat[..., 2, 2])
    y = jnp.arctan2(rmat[..., 2, 0], sy)
    z = jnp.arctan2(rmat[..., 1, 0], rmat[..., 0, 0])
    return x, y, z


def euler_to_rmat(x: jax.Array, y: jax.Array, z: jax.Array) -> jax.Array:
    """XYZ Euler composition R = Rz @ Ry @ Rx (reference: ``util.py:396-423``).

    Built via stacked rows rather than index assignment (jit-safe); the
    product is expanded to one fused 9-entry expression.
    """
    x, y, z = jnp.broadcast_arrays(x, y, z)
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    # Matches the reference's sign convention exactly, including
    # R_y[2,0] = +sin(y) (so R_y here is a rotation by -y about Y).
    # Explicit multiplication of the reference matrices:
    # R_x = [[1,0,0],[0,cx,-sx],[0,sx,cx]]
    # R_y = [[cy,0,-sy],[0,1,0],[sy,0,cy]]
    # R_z = [[cz,-sz,0],[sz,cz,0],[0,0,1]]
    # R = R_z @ R_y @ R_x
    ryx_00 = cy
    ryx_01 = -sy * sx
    ryx_02 = -sy * cx
    ryx_10 = jnp.zeros_like(cy)
    ryx_11 = cx
    ryx_12 = -sx
    ryx_20 = sy
    ryx_21 = cy * sx
    ryx_22 = cy * cx
    r00 = cz * ryx_00 - sz * ryx_10
    r01 = cz * ryx_01 - sz * ryx_11
    r02 = cz * ryx_02 - sz * ryx_12
    r10 = sz * ryx_00 + cz * ryx_10
    r11 = sz * ryx_01 + cz * ryx_11
    r12 = sz * ryx_02 + cz * ryx_12
    r20 = ryx_20
    r21 = ryx_21
    r22 = ryx_22
    o = jnp.stack((r00, r01, r02, r10, r11, r12, r20, r21, r22), axis=-1)
    return jnp.reshape(o, (*x.shape, 3, 3))


def orthogonalise(mat: jax.Array) -> jax.Array:
    """SVD re-orthogonalisation with rounded singular values
    (reference: ``util.py:95-107``).  Off the hot path — kept for parity and
    for sanitising near-orthogonal inputs."""
    u, s, vt = jnp.linalg.svd(mat[..., :3, :3], full_matrices=False)
    rounded = jnp.round(s)
    core = u @ (rounded[..., :, None] * vt)
    return mat.at[..., :3, :3].set(core) if mat.shape[-1] > 3 else core


def haar_rotations(key: jax.Array, shape=()) -> jax.Array:
    """Haar-uniform random rotations via QR of an iid normal matrix, matching
    the reference's sampler inits (``diffusion.py:396,490,545``;
    ``aircraft_test.py:80``).

    Note: like the reference, the raw Q of an iid Gaussian has det = +-1; the
    reference feeds such matrices to ``log_rmat``/the denoiser directly, and we
    reproduce that (no det fix-up) for parity.  Use ``haar_rotations_proper``
    if a guaranteed det=+1 sample is wanted.
    """
    g = jax.random.normal(key, (*shape, 3, 3))
    q, _ = jnp.linalg.qr(g)
    return q


def haar_rotations_proper(key: jax.Array, shape=()) -> jax.Array:
    """Haar-uniform over SO(3) proper (det=+1), via sign-fixed QR."""
    g = jax.random.normal(key, (*shape, 3, 3))
    q, r = jnp.linalg.qr(g)
    d = jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[..., None, :]
    det = jnp.linalg.det(q)
    q = q.at[..., :, 0].multiply(det[..., None])
    return q
