"""SE(3) containers and group ops as registered pytrees.

Re-design of the reference's ``AffineT`` / ``AffineGrad`` plain-object
containers (``util.py:10-56``) as jax pytrees so they flow through
jit / vmap / grad / scan / shard_map unchanged.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .so3 import MM, euler_to_rmat, rmul, so3_lerp, so3_scale

__all__ = ["AffineT", "AffineGrad", "ProtData", "se3_lerp", "se3_scale"]


@jax.tree_util.register_pytree_node_class
class AffineT:
    """SE(3) element: ``rot`` (..., 3, 3) rotation + ``shift`` (..., 3).

    Pytree-registered equivalent of ``util.py:10-43``.  Immutable.
    """

    __slots__ = ("rot", "shift")

    def __init__(self, rot: jax.Array, shift: jax.Array):
        self.rot = rot
        self.shift = shift

    # -- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        return (self.rot, self.shift), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- container protocol (reference: util.py:16-20) -------------------
    def __len__(self):
        return max(len(self.rot), len(self.shift))

    def __getitem__(self, item):
        return AffineT(self.rot[item], self.shift[item])

    @property
    def shape(self):
        return self.shift.shape

    @property
    def dtype(self):
        return self.shift.dtype

    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "AffineT":
        rot = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        shift = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return cls(rot, shift)

    @classmethod
    def from_euler(cls, euls: jax.Array, shift: jax.Array) -> "AffineT":
        """(reference: ``util.py:35-38``)"""
        rot = euler_to_rmat(euls[..., 0], euls[..., 1], euls[..., 2])
        return cls(rot, shift)

    def compose(self, other: "AffineT") -> "AffineT":
        """Group composition: (R1,s1) . (R2,s2) = (R1 R2, R1 s2 + s1)."""
        return AffineT(
            rmul(self.rot, other.rot),
            jnp.einsum("...ij,...j->...i", self.rot, other.shift, precision=MM)
            + self.shift,
        )

    def __repr__(self):
        return f"AffineT(rot={self.rot.shape}, shift={self.shift.shape})"


@jax.tree_util.register_pytree_node_class
class AffineGrad:
    """Tangent-space gradient container (reference: ``util.py:46-56``):
    ``rot_g`` (..., 3) skew-vec + ``shift_g`` (..., 3).  The SE(3) denoisers'
    output type."""

    __slots__ = ("rot_g", "shift_g")

    def __init__(self, rot_g: jax.Array, shift_g: jax.Array):
        self.rot_g = rot_g
        self.shift_g = shift_g

    def tree_flatten(self):
        return (self.rot_g, self.shift_g), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __len__(self):
        return max(len(self.rot_g), len(self.shift_g))

    def __getitem__(self, item):
        return AffineGrad(self.rot_g[item], self.shift_g[item])

    def __repr__(self):
        return f"AffineGrad(rot_g={self.rot_g.shape}, shift_g={self.shift_g.shape})"


class ProtData(NamedTuple):
    """Protein rigid-gas representation (reference: ``util.py:59``):
    one-hot residues (N, 21), C-alpha positions (N, 3), local frames (N, 3, 3).

    As a NamedTuple this is automatically a pytree; padded/batched variants
    simply carry leading batch dims plus a mask held separately.
    """

    residues: jax.Array
    positions: jax.Array
    angles: jax.Array


def se3_lerp(transf_a: AffineT, transf_b: AffineT, weight: jax.Array) -> AffineT:
    """Componentwise geodesic/linear interpolation (reference: ``util.py:364-379``)."""
    rot = so3_lerp(transf_a.rot, transf_b.rot, weight)
    shift = transf_a.shift + weight * (transf_b.shift - transf_a.shift)
    return AffineT(rot, shift)


def se3_scale(transf: AffineT, scalars: jax.Array) -> AffineT:
    """Componentwise scaling (reference: ``util.py:382-385``)."""
    return AffineT(so3_scale(transf.rot, scalars), transf.shift * scalars[..., None])
