"""Projection operators: render the diffusion state onto the data before the
denoiser sees it ("projected diffusion", reference ``models.py:75-91`` and
``prot_util.py:102-117``).

In the reference these are nn.Modules mutated onto the process per batch
(``diffusion.py:273-277``); here they are plain callables closed over the
batch data — pass as the ``projection=`` argument of any process method.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.se3 import AffineT, ProtData
from ..ops.so3 import MM, euler_to_rmat

__all__ = [
    "PointCloudProj",
    "move_prot_batch",
    "ProtBatch",
    "ProtProjection",
]


class PointCloudProj:
    """Aircraft projection: ``data @ R^T`` (reference: ``models.py:75-91``).
    ``so3=False`` decodes a 3-vector of Euler angles first."""

    def __init__(self, data: jax.Array, so3: bool = True):
        self.data = data  # (B, N, 3)
        self.so3 = so3

    def __call__(self, x: jax.Array) -> jax.Array:
        if self.so3:
            r = x
        else:
            r = euler_to_rmat(x[..., 0], x[..., 1], x[..., 2])
        # (A B)^T = B^T A^T: data @ R^T rotates every point by R.
        return jnp.matmul(self.data, jnp.swapaxes(r, -1, -2), precision=MM)


class ProtBatch(NamedTuple):
    """Padded, batched receptor/ligand pair with validity masks.

    The reference keeps proteins as Python lists of ragged tensors and
    re-pads inside every forward (``models.py:277-308``,
    ``prot_util.py:115-117`` — a host-side Python loop per batch element).
    On TPU the batch is padded once at data-loading time to a static bucket
    length and everything downstream is masked dense compute.
    """

    receptor: ProtData  # fields (B, Lr, ...)
    ligand: ProtData  # fields (B, Ll, ...)
    receptor_mask: jax.Array  # (B, Lr) bool
    ligand_mask: jax.Array  # (B, Ll) bool


def move_prot_batch(
    transf: AffineT, prot: ProtData, mask: jax.Array
) -> ProtData:
    """Apply per-batch rigid transforms about each protein's masked centroid
    (batched equivalent of ``prot_util.py:73-81``)."""
    m = mask[..., None].astype(prot.positions.dtype)
    denom = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
    mean_pos = jnp.sum(prot.positions * m, axis=-2, keepdims=True) / denom
    rot_t = jnp.swapaxes(transf.rot, -1, -2)  # (B, 3, 3)
    pos = (
        jnp.matmul(prot.positions - mean_pos, rot_t, precision=MM)
        + mean_pos
        + transf.shift[..., None, :]
    )
    angles = jnp.matmul(prot.angles, rot_t[..., None, :, :], precision=MM)
    return ProtData(prot.residues, pos, angles)


class ProtProjection:
    """Protein projection: move the ligand by the current transform, keep the
    receptor fixed (reference: ``prot_util.py:102-117``).  ``se3=False``
    decodes a 6-vector (euler + shift) first."""

    def __init__(self, batch: ProtBatch, se3: bool = True):
        self.batch = batch
        self.se3 = se3

    def __call__(self, transforms) -> ProtBatch:
        if self.se3:
            tfs = transforms
        else:
            eul = transforms[..., :3]
            rots = euler_to_rmat(eul[..., 0], eul[..., 1], eul[..., 2])
            tfs = AffineT(rots, transforms[..., 3:])
        new_lig = move_prot_batch(tfs, self.batch.ligand, self.batch.ligand_mask)
        return ProtBatch(
            self.batch.receptor,
            new_lig,
            self.batch.receptor_mask,
            self.batch.ligand_mask,
        )
