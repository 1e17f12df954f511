"""Self-contained PDB parsing -> protein rigid-gas representation.

Replaces the reference's BioPython dependency (``prot_util.py:43-58``) with
a ~60-line fixed-column ATOM-record parser (PDB format v3.3), producing the
same ``ProtData``: one-hot residues over the 21-class vocabulary, C-alpha
positions, and a local frame from the C-CA / N-CA bond directions and their
cross product.

Also provides the padded/masked batch collation that turns ragged protein
lists into static-shape ``ProtBatch`` arrays (the TPU replacement for
``pad_sequence``-per-forward, ``models.py:277-308``), and synthetic protein
pair generation for environments without the BPTI_dock dataset.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.protnet import RES_COUNT, UNIQUE_RESIDUES
from ..models.projections import ProtBatch
from ..ops.se3 import ProtData

__all__ = [
    "parse_pdb_residues",
    "pdb_to_rigid_gas",
    "ProtPairDataset",
    "pad_prot_batch",
    "synthetic_prot_pair",
    "random_affine_np",
    "move_prots_np",
]

_UNKNOWN = UNIQUE_RESIDUES.index("---")


def parse_pdb_residues(pdbfile) -> List[dict]:
    """Parse ATOM records into an ordered list of residues, each a dict of
    atom name -> xyz plus ``resname``.  Fixed-column PDB v3.3 layout:
    name cols 13-16, resname 18-20, chain 22, resseq 23-26, icode 27,
    x/y/z 31-54."""
    residues: List[dict] = []
    current_key = None
    current: dict | None = None
    with open(pdbfile) as f:
        for line in f:
            if not line.startswith("ATOM"):
                if line.startswith("ENDMDL"):
                    break  # first model only (BioPython default behavior)
                continue
            name = line[12:16].strip()
            altloc = line[16]
            if altloc not in (" ", "A"):
                continue  # keep primary conformation
            resname = line[17:20].strip()
            key = (line[21], line[22:27])  # chain, resseq+icode
            xyz = (
                float(line[30:38]),
                float(line[38:46]),
                float(line[46:54]),
            )
            if key != current_key:
                current = {"resname": resname}
                residues.append(current)
                current_key = key
            current.setdefault(name, xyz)
    return residues


def pdb_to_rigid_gas(pdbfile, strict: bool = False) -> ProtData:
    """PDB file -> ProtData (numpy) (reference: ``prot_util.py:43-58``).

    Residues missing CA/C/N backbone atoms are dropped; unknown residue
    names map to the "---" class (the reference's ``.index`` would raise —
    set ``strict=True`` for that behavior)."""
    residues = [
        r for r in parse_pdb_residues(pdbfile)
        if all(k in r for k in ("CA", "C", "N"))
    ]
    n = len(residues)
    one_hot = np.zeros((n, RES_COUNT), dtype=np.float32)
    pos = np.zeros((n, 3), dtype=np.float32)
    vecs = np.zeros((n, 3, 3), dtype=np.float32)
    for i, res in enumerate(residues):
        name = res["resname"]
        if name in UNIQUE_RESIDUES:
            one_hot[i, UNIQUE_RESIDUES.index(name)] = 1.0
        elif strict:
            raise ValueError(f"unknown residue {name!r} in {pdbfile}")
        else:
            one_hot[i, _UNKNOWN] = 1.0
        ca = np.asarray(res["CA"], dtype=np.float32)
        pos[i] = ca
        v1 = np.asarray(res["C"], dtype=np.float32) - ca
        v2 = np.asarray(res["N"], dtype=np.float32) - ca
        v1 /= np.linalg.norm(v1)
        v2 /= np.linalg.norm(v2)
        vecs[i] = np.stack((v1, v2, np.cross(v1, v2)), axis=0)
    return ProtData(one_hot, pos, vecs)


class ProtPairDataset:
    """(receptor, ligand) ProtData pairs from ``<id>_receptors.pdb`` /
    ``<id>_ligand.pdb`` files (reference: ``prot_util.py:84-99``)."""

    def __init__(self, path):
        self.basepath = Path(path)
        self.prots = sorted(
            {
                x[:4]
                for x in os.listdir(path)
                if x.endswith("pdb") and ("receptors" in x or "ligand" in x)
            }
        )

    def __len__(self):
        return len(self.prots)

    def __getitem__(self, idx) -> Tuple[ProtData, ProtData]:
        receptor = pdb_to_rigid_gas(
            self.basepath / (self.prots[idx] + "_receptors.pdb")
        )
        ligand = pdb_to_rigid_gas(
            self.basepath / (self.prots[idx] + "_ligand.pdb")
        )
        return receptor, ligand


def _pad_stack(prots: Sequence[ProtData], length: int | None = None):
    lengths = [p.positions.shape[0] for p in prots]
    L = length or max(lengths)
    b = len(prots)
    res = np.zeros((b, L, RES_COUNT), dtype=np.float32)
    pos = np.zeros((b, L, 3), dtype=np.float32)
    ang = np.zeros((b, L, 3, 3), dtype=np.float32)
    mask = np.zeros((b, L), dtype=bool)
    for i, p in enumerate(prots):
        n = lengths[i]
        res[i, :n] = p.residues
        pos[i, :n] = p.positions
        ang[i, :n] = p.angles
        mask[i, :n] = True
    # Stay in host numpy: jit transfers the (possibly K-stacked) batch in one
    # h2d at dispatch.  Returning device arrays here made the driver's
    # np.stack K-grouping pull every leaf BACK through the device relay
    # (~80 blocking d2h readbacks per dispatch, an 8x step-rate collapse).
    return ProtData(res, pos, ang), mask


def pad_prot_batch(
    pairs: Sequence[Tuple[ProtData, ProtData]],
    receptor_len: int | None = None,
    ligand_len: int | None = None,
) -> ProtBatch:
    """Collate ragged pairs into a static-shape masked ProtBatch.  Pass
    bucket lengths to keep shapes stable across batches (one XLA program)."""
    rec, r_mask = _pad_stack([r for r, _ in pairs], receptor_len)
    lig, l_mask = _pad_stack([l for _, l in pairs], ligand_len)
    return ProtBatch(rec, lig, r_mask, l_mask)


def synthetic_prot_pair(
    rng: np.random.Generator, n_rec: int = 120, n_lig: int = 60
) -> Tuple[ProtData, ProtData]:
    """Random rigid-gas pair with realistic scales (CA positions spread
    ~tens of Angstroms, unit frames) for dataset-free smoke/benchmarks."""

    def mk(n, center):
        one_hot = np.zeros((n, RES_COUNT), dtype=np.float32)
        one_hot[np.arange(n), rng.integers(0, RES_COUNT - 1, n)] = 1.0
        pos = (rng.standard_normal((n, 3)) * 8.0 + center).astype(np.float32)
        v1 = rng.standard_normal((n, 3)).astype(np.float32)
        v1 /= np.linalg.norm(v1, axis=-1, keepdims=True)
        v2 = rng.standard_normal((n, 3)).astype(np.float32)
        v2 -= (v1 * v2).sum(-1, keepdims=True) * v1
        v2 /= np.linalg.norm(v2, axis=-1, keepdims=True)
        vecs = np.stack((v1, v2, np.cross(v1, v2)), axis=1)
        return ProtData(one_hot, pos, vecs)

    return mk(n_rec, np.zeros(3)), mk(n_lig, np.array([20.0, 0.0, 0.0]))


def transform_pdb(in_path, out_path, rot: np.ndarray, shift: np.ndarray):
    """Rewrite a PDB file with every atom coordinate transformed by
    ``x -> x @ rot^T + shift`` (the ``Bio.PDB`` ``structure.transform``
    semantics used by ``pdb_path_gen.py:40-43``), preserving all other
    columns byte-for-byte."""
    rot = np.asarray(rot, dtype=np.float64)
    shift = np.asarray(shift, dtype=np.float64)
    out_lines = []
    with open(in_path) as f:
        for line in f:
            if line.startswith(("ATOM", "HETATM")) and len(line) >= 54:
                xyz = np.array(
                    [float(line[30:38]), float(line[38:46]), float(line[46:54])]
                )
                nx, ny, nz = xyz @ rot.T + shift
                line = (
                    line[:30]
                    + f"{nx:8.3f}{ny:8.3f}{nz:8.3f}"
                    + line[54:]
                )
            out_lines.append(line)
    with open(out_path, "w") as f:
        f.writelines(out_lines)


def random_affine_np(rng: np.random.Generator):
    """Haar-QR rotation + unit normal shift (augmentation,
    ``prot_train.py:95-100``)."""
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    return q.astype(np.float32), rng.standard_normal(3).astype(np.float32)


def move_prots_np(rot: np.ndarray, shift: np.ndarray, prots):
    """Move a collection of proteins about their shared centroid (numpy,
    host-side augmentation; reference: ``prot_util.py:61-70``)."""
    all_pos = np.concatenate([np.asarray(p.positions) for p in prots], axis=0)
    mean = all_pos.mean(axis=0, keepdims=True)
    out = []
    for p in prots:
        pos = (np.asarray(p.positions) - mean) @ rot.T + mean + shift
        ang = np.asarray(p.angles) @ rot.T
        out.append(ProtData(p.residues, pos.astype(np.float32), ang.astype(np.float32)))
    return out
