"""Datasets and host->device pipelines."""
from .shapenet import BatchLoader, ShapeNet, synthetic_planes  # noqa: F401
from .synthetic import (  # noqa: F401
    BINGHAM_COVS,
    bingham_dist,
    lock_segment_endpoints,
    sample_lock_batch,
    sample_two_mode_batch,
    two_mode_rotations,
)
from .jigsaw import JigsawPuzzle, render_jigsaw  # noqa: F401
from .pdb import (  # noqa: F401
    ProtPairDataset,
    move_prots_np,
    pad_prot_batch,
    parse_pdb_residues,
    pdb_to_rigid_gas,
    random_affine_np,
    synthetic_prot_pair,
)
