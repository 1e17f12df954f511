"""Tests for data loaders: jigsaw renderer, PDB parser, batchers."""
import os
import textwrap

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_extensions_tpu.data import (
    BatchLoader,
    JigsawPuzzle,
    pad_prot_batch,
    pdb_to_rigid_gas,
    render_jigsaw,
    synthetic_planes,
    synthetic_prot_pair,
)
from diffusion_extensions_tpu.models.protnet import RES_COUNT


def test_jigsaw_render_shapes_and_colors():
    jp = JigsawPuzzle(seed=0)
    imgs = jp(jnp.zeros((4, 2)))
    assert imgs.shape == (4, 128, 128, 3)
    img = np.asarray(imgs[0])
    # contains white background, red square, blue circle
    assert (img == [1, 1, 1]).all(axis=-1).any()
    assert (img == [1, 0, 0]).all(axis=-1).any()
    assert (img == [0, 0, 1]).all(axis=-1).any()
    # circle at state 0 renders at image centre
    cx = img[60:68, 60:68]
    assert (cx == [0, 0, 1]).all(axis=-1).any()


def test_jigsaw_render_jit_and_batch_consistency():
    jp = JigsawPuzzle(seed=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
    a = jp(x)
    b = jax.jit(jp)(x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # each element matches its solo render
    solo = jp(x[3:4])
    np.testing.assert_array_equal(np.asarray(a[3]), np.asarray(solo[0]))


def test_jigsaw_true_position_cut_out():
    jp = JigsawPuzzle(seed=2)
    # moving circle far away: true circle location must be white (cut out)
    img = np.asarray(jp(jnp.asarray([[3.9, 3.9]]))[0])
    tx, ty = jp.circle_pos
    assert (img[int(tx), int(ty)] == [1, 1, 1]).all()


_FAKE_PDB = textwrap.dedent(
    """\
    ATOM      1  N   ALA A   1      11.104   6.134  -6.504  1.00  0.00           N
    ATOM      2  CA  ALA A   1      11.639   6.071  -5.147  1.00  0.00           C
    ATOM      3  C   ALA A   1      10.674   6.719  -4.163  1.00  0.00           C
    ATOM      4  O   ALA A   1       9.462   6.489  -4.255  1.00  0.00           O
    ATOM      5  N   GLY A   2      11.201   7.508  -3.234  1.00  0.00           N
    ATOM      6  CA  GLY A   2      10.392   8.205  -2.249  1.00  0.00           C
    ATOM      7  C   GLY A   2      11.044   9.511  -1.880  1.00  0.00           C
    ATOM      8  N   XXX A   3      12.104   9.134  -1.504  1.00  0.00           N
    ATOM      9  CA  XXX A   3      12.639   9.071  -0.147  1.00  0.00           C
    ATOM     10  C   XXX A   3      11.674   9.719   0.837  1.00  0.00           C
    """
)


def test_pdb_parser(tmp_path):
    path = os.path.join(str(tmp_path), "test.pdb")
    with open(path, "w") as f:
        f.write(_FAKE_PDB)
    prot = pdb_to_rigid_gas(path)
    assert prot.residues.shape == (3, RES_COUNT)
    assert prot.positions.shape == (3, 3)
    assert prot.angles.shape == (3, 3, 3)
    # residue classes: ALA, GLY, unknown -> "---"
    assert prot.residues[0].argmax() == 0  # ALA
    assert prot.residues[1].argmax() == 5  # GLY
    assert prot.residues[2].argmax() == RES_COUNT - 1  # unknown
    np.testing.assert_allclose(prot.positions[0], [11.639, 6.071, -5.147])
    # frame rows v1, v2 are unit
    np.testing.assert_allclose(
        np.linalg.norm(prot.angles[:, :2], axis=-1), 1.0, atol=1e-5
    )


def test_pad_prot_batch():
    rng = np.random.default_rng(0)
    pairs = [synthetic_prot_pair(rng, 10 + i, 5 + i) for i in range(3)]
    batch = pad_prot_batch(pairs)
    assert batch.receptor.positions.shape == (3, 12, 3)
    assert batch.ligand.positions.shape == (3, 7, 3)
    assert batch.receptor_mask.sum() == 10 + 11 + 12
    assert batch.ligand_mask.sum() == 5 + 6 + 7
    # padded region zero
    assert float(batch.receptor.positions[0, 10:].sum()) == 0.0


def test_batch_loader():
    data = synthetic_planes(10, points=64, seed=0)
    loader = BatchLoader(data, batch=4, samples=16, seed=1, device_put=False)
    batches = list(loader.epoch())
    assert len(batches) == 2  # drop_last
    assert batches[0].shape == (4, 16, 3)
    # cycle
    it = iter(loader)
    got = [next(it) for _ in range(5)]
    assert all(b.shape == (4, 16, 3) for b in got)
