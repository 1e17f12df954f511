"""ShapeNet point-cloud dataset (reference: ``datasets.py:5-44``) + host
batching pipeline.

The reference uses a torch DataLoader with 4 workers and per-item
``torch.multinomial`` subsampling.  Here loading is a thin h5py reader that
materialises the (small) class subset once into one contiguous array, and
batching/subsampling are vectorised numpy on the host with an async
device-put prefetch — the TPU-idiomatic host->HBM pipeline.

When the ShapeNet HDF5 files are absent (this environment has no dataset
mounted), ``synthetic_planes`` generates aircraft-like point clouds with the
same shapes/statistics so training and benchmarking exercise the identical
compute path.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional

import jax
import numpy as np

__all__ = ["ShapeNet", "synthetic_planes", "BatchLoader"]

_SPLIT_FILES = {
    "train": "train_files.txt",
    "valid": "val_files.txt",
    "test": "test_files.txt",
}


class ShapeNet:
    """Point clouds of the given integer class labels (aircraft = 0,
    ``aircraft_rotate.py:60``) from the shapenetcorev2 HDF5 distribution."""

    def __init__(
        self,
        datatype: str,
        ids=(0,),
        samples: Optional[int] = None,
        root: str = "data/shapenetcorev2_hdf5_2048",
    ):
        import h5py

        if isinstance(ids, int):
            ids = (ids,)
        if datatype not in _SPLIT_FILES:
            raise ValueError(f"wrong dataset type specified: {datatype}")
        filelist = os.path.join(root, _SPLIT_FILES[datatype])
        with open(filelist) as f:
            files = [x.strip("\n") for x in f.readlines()]
        clouds = []
        for file in files:
            if not os.path.isabs(file) and not os.path.exists(file):
                file = os.path.join(os.path.dirname(root), file)
            with h5py.File(file, "r") as f:
                labels = np.asarray(f["label"]).reshape(-1)
                keep = np.isin(labels, ids)
                if keep.any():
                    clouds.append(np.asarray(f["data"])[keep].astype(np.float32))
        self.data = np.concatenate(clouds, axis=0)  # (M, 2048, 3)
        self.samples = samples

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, item: int) -> np.ndarray:
        cloud = self.data[item]
        if self.samples is not None:
            idx = np.random.default_rng().choice(
                cloud.shape[0], size=self.samples, replace=True
            )
            cloud = cloud[idx]
        return cloud


def synthetic_planes(
    n: int = 1024, points: int = 2048, seed: int = 0
) -> np.ndarray:
    """Aircraft-like synthetic clouds, unit-sphere normalised like ShapeNet.
    Same (N, points, 3) float32 contract.

    The geometry is deliberately rotationally *asymmetric* (like a real
    airplane): swept wings mounted forward of center, a dense nose cluster,
    and a tall rear vertical fin, so no non-identity rotation maps the
    shape near itself.  (Round 1 used a near-180deg-symmetric shape on
    which the euler-baseline arm could not learn above the Haar prior —
    the real ShapeNet planes the reference trains on are asymmetric in
    exactly these ways.)  The only residual symmetry is the y-reflection
    every real aircraft has, which is not an element of SO(3).
    """
    rng = np.random.default_rng(seed)
    out = np.empty((n, points, 3), dtype=np.float32)
    for i in range(n):
        n_fus = (2 * points) // 5
        n_wing = points // 3
        n_nose = points // 10
        n_fin = points // 10
        n_tail = points - n_fus - n_wing - n_nose - n_fin
        # fuselage along +x, slightly tapering toward the rear
        fx = rng.uniform(-1.0, 1.0, n_fus)
        taper = 0.04 + 0.03 * (fx + 1.0) / 2.0
        fus = np.stack(
            [fx, rng.normal(0, 1.0, n_fus) * taper,
             rng.normal(0, 1.0, n_fus) * taper],
            axis=-1,
        )
        # swept wings: mounted forward (x ~ 0.25 at root), trailing
        # backward with span — x decreases with |y|
        wy = rng.uniform(-0.9, 0.9, n_wing)
        wing = np.stack(
            [
                0.25 - 0.45 * np.abs(wy) + rng.normal(0, 0.05, n_wing),
                wy,
                rng.normal(0.02, 0.02, n_wing),
            ],
            axis=-1,
        )
        # dense nose cone cluster at the front
        nose = np.stack(
            [
                1.0 - np.abs(rng.normal(0, 0.08, n_nose)),
                rng.normal(0, 0.03, n_nose),
                rng.normal(0, 0.03, n_nose),
            ],
            axis=-1,
        )
        # tall vertical fin at the rear (up only: breaks x- and y-axis
        # 180deg rotations)
        fin = np.stack(
            [
                rng.uniform(-1.0, -0.8, n_fin),
                rng.normal(0, 0.02, n_fin),
                rng.uniform(0.0, 0.5, n_fin),
            ],
            axis=-1,
        )
        # horizontal tailplane, smaller span than the wings
        ty = rng.uniform(-0.35, 0.35, n_tail)
        tail = np.stack(
            [
                rng.normal(-0.9, 0.04, n_tail),
                ty,
                rng.normal(0.05, 0.02, n_tail),
            ],
            axis=-1,
        )
        cloud = np.concatenate([fus, wing, nose, fin, tail], axis=0)
        cloud -= cloud.mean(axis=0, keepdims=True)
        cloud /= np.abs(cloud).max()
        out[i] = cloud
    return out


class BatchLoader:
    """Vectorised host batcher: shuffle, per-batch point subsampling, and
    one-batch device prefetch (replaces DataLoader(num_workers=4,
    pin_memory), ``aircraft_rotate.py:61-62``)."""

    def __init__(
        self,
        data: np.ndarray,
        batch: int,
        samples: Optional[int] = None,
        seed: int = 0,
        shuffle: bool = True,
        drop_last: bool = True,
        device_put: bool = True,
    ):
        self.data = data
        self.batch = batch
        self.samples = samples
        self.rng = np.random.default_rng(seed)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.device_put = device_put

    def _make_batch(self, idx: np.ndarray) -> np.ndarray:
        clouds = self.data[idx]  # (B, P, 3)
        if self.samples is not None and self.samples < clouds.shape[1]:
            cols = self.rng.integers(
                0, clouds.shape[1], size=(len(idx), self.samples)
            )
            clouds = np.take_along_axis(clouds, cols[..., None], axis=1)
        return clouds

    def epoch(self) -> Iterator:
        order = np.arange(len(self.data))
        if self.shuffle:
            self.rng.shuffle(order)
        end = len(order) - (len(order) % self.batch if self.drop_last else 0)
        pending = None
        for i in range(0, end, self.batch):
            batch = self._make_batch(order[i : i + self.batch])
            if self.device_put:
                batch = jax.device_put(batch)  # async H2D
            if pending is not None:
                yield pending
            pending = batch
        if pending is not None:
            yield pending

    def __iter__(self):
        while True:  # cycle() semantics (util.py:478-481)
            yield from self.epoch()
