"""Denoiser models (flax.linen) and projection operators."""
from .layers import (  # noqa: F401
    PoolPos,
    PoolRN,
    ResLayer,
    ResMLPBlock,
    Siren,
    SinusoidalPosEmb,
    TransformerEncoder,
    TransformerEncoderLayer,
)
from .rot_predict import EulerRotPredict, RotPredict  # noqa: F401
from .planenet import PlaneNet  # noqa: F401
from .protnet import RES_COUNT, UNIQUE_RESIDUES, ProtNet  # noqa: F401
from .coordconv import CoordConv  # noqa: F401
from .projections import (  # noqa: F401
    PointCloudProj,
    ProtBatch,
    ProtProjection,
    move_prot_batch,
)
