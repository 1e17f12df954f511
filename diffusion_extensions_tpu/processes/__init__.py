"""Diffusion processes as pure-functional pytrees with lax.scan samplers."""
from .schedule import Schedule, cosine_beta_schedule, extract  # noqa: F401
from .r3 import GaussianDiffusion, ProjectedGaussianDiffusion  # noqa: F401
from .so3 import ProjectedSO3Diffusion, SO3Diffusion  # noqa: F401
from .se3 import ProjectedSE3Diffusion, SE3Diffusion  # noqa: F401
from .euler import ProjectedEulerDiffusion  # noqa: F401
