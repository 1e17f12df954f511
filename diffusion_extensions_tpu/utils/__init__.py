"""Small shared utilities."""
from .backend import use_pallas_tpu  # noqa: F401
from .compile_cache import enable_compilation_cache  # noqa: F401
