"""Small shared utilities."""
from .compile_cache import enable_compilation_cache  # noqa: F401
