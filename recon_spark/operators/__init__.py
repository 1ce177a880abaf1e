from . import cleaning  # noqa: F401
