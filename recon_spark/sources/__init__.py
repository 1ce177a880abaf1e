from . import fixtures, spec, tpch  # noqa: F401
