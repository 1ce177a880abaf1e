from . import normalizers, validators  # noqa: F401
