from . import record  # noqa: F401
