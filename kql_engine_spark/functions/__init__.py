from . import aggregates, scalar  # noqa: F401
