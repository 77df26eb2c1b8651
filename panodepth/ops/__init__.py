from . import projection, sampling  # noqa: F401
