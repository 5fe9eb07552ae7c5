from . import cpm  # noqa: F401
