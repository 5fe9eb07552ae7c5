from . import profiler, signals  # noqa: F401
