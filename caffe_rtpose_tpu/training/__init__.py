from . import solver  # noqa: F401
from .solver import Solver  # noqa: F401
