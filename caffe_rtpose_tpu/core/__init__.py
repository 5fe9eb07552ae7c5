from . import filler, layers, net  # noqa: F401
from .net import Net  # noqa: F401
