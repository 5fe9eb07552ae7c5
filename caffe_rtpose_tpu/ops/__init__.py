from . import elementwise, imresize, layout, losses, nms, nn  # noqa: F401
