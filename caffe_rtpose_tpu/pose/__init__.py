from . import connect, descriptor, estimator, preprocess  # noqa: F401
from .descriptor import COCO_18, MPI_15, for_num_parts  # noqa: F401
from .estimator import PoseEstimator, PoseResult  # noqa: F401
