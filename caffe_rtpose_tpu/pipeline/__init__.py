from . import queues, runner  # noqa: F401
from .runner import PipelineConfig, RtPosePipeline  # noqa: F401
