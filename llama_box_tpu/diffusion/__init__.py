from .scheduler import NoiseSchedule, SAMPLERS, make_sigmas
from .pipeline import DiffusionPipeline, GenerationParams

__all__ = ["NoiseSchedule", "SAMPLERS", "make_sigmas", "DiffusionPipeline",
           "GenerationParams"]
