from wicsmmiretl_spark.plans.config import PipelineConfig
from wicsmmiretl_spark.plans.pipeline import CaptionPipeline

__all__ = ["PipelineConfig", "CaptionPipeline"]
