from kernel_memory_spark.streaming.pipeline import Pipeline, PipelineConfig

__all__ = ["Pipeline", "PipelineConfig"]
