from llm_aided_ocr_spark.plans.checkpoint import CheckpointStore
from llm_aided_ocr_spark.plans.pipeline import run_pipeline, salted_repartition

__all__ = ["CheckpointStore", "run_pipeline", "salted_repartition"]
