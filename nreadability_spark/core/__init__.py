"""Pure-Python extraction core. No Spark imports allowed in this package."""

from nreadability_spark.core.transcoder import ExtractionOptions, ExtractResult, extract

__all__ = ["ExtractionOptions", "ExtractResult", "extract"]
