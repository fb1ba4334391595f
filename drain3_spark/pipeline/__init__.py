from drain3_spark.pipeline import (dedup, manifest, multimodal, sampling,
                                   similarity, text)

__all__ = ["dedup", "manifest", "multimodal", "sampling", "similarity",
           "text"]
