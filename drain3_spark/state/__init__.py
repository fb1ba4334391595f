from drain3_spark.state.store import CheckpointStore

__all__ = ["CheckpointStore"]
