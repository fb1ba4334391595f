from drain3_spark.io.tables import TableIO

__all__ = ["TableIO"]
