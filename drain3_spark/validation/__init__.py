from drain3_spark.validation.runner import ValidationEngine, ValidationReport

__all__ = ["ValidationEngine", "ValidationReport"]
