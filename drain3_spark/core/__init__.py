from drain3_spark.core.kernel import TemplateBank, tokenize

__all__ = ["TemplateBank", "tokenize"]
