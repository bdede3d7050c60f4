from kernel_memory_spark.sources.tables import TableCatalog

__all__ = ["TableCatalog"]
