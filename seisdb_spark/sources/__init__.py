from seisdb_spark.sources.tables import TABLES, load_table, load_all

__all__ = ["TABLES", "load_table", "load_all"]
