from picovdb_spark.sources.picovdb_files import read_picovdb_store, write_picovdb_store

__all__ = ["read_picovdb_store", "write_picovdb_store"]
