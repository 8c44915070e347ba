from graphula_spark.sources.ntriples import read_ntriples

__all__ = ["read_ntriples"]
