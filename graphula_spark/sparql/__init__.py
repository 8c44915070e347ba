from graphula_spark.sparql.engine import execute_sparql

__all__ = ["execute_sparql"]
