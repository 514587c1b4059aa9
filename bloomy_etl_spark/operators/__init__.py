from bloomy_etl_spark.operators.relational import QUERIES, ORACLE_SQL

__all__ = ["QUERIES", "ORACLE_SQL"]
