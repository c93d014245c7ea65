"""Templated multi-statement SQL runner (the reference's HiveService,
steps/hive.py:13-50): `#{hivevar:name}` placeholders interpolated into SQL
text (from a string or file), split on ';', executed via spark.sql."""

from __future__ import annotations

from pyspark.sql import SparkSession


def interpolate(sql_text: str, variables: dict[str, str] | None = None) -> str:
    for key, value in (variables or {}).items():
        token = key if key.startswith("#{") else "#{hivevar:%s}" % key
        sql_text = sql_text.replace(token, str(value))
    return sql_text


def split_statements(sql_text: str) -> list[str]:
    return [s.strip() for s in sql_text.split(";") if s.strip()]


class SqlRunner:
    def __init__(self, spark: SparkSession):
        self._spark = spark

    def execute(
        self,
        sql_text: str | None = None,
        file: str | None = None,
        variables: dict[str, str] | None = None,
    ):
        """Run every ';'-separated statement after interpolation; returns
        the last statement's DataFrame."""
        if sql_text is None:
            if file is None:
                raise ValueError("need sql_text or file")
            with open(file) as fd:
                sql_text = fd.read()
        result = None
        for stmt in split_statements(interpolate(sql_text, variables)):
            result = self._spark.sql(stmt)
        return result

    def execute_many(self, statements: list[str]):
        for stmt in statements:
            self._spark.sql(stmt)

    def create_database_if_not_exists(self, name: str) -> None:
        self._spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")
