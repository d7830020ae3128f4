"""kql_engine_spark — a PySpark-native KQL analytics engine.

A from-scratch engine with the capabilities the reference repo
(yy-database/kql-engine) declares but does not implement (SURVEY.md §0):
a KQL front-end compiled onto the PySpark DataFrame API, with Catalyst as
the only optimizer and no storage layer of its own.

Entry points (SURVEY.md §3):
    kql(spark, text, sf_dir=...)   -> DataFrame   # KQL text
    Kql(spark, sf_dir=...).table('T').where(...)   # fluent builder
    kql_stream(spark, text, sf_dir=...)            # Structured Streaming
    Catalog(spark, base_dir)                       # table binding
    get_spark()                                    # configured session
"""

from .catalog import Catalog, fixture_catalog
from .fluent import Kql, KqlQuery
from .errors import KqlError, KqlSemanticError, KqlSyntaxError, KqlUnsupportedError
from .session import get_spark
from .sinks import read_table, write_bucketed, write_parquet
from .streaming import kql_stream, materialize_to_parquet, run_to_memory
from .translator import PipeTranslator, kql

__all__ = [
    "Catalog",
    "Kql",
    "KqlQuery",
    "KqlError",
    "KqlSemanticError",
    "KqlSyntaxError",
    "KqlUnsupportedError",
    "PipeTranslator",
    "fixture_catalog",
    "get_spark",
    "kql",
    "kql_stream",
    "read_table",
    "write_bucketed",
    "write_parquet",
    "materialize_to_parquet",
    "run_to_memory",
]

__version__ = "0.1.0"
