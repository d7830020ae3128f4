"""Fluent Python entry point (SURVEY.md §3.3).

A thin builder over the SAME AST/translator stack as `kql()`: each method
parses its KQL clause fragment immediately (syntax errors surface at the
call site, with the fragment in the message) and appends the typed operator
node; nothing executes until a DataFrame action.

    from kql_engine_spark import Kql
    df = (Kql(spark, sf_dir="/root/testdata/sf0.01")
          .table("events")
          .where("value > 50")
          .summarize("c = count(), av = avg(value) by event_type")
          .top("5 by c")
          .to_df())
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .ast_nodes import Join, Pipe, Query, TableRef
from .catalog import Catalog
from .parser import Parser
from .translator import PipeTranslator


class Kql:
    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str | None = None,
        catalog: Catalog | None = None,
    ):
        self.spark = spark
        self.catalog = catalog or Catalog(spark, sf_dir)

    def table(self, name: str) -> "KqlQuery":
        return KqlQuery(self, Pipe(TableRef(name)))

    def query(self, text: str) -> "KqlQuery":
        """Start from arbitrary KQL text (datatable/print/union/... sources)."""
        return KqlQuery(self, Parser(text).parse_pipe())


class KqlQuery:
    def __init__(self, ctx: Kql, pipe: Pipe):
        self._ctx = ctx
        self._pipe = pipe

    # ------------------------------------------------------------- operators
    def _op(self, clause: str) -> "KqlQuery":
        parser = Parser(clause)
        op = parser.parse_operator()
        return KqlQuery(self._ctx, Pipe(self._pipe.source, [*self._pipe.ops, op]))

    def pipe(self, clause: str) -> "KqlQuery":
        """Append any raw KQL operator clause, e.g. .pipe("mv-expand v = arr")."""
        return self._op(clause)

    def where(self, pred: str) -> "KqlQuery":
        return self._op(f"where {pred}")

    def project(self, items: str) -> "KqlQuery":
        return self._op(f"project {items}")

    def extend(self, items: str) -> "KqlQuery":
        return self._op(f"extend {items}")

    def summarize(self, clause: str) -> "KqlQuery":
        return self._op(f"summarize {clause}")

    def sort(self, keys: str) -> "KqlQuery":
        return self._op(f"sort by {keys}")

    def take(self, n: int) -> "KqlQuery":
        return self._op(f"take {int(n)}")

    def top(self, clause: str) -> "KqlQuery":
        return self._op(f"top {clause}")

    def distinct(self, cols: str = "*") -> "KqlQuery":
        return self._op(f"distinct {cols}")

    def evaluate(self, clause: str) -> "KqlQuery":
        return self._op(f"evaluate {clause}")

    def join(
        self,
        right: "KqlQuery | str",
        on: str,
        kind: str = "innerunique",
        **hints: str,
    ) -> "KqlQuery":
        right_pipe = (
            Pipe(TableRef(right)) if isinstance(right, str) else right._pipe
        )
        cond_parser = Parser(f"join kind={kind} (__t) on {on}")
        jop = cond_parser.parse_operator()
        assert isinstance(jop, Join)
        jop.right = right_pipe
        jop.hints.update(hints)
        return KqlQuery(self._ctx, Pipe(self._pipe.source, [*self._pipe.ops, jop]))

    # --------------------------------------------------------------- actions
    def to_df(self) -> DataFrame:
        tr = PipeTranslator(self._ctx.spark, self._ctx.catalog)
        return tr.translate_query(Query([], self._pipe))

    def collect(self):
        return self.to_df().collect()

    def explain(self, mode: str = "formatted") -> None:
        self.to_df().explain(mode)
