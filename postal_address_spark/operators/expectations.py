"""Declarative data-quality expectations (the Deequ / Great Expectations
job shape).

A production linkage or curation pipeline does not want to DISCOVER that
an upstream feed silently dropped `postal_code`, started emitting garbage
country codes, or duplicated its key — it wants a declarative check suite
evaluated on every run, emitted as a small report table the orchestrator
gates on (Deequ's VerificationSuite; the reference has no dataflow at all,
so this is engine-native surface like profiling.py, which answers "what IS
in this column" where this module answers "is it what we REQUIRED").

Check kinds (each one row in the report):

* ``not_null``      — violation: value IS NULL
* ``in_set``        — violation: NULL or value not in the allowed set
* ``matches``       — violation: NULL or regexp not found in the value
                      (anchor the pattern for full-match semantics)
* ``len_between``   — violation: NULL or char length outside [lo, hi]
* ``between``       — violation: NULL or numeric value outside [lo, hi]
* ``unique``        — violation rows: every row whose value occurs more
                      than once (all copies count; NULL is a value)

Thresholds are RATIONAL (``min_pass_num``/``min_pass_den``): a check
passes iff ``n_ok * den >= num * n_rows`` — integer cross-multiplication,
never a float ratio, so the pass/fail bit is exactly replayable in any
engine (the corpus.py quality-gate discipline).  The default 1/1 means
"every row".

Scale shape: ALL row-level checks evaluate in ONE full-scan aggregation
(conditional sums — map-side combined, no shuffle of data rows; the
1-row result is exploded to report rows driver-free via ``inline``), and
ALL uniqueness checks share ONE ``stack`` melt + one (check, value)
shuffle with map-side combine (the profiling.py pattern — never one job
per column).  Nothing here materializes values beyond the per-check
tallies, so the report cost is a scan plus a vocabulary-bounded shuffle
at any corpus size.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_COLUMNS = (
    "check_name", "column", "kind", "n_rows", "n_violations", "passed"
)


@dataclass(frozen=True)
class Check:
    """One declarative expectation over one column.

    ``values`` (in_set), ``pattern`` (matches), ``lo``/``hi``
    (len_between / between) parameterize the kind; ``min_pass_num`` /
    ``min_pass_den`` set the rational pass threshold (default: all rows).
    """

    name: str
    column: str
    kind: str
    values: Tuple[str, ...] = ()
    pattern: Optional[str] = None
    lo: Optional[float] = None
    hi: Optional[float] = None
    min_pass_num: int = 1
    min_pass_den: int = 1

    def __post_init__(self):
        import re

        kinds = ("not_null", "in_set", "matches", "len_between", "between",
                 "unique")
        if self.kind not in kinds:
            raise ValueError(f"unknown check kind {self.kind!r}")
        # name/column are interpolated into selectExpr(stack(...)) and the
        # generated oracle SQL — reject anything that would need quoting
        # AT CONSTRUCTION, not at run time deep inside a plan
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", self.column):
            raise ValueError(
                f"{self.name}: column {self.column!r} must be a plain "
                "identifier ([A-Za-z_][A-Za-z0-9_]*)"
            )
        if "'" in self.name or "\n" in self.name or "\r" in self.name:
            raise ValueError(
                f"check name {self.name!r} must not contain quotes or "
                "newlines"
            )
        if self.kind == "in_set" and not self.values:
            raise ValueError(f"{self.name}: in_set needs values")
        if self.kind == "in_set" and not all(
            isinstance(v, str) for v in self.values
        ):
            # fail loud: a numeric value set would ride as quoted strings
            # in the generated oracle and lean on engine-specific
            # coercion in Spark — compare numeric domains via `between`,
            # or pass the values as strings against a string column
            raise ValueError(f"{self.name}: in_set values must be strings")
        if self.kind == "matches" and not self.pattern:
            raise ValueError(f"{self.name}: matches needs a pattern")
        if self.kind in ("len_between", "between") and (
            self.lo is None or self.hi is None
        ):
            raise ValueError(f"{self.name}: {self.kind} needs lo and hi")
        if not (0 <= self.min_pass_num <= self.min_pass_den) or (
            self.min_pass_den <= 0
        ):
            raise ValueError(f"{self.name}: bad threshold")

    # -- Spark-side violation predicate (row-level kinds only) ---------
    def violation_col(self) -> Column:
        c = F.col(self.column)
        if self.kind == "not_null":
            return c.isNull()
        if self.kind == "in_set":
            return c.isNull() | ~c.isin(*self.values)
        if self.kind == "matches":
            return c.isNull() | ~c.rlike(self.pattern)
        if self.kind == "len_between":
            ln = F.length(c)
            return c.isNull() | (ln < F.lit(int(self.lo))) | (
                ln > F.lit(int(self.hi))
            )
        if self.kind == "between":
            return c.isNull() | (c < F.lit(self.lo)) | (c > F.lit(self.hi))
        raise ValueError(f"{self.kind} is not a row-level check")

    # -- oracle-side violation predicate (same spec, SQL dialect) ------
    def violation_sql(self) -> str:
        c = self.column
        if self.kind == "not_null":
            return f"{c} IS NULL"
        if self.kind == "in_set":
            vals = ", ".join("'" + v.replace("'", "''") + "'"
                             for v in self.values)
            return f"({c} IS NULL OR {c} NOT IN ({vals}))"
        if self.kind == "matches":
            pat = self.pattern.replace("'", "''")
            return f"({c} IS NULL OR NOT regexp_matches({c}, '{pat}'))"
        if self.kind == "len_between":
            return (
                f"({c} IS NULL OR length({c}) < {int(self.lo)}"
                f" OR length({c}) > {int(self.hi)})"
            )
        if self.kind == "between":
            return f"({c} IS NULL OR {c} < {self.lo} OR {c} > {self.hi})"
        raise ValueError(f"{self.kind} is not a row-level check")


def expect(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Evaluate the suite -> report frame
    (check_name, column, kind, n_rows, n_violations, passed).

    One conditional-aggregation scan for every row-level check + one
    shared melt/count pass for every ``unique`` check (module docstring);
    ``passed`` is decided by integer cross-multiplication against the
    check's rational threshold.
    """
    if not checks:
        raise ValueError("expect() needs at least one Check")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError("check names must be unique")
    row_checks = [c for c in checks if c.kind != "unique"]
    uniq_checks = [c for c in checks if c.kind == "unique"]

    parts = []
    if row_checks:
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.sum(chk.violation_col().cast("long")).alias(f"__v{i}")
            for i, chk in enumerate(row_checks)
        ]
        one = df.agg(*aggs)
        # 1-row frame -> one report row per check via inline (no shuffle,
        # no driver collect)
        entries = F.array(*[
            F.struct(
                F.lit(chk.name).alias("check_name"),
                F.lit(chk.column).alias("column"),
                F.lit(chk.kind).alias("kind"),
                F.col("__n").alias("n_rows"),
                F.coalesce(F.col(f"__v{i}"), F.lit(0)).alias("n_violations"),
                (
                    (F.col("__n") - F.coalesce(F.col(f"__v{i}"), F.lit(0)))
                    * F.lit(chk.min_pass_den)
                    >= F.lit(chk.min_pass_num) * F.col("__n")
                ).alias("passed"),
            )
            for i, chk in enumerate(row_checks)
        ])
        parts.append(one.select(F.inline(entries)))

    if uniq_checks:
        # one melt covering every unique-check column: values ride as
        # strings (report tallies only — cast is total and deterministic)
        k = len(uniq_checks)
        stack_args = ", ".join(
            f"'{chk.name}', CAST({chk.column} AS STRING)"
            for chk in uniq_checks
        )
        cells = (
            df.selectExpr(f"stack({k}, {stack_args}) AS (__chk, __val)")
            .groupBy("__chk", "__val")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .groupBy("__chk")
            .agg(
                F.sum("__cnt").alias("n_rows"),
                F.sum(
                    F.when(F.col("__cnt") > 1, F.col("__cnt")).otherwise(0)
                ).alias("n_violations"),
            )
        )
        meta = [
            (chk.name, chk.column, chk.kind, chk.min_pass_num,
             chk.min_pass_den)
            for chk in uniq_checks
        ]
        meta_df = cells.sparkSession.createDataFrame(
            meta,
            "__chk string, column string, kind string,"
            " __num long, __den long",
        )
        # meta LEFT-joins the tallies so an empty input still reports
        # every check (0 rows, 0 violations, passed)
        parts.append(
            meta_df.join(cells, "__chk", "left")
            .select(
                F.col("__chk").alias("check_name"),
                "column",
                "kind",
                F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
                F.coalesce(F.col("n_violations"), F.lit(0)).alias(
                    "n_violations"
                ),
                (
                    (
                        F.coalesce(F.col("n_rows"), F.lit(0))
                        - F.coalesce(F.col("n_violations"), F.lit(0))
                    )
                    * F.col("__den")
                    >= F.col("__num") * F.coalesce(F.col("n_rows"), F.lit(0))
                ).alias("passed"),
            )
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def checks_from_spec(spec: Sequence[dict]) -> list:
    """Parse a JSON-loaded list of Check kwargs dicts (the jobs' --expect
    file format) into Check objects; ``values`` lists become tuples."""
    return [
        Check(**{k: tuple(v) if k == "values" else v for k, v in c.items()})
        for c in spec
    ]


def run_expectation_gate(
    spark,
    df: DataFrame,
    spec_path: str,
    report_path: str,
    fail_hard: bool = False,
) -> dict:
    """The deploy-job gate (jobs/curate.py --expect, jobs/link.py
    --expect): evaluate the JSON check suite on ``df``, write the report
    table, and return {check_name: {passed, n_rows, n_violations}}.
    With ``fail_hard`` a failing check raises SystemExit(3) — the
    orchestrator contract — after printing the report JSON."""
    import json

    from ..sources.io import read_table, write_table

    with open(spec_path) as fh:
        spec = json.load(fh)
    report = expect(df, checks_from_spec(spec))
    write_table(report, report_path)
    # read back through the same ref-aware router as the write — a report
    # ref that resolves to an iceberg catalog table would otherwise crash
    # the gate on read-back instead of gating
    results = {
        r["check_name"]: {
            "passed": bool(r["passed"]),
            "n_rows": int(r["n_rows"]),
            "n_violations": int(r["n_violations"]),
        }
        for r in read_table(spark, report_path).collect()
    }
    if fail_hard and not all(v["passed"] for v in results.values()):
        print(json.dumps({
            "aborted": "expectation_failure",
            "expectations": results,
        }))
        raise SystemExit(3)
    return results


def expectations_oracle_sql(table: str, checks: Sequence[Check]) -> str:
    """DuckDB replay of ``expect`` GENERATED from the same Check specs
    (the fs_em COMPARISONS discipline: one source of truth, two
    dialects).  Row-level checks become conditional sums over one scan;
    unique checks count all copies of repeated values (NULL is a value —
    DuckDB GROUP BY groups NULLs like Spark).  ``passed`` replays the
    integer cross-multiplication."""
    arms = []
    for chk in checks:
        nm = chk.name.replace("'", "''")
        col = chk.column.replace("'", "''")
        if chk.kind == "unique":
            arms.append(f"""
    SELECT '{nm}' AS check_name, '{col}' AS "column",
           'unique' AS kind,
           CAST(coalesce(SUM(cnt), 0) AS BIGINT) AS n_rows,
           CAST(coalesce(SUM(CASE WHEN cnt > 1 THEN cnt END), 0) AS BIGINT)
             AS n_violations,
           (coalesce(SUM(cnt), 0)
              - coalesce(SUM(CASE WHEN cnt > 1 THEN cnt END), 0))
             * {chk.min_pass_den}
             >= {chk.min_pass_num} * coalesce(SUM(cnt), 0) AS passed
    FROM (
      SELECT COUNT(*) AS cnt FROM {table}
      GROUP BY CAST({chk.column} AS VARCHAR)
    )""")
        else:
            arms.append(f"""
    SELECT '{nm}' AS check_name, '{col}' AS "column",
           '{chk.kind}' AS kind,
           COUNT(*) AS n_rows,
           CAST(coalesce(
             SUM(CASE WHEN {chk.violation_sql()} THEN 1 END), 0) AS BIGINT)
             AS n_violations,
           (COUNT(*) - coalesce(
              SUM(CASE WHEN {chk.violation_sql()} THEN 1 END), 0))
             * {chk.min_pass_den}
             >= {chk.min_pass_num} * COUNT(*) AS passed
    FROM {table}""")
    return "\n    UNION ALL\n".join(arms)
