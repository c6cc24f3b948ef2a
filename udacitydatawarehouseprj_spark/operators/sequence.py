"""Row-pattern recognition (MATCH_RECOGNIZE-lite) — a pattern compiler
over per-partition event-symbol strings.

SQL:2016 MATCH_RECOGNIZE (reference point: the feature Spark lacks
natively; Flink/Trino ship it) has three parts: DEFINE (predicates that
classify each row into a symbol), PATTERN (a regular expression over
symbols, with quantifiers and PERMUTE), and per-partition ordered
evaluation. This module re-expresses all three Spark-first:

* DEFINE  → an ORDERED list of (symbol_name, Column predicate); each
  event takes the FIRST matching symbol's single-char code (a CASE
  chain — pure JVM codegen, no UDF), else the reserved default char.
* PATTERN → ``compile_pattern`` turns a spec string — symbol names
  with optional regex quantifiers (``?``, ``*``, ``+``, ``{m}``,
  ``{m,}``, ``{m,n}``), the wildcard ``.``, and ``PERMUTE(a b ...)``
  (all orderings, adjacent) — into a plain regex over the char
  alphabet. The output regex is engine-portable (chars + quantifiers +
  alternation only: no backreferences, no lookaround), so Java
  ``rlike`` and RE2-style engines agree.
* evaluation → one groupBy(partition) building the deterministic
  symbol string (sort_array over (order_cols, char) structs —
  collect_list alone is NON-deterministic), then one regex test per
  pattern. Cost: one shuffle of (partition, order, char) triples,
  bounded by events-per-partition string length.

Because the compiler is pure Python and deterministic, the SAME
compiled regex string can be injected into a SQL oracle
(``regexp_matches``) — the pattern layer itself is oracle-replayable.
"""

from __future__ import annotations

import itertools
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: char assigned to rows no DEFINE predicate claims (regex-safe)
DEFAULT_CHAR = "_"

_TOKEN = re.compile(
    r"^(?P<name>[A-Za-z_][A-Za-z0-9_]*|\.)"
    r"(?P<quant>[*+?]|\{\d+(?:,\d*)?\})?$"
)
_PERMUTE = re.compile(r"^PERMUTE\((?P<names>[^)]+)\)$")


def assign_chars(defs) -> dict[str, str]:
    """symbol name → single char, 'a'..'z' in DEFINE order (≤ 25
    symbols — the default char is reserved). Accepts (name, predicate)
    tuples or bare names, so char assignment (pure) can happen without
    building Column predicates (which need an active SparkContext)."""
    if len(defs) > 25:
        raise ValueError("at most 25 symbols supported")
    names = [d[0] if isinstance(d, tuple) else d for d in defs]
    return {name: chr(ord("a") + i) for i, name in enumerate(names)}


def symbol_expr(defs: list[tuple[str, Column]],
                chars: dict[str, str]) -> Column:
    """The DEFINE classifier: first matching predicate wins (CASE
    chain), else DEFAULT_CHAR."""
    if not defs:
        raise ValueError("at least one DEFINE symbol required")
    expr = None
    for name, pred in defs:
        expr = (F.when(pred, F.lit(chars[name])) if expr is None
                else expr.when(pred, F.lit(chars[name])))
    return expr.otherwise(F.lit(DEFAULT_CHAR))


def compile_pattern(spec: str, chars: dict[str, str]) -> str:
    """Compile a pattern spec to a portable regex.

    Spec grammar (whitespace-separated elements):
      element  := atom quant? | PERMUTE(name name ...)
      atom     := symbol-name | '.'
      quant    := '?' | '*' | '+' | '{m}' | '{m,}' | '{m,n}'

    PERMUTE expands to an alternation of every ordering of its symbols
    (adjacent, as in SQL:2016). Unknown symbol names raise — a spec
    typo must not silently compile to a never-matching regex.
    """
    # tokenize: PERMUTE(...) groups may contain spaces, so split on
    # whitespace OUTSIDE parentheses rather than naively
    raw_tokens = re.findall(r"PERMUTE\([^)]*\)|\S+", spec)
    if "".join(raw_tokens).replace(" ", "") != spec.replace(" ", ""):
        raise ValueError(f"unbalanced pattern spec: {spec!r}")
    parts: list[str] = []
    for raw in raw_tokens:
        m = _PERMUTE.match(raw)
        if m:
            names = m.group("names").replace(",", " ").split()
            for n in names:
                if n not in chars:
                    raise ValueError(f"unknown symbol in PERMUTE: {n!r}")
            alts = [
                "".join(chars[n] for n in perm)
                for perm in itertools.permutations(names)
            ]
            parts.append("(" + "|".join(alts) + ")")
            continue
        t = _TOKEN.match(raw)
        if not t:
            raise ValueError(f"bad pattern element: {raw!r}")
        name, quant = t.group("name"), t.group("quant") or ""
        if name == ".":
            parts.append("." + quant)
        else:
            if name not in chars:
                raise ValueError(f"unknown symbol: {name!r}")
            parts.append(chars[name] + quant)
    return "".join(parts)


def sequence_strings(
    events: DataFrame,
    partition_col: str,
    order_cols: tuple[str, ...],
    defs: list[tuple[str, Column]],
) -> DataFrame:
    """(partition_col, seq): the deterministic per-partition symbol
    string. Order is pinned by sort_array over (order_cols..., char)
    structs — the load-bearing step; collect_list order is undefined."""
    chars = assign_chars(defs)
    sym = symbol_expr(defs, chars)
    return (
        events.groupBy(partition_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                *order_cols, sym.alias("_c")
                            )
                        )
                    ),
                    lambda s: s["_c"],
                ),
                "",
            ).alias("seq")
        )
    )


def match_counts(
    events: DataFrame,
    partition_col: str,
    order_cols: tuple[str, ...],
    defs: list[tuple[str, Column]],
    patterns: dict[str, str],
) -> DataFrame:
    """One row: n_partitions plus, per named pattern spec, how many
    partitions' symbol strings match its compiled regex (unanchored,
    like MATCH_RECOGNIZE's per-partition search)."""
    chars = assign_chars(defs)
    seqs = sequence_strings(events, partition_col, order_cols, defs)
    aggs = [F.count("*").cast("long").alias("n_partitions")]
    for pname, spec in patterns.items():
        rx = compile_pattern(spec, chars)
        aggs.append(
            F.sum(F.col("seq").rlike(rx).cast("int")).cast("long")
            .alias(pname)
        )
    return seqs.agg(*aggs)
