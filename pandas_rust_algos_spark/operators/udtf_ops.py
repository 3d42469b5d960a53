"""Python UDTFs (Spark 4) — the user-defined TABLE function face.

The reference exposes only scalar kernels (its 23 ``#[pyfunction]``
bindings in ``/root/reference/src/lib.rs`` all map arrays to arrays);
an engine a pipeline team actually adopts also needs row→rows
expansion with imperative logic. Spark 4's ``@udtf`` covers that: a
Python class whose ``eval`` yields output rows, callable from SQL as a
table function and composable with ``LATERAL`` — the escape hatch for
semantics ``explode``/``posexplode`` over expression-built arrays
cannot state naturally.

Scale position — read before adding a UDTF: this is the SLOW path.
A UDTF runs Python per input row (Arrow-batched transfer with
``useArrow=True``, but still interpreter-bound row iteration), so
anything expressible as an expression DAG belongs in
``operators/scrub.py``-style column algebra instead. The example here,
PII *span* extraction, earns its place: it returns character offsets
for span-level masking audits, and match offsets are not reachable
from Spark's regexp builtins (``regexp_extract_all`` returns text
only, ``regexp_instr`` only the first hit). The count/redact fast
path for the same patterns stays expression-only in ``scrub.py``.

The regexes reuse ``scrub.PII_PATTERNS`` verbatim; the subset used
(character classes, ``\\b``, ``\\d``, bounded repetition) behaves
identically under Python's ``re``, Java regex, and RE2 — so the
UDTF's hits are bit-comparable with both the expression path and a
DuckDB oracle.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

from pandas_rust_algos_spark.operators.scrub import PII_PATTERNS

__all__ = ["PIISpans", "register_udtfs"]

_COMPILED = tuple((kind, re.compile(pat)) for kind, pat, _ in PII_PATTERNS)


@udtf(returnType="kind string, hit string, start int, end int",
      useArrow=True)
class PIISpans:
    """One output row per PII match in the input text: the pattern
    kind, the matched text, and [start, end) character offsets.
    Matches are emitted in (pattern, position) order — deterministic
    for a given input. NULL input yields no rows (LATERAL drops the
    row; use LEFT LATERAL to keep it)."""

    def eval(self, text):  # noqa: D102 — contract in class docstring
        if text is None:
            return
        for kind, pat in _COMPILED:
            for m in pat.finditer(text):
                yield kind, m.group(0), m.start(), m.end()


def register_udtfs(spark) -> None:
    """Idempotently register every UDTF with a session (SQL name =
    snake_case class name), enabling ``..., LATERAL pii_spans(col)``."""
    spark.udtf.register("pii_spans", PIISpans)
