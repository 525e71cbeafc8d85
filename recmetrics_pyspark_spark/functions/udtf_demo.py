"""Python UDTF escape hatch (Spark 4): table functions for logic that
genuinely can't be an expression or an explode.

This module exists to document the pattern, not to be the hot path —
the equivalent `explode(split(...))` is JVM-side and ~10-100x cheaper
(tests assert result equivalence against that formulation). Reach for a
UDTF only when per-row expansion needs real Python (a parser, an
external library) — and even then batch work inside eval where
possible.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="token: string, pos: int")
class TokenizeUDTF:
    """Lateral-join tokenizer: one output row per whitespace token with
    its position. Usage::

        TokenizeUDTF(lit(text)) -- or via spark.udtf.register + SQL:
        SELECT d.doc_id, t.token, t.pos
        FROM documents d, LATERAL tokenize(d.text) t
    """

    def eval(self, text: str):  # noqa: D102 - contract defined by Spark
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield tok, i


def register(spark, name: str = "tokenize"):
    spark.udtf.register(name, TokenizeUDTF)
    return name
