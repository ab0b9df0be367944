"""Text-analysis column functions: tokenization, shingling, fingerprints.

Everything is a Column expression (split / transform / sequence /
element_at / md5) so whole-stage codegen applies; the same algebra is
re-expressible in ANSI SQL, which is what keeps these operators
oracle-verifiable cross-engine.

Determinism: hashes are md5 hex strings (identical in every engine);
"min over hashes" compares lexicographically on ASCII hex, which is
engine-independent. No engine-specific hash() anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text_col: str = "text") -> Column:
    """Whitespace tokens. Corpus text is single-space separated; split on
    the literal space keeps Spark/DuckDB/ANSI behavior identical."""
    return F.split(F.col(text_col), " ")


def bigrams(words_col: str = "words") -> Column:
    """Adjacent word pairs joined by a space; empty for 1-word docs.

    Guarded: Spark's ``sequence(1, 0)`` yields a *descending* [1, 0]
    rather than an empty array, so short docs must be special-cased.
    """
    return F.expr(
        f"""case when size({words_col}) < 2 then array()
        else transform(sequence(1, size({words_col}) - 1),
             i -> concat_ws(' ', element_at({words_col}, i),
                            element_at({words_col}, i + 1))) end"""
    )


def word_shingles(words_col: str = "words", k: int = 3) -> Column:
    """Word k-shingles (k consecutive words joined by spaces), the MinHash
    input unit. Empty array for docs shorter than k words."""
    parts = ", ".join(f"element_at({words_col}, i + {j})" for j in range(k))
    return F.expr(
        f"""case when size({words_col}) < {k} then array()
        else transform(sequence(1, size({words_col}) - {k} + 1),
             i -> concat_ws(' ', {parts})) end"""
    )


def doc_fingerprint(text_col: str = "text") -> Column:
    """Exact-dedup fingerprint: md5 of the lowercased text."""
    return F.md5(F.lower(F.col(text_col)))


def winnow_fingerprint(words_col: str = "words", window: int = 5) -> Column:
    """Rolling-hash document fingerprint (winnowing-lite): the minimum
    md5 over all ``window``-gram windows of the doc."""
    parts = ", ".join(f"element_at({words_col}, i + {j})" for j in range(window))
    return F.expr(
        f"""case when size({words_col}) < {window} then md5(concat_ws(' ', {words_col}))
        else array_min(transform(sequence(1, size({words_col}) - {window} + 1),
             i -> md5(concat_ws(' ', {parts})))) end"""
    )


#: tiny deterministic stopword list shared with oracles
STOPWORDS = ("the", "a", "of", "and", "to")


def stopword_count(words_col: str = "words") -> Column:
    inlist = ", ".join(f"'{w}'" for w in STOPWORDS)
    return F.expr(
        f"size(filter({words_col}, w -> w in ({inlist})))"
    ).cast("bigint")
