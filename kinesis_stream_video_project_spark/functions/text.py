"""Text-analysis column functions for the documents table (O-23, O-31).

Everything here is built-in-expression based (split/transform/aggregate) so
the hot path never crosses into Python; the pandas-UDF variants used for
showcase/benchmark comparison live in operators/udfs.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic "BPE-ish" word/number token pattern used by the regex token
# counter — chosen to behave identically under Java and RE2-style engines.
BPE_ISH_PATTERN = "[a-z]+|[0-9]+"

# Fixed English stopword list for quality scoring; small on purpose — the
# fixture vocabulary is a synthetic word soup.
STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (the documents fixture is single-space
    separated word soup)."""
    return F.split(text, " ")


def distinct_tokens(text: Column | str) -> Column:
    return F.array_distinct(tokens(text))


def n_tokens(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def n_unique_tokens(text: Column | str) -> Column:
    return F.size(distinct_tokens(text)).cast("long")


def avg_token_len(text: Column | str) -> Column:
    """Mean token length as double (total chars in tokens / token count)."""
    total = F.aggregate(
        F.transform(tokens(text), lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return total / F.size(tokens(text)).cast("double")


def stopword_ratio(text: Column | str) -> Column:
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(
        F.filter(tokens(text), lambda t: F.array_contains(stop_arr, t))
    )
    return n_stop.cast("double") / F.size(tokens(text)).cast("double")


def type_token_ratio(text: Column | str) -> Column:
    """Lexical diversity: unique tokens / total tokens."""
    return n_unique_tokens(text).cast("double") / n_tokens(text).cast("double")


def quality_score(text: Column | str, n_chars: Column | str) -> Column:
    """Composite document-quality score in [0, 1]:
    length component (saturating at 400 chars), lexical diversity, and a
    stopword-balance component. Pure arithmetic — oracle-expressible."""
    length_score = F.least(F.col(n_chars) if isinstance(n_chars, str) else n_chars, F.lit(400)) / F.lit(400.0)
    diversity = type_token_ratio(text)
    stop_balance = 1.0 - F.abs(stopword_ratio(text) - 0.1)
    return (length_score + diversity + stop_balance) / 3.0

