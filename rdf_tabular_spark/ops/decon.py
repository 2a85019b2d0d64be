"""Train/test decontamination: flag training documents sharing word
n-grams with an evaluation set.

The standard pre-training hygiene pass (n-gram overlap decontamination):
every training document that contains any n-gram of any benchmark/test
document is flagged (and typically dropped or split-audited).

Scale shape — the test side is always small (benchmark suites are
thousands of documents, the train side is the 100 TB corpus):

- the test set's distinct n-gram hashes are BROADCAST, so the train side
  is a map-side semi-join: one scan, no shuffle of the corpus;
- the only shuffle is the final per-doc hit count over the (tiny)
  matching subset;
- hashes are md5 (8-byte prefix would do) so the broadcast stays narrow
  and the DuckDB oracle computes identical values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalize_text


def ngram_hash_set(df: DataFrame, n: int, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(id, gram) rows: md5 of each word n-gram of the normalized text.
    Documents shorter than *n* tokens yield no grams."""
    staged = df.select(
        F.col(id_col),
        F.split(normalize_text(F.col(text_col)), " ").alias("_toks"))
    toks = F.col("_toks")
    idx = F.when(
        F.size(toks) >= n,
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx, lambda i: F.md5(F.array_join(F.slice(toks, i, n), " ")))
    return staged.select(
        id_col, F.explode(grams).alias("gram"))


def contaminated_docs(train: DataFrame, test: DataFrame, n: int = 8,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per contaminated training doc: how many distinct test n-grams it
    contains. Clean docs are absent (anti-join the result to drop)."""
    test_grams = ngram_hash_set(test, n, text_col, id_col) \
        .select("gram").distinct()
    hits = ngram_hash_set(train, n, text_col, id_col).join(
        F.broadcast(test_grams), "gram")
    return (hits.groupBy(id_col)
            .agg(F.count_distinct("gram").alias("n_test_ngrams"))
            .select(id_col, F.col("n_test_ngrams").cast("long")))
