"""r07-advice regression: short-document / singleton-stratum guards.

Spark's ``sequence(a, b)`` STEPS DOWN when a > b, so in-row gram /
bigram builds that index ``sequence(1, n-2)`` or ``sequence(2, n)``
crash on 1-2-word documents (``slice(w, 0, 3)`` / ``element_at(w, 0)``
raise), while the DuckDB oracles' ``range()`` is simply empty there —
a latent engine divergence the >=10-word fixtures masked.  Likewise a
singleton stratum made the Neyman weight 0/0 -> NaN, whose BIGINT cast
Spark turns into NULL and DuckDB into a hard error.  This suite runs
the guarded plans AND their oracles over a crafted corpus of 1-, 2-,
3- and many-word documents with a singleton-language stratum, and
asserts engine agreement (the same gate the driver applies).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from kinesis_s3_data_shipper_spark.plans import REGISTRY, all_queries

from .oracle_harness import compare

all_queries()

#: (doc_id, text, lang) — 1-word, 2-word and 3-word docs exercise the
#: descending-sequence branches; lang "sg" has exactly ONE document
#: (the Neyman singleton stratum); "en" carries enough docs that the
#: novelty / bigram outputs are non-trivial.
_DOCS = [
    (1, "one", "sg"),
    (2, "two words", "en"),
    (3, "three little words", "en"),
    (4, "the quick brown fox jumps over the lazy dog again", "en"),
    (5, "the quick brown fox naps under the lazy dog again", "en"),
    (6, "completely different content with many novel tokens here", "en"),
    (7, "x", "en"),
    (8, "y z", "de"),
    (9, "three more short words", "de"),
]

_GUARDED = ["text_ngram_novelty", "text_kneser_ney_counts",
            "sample_stratified_neyman"]


@pytest.fixture(scope="module")
def short_doc_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("short_docs")
    df = spark.createDataFrame(
        [(i, t, lang, "web", len(t)) for i, t, lang in _DOCS],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    (df.coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(str(d), "documents.parquet")))
    return str(d)


@pytest.mark.parametrize("name", _GUARDED)
def test_guarded_plan_matches_oracle_on_short_docs(
        spark, short_doc_sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, short_doc_sf_dir)
    con = duckdb.connect()
    path = os.path.join(short_doc_sf_dir, "documents.parquet",
                        "*.parquet")
    con.sql(f"CREATE VIEW documents AS"
            f" SELECT * FROM read_parquet('{path}')")
    want = con.sql(spec.oracle).df()
    compare(sdf, want, name)


def test_singleton_stratum_weight_is_zero(spark, short_doc_sf_dir):
    # The singleton lang must survive with an explicit 0 weight (not a
    # NaN-cast NULL that silently drops the stratum from allocation).
    out = (REGISTRY["sample_stratified_neyman"]
           .spark(spark, short_doc_sf_dir))
    langs = {r.lang for r in out.collect()}
    # every multi-doc stratum still draws; the singleton draws only if
    # a largest-remainder unit reached it — but the query must not
    # error and must keep 'en'/'de' quotas intact.
    assert {"en", "de"} <= langs


@pytest.fixture(scope="module")
def all_singleton_sf_dir(spark, tmp_path_factory):
    # Every stratum has exactly one document: every Neyman weight is 0,
    # so tw = 0 — the divisor the r08 advice flagged as
    # engine-divergent (Spark NULL vs DuckDB divide-by-zero error).
    d = tmp_path_factory.mktemp("singleton_docs")
    rows = [(i, f"doc {i}", f"l{i}", "web", 10) for i in range(1, 6)]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    (df.coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(str(d), "documents.parquet")))
    return str(d)


def test_all_singleton_corpus_degrades_identically(
        spark, all_singleton_sf_dir):
    # tw = 0 must short-circuit to a zero allocation on BOTH engines
    # (empty sample), not NULL-vs-error divergence.
    spec = REGISTRY["sample_stratified_neyman"]
    sdf = spec.spark(spark, all_singleton_sf_dir)
    con = duckdb.connect()
    path = os.path.join(all_singleton_sf_dir, "documents.parquet",
                        "*.parquet")
    con.sql(f"CREATE VIEW documents AS"
            f" SELECT * FROM read_parquet('{path}')")
    want = con.sql(spec.oracle).df()
    assert len(want) == 0
    compare(sdf, want, "sample_stratified_neyman[all-singleton]")
