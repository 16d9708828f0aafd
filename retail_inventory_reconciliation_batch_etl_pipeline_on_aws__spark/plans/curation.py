"""End-to-end LLM training-corpus curation DAG -- the composed form of
the curation query surface (SURVEY.md SS2.11): the individual
`queries()` entries prove each operator against an oracle; this module
proves they assemble into the production pipeline a 100 TB corpus
actually runs:

    raw documents
      -> exact dedup (sha256, lowest-id keeper)
      -> benchmark decontamination (hashed-shingle scan, anti-join)
      -> quality gate (integer-exact Gopher/C4 rules)
      -> PII scrub (JVM regex redaction)
      -> split + epoch-shuffle keys + shard assignment
      -> curated zone write, partitioned by split
    plus a per-document DISPOSITION LEDGER (doc_id -> kept/duplicate/
    contaminated/low_quality), written in the same pass.

Scale shape: every rejection signal becomes a FLAG COLUMN on one tagged
frame (left joins against ids-only frames + inline predicates), so the
corpus text is scanned once, the ledger and the curated write share
that tagged frame (persisted at the branch point), and no stage issues
its own count() -- stage attrition numbers ride the writes' own actions
via ``Observation``. The dedup keeper set and contamination id set are
ids-only shuffles; document text crosses no exchange before the final
partitioned write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import contamination_pairs, exact_dedup
from ..sources.writers import write_partitioned
from . import fixtures


def _quality_ok(text_col: str = "text"):
    """The integer-exact quality predicates shared with
    ``q_quality_flags`` (3*n <= sum_len style: no float ever enters a
    gate decision)."""
    from ..functions.text import tokens

    toks = tokens(text_col)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    len_ok = (n >= 15) & (n <= 60)
    wordlen_ok = (sum_len >= 3 * n) & (sum_len <= 8 * n)
    rep_ok = 2 * n_distinct >= n
    return len_ok & wordlen_ok & rep_ok


def _redact(col):
    """PII scrub (same dialect-portable patterns as ``q_pii_scan``)."""
    return F.regexp_replace(
        F.regexp_replace(col, F.lit(r"[a-z0-9]+@[a-z]+\.[a-z]+"), F.lit("<EMAIL>")),
        F.lit(r"555-[0-9]{4}"),
        F.lit("<PHONE>"),
    )


def disposition_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tagged corpus: every document with its curation disposition
    (``kept`` / ``duplicate`` / ``contaminated`` / ``low_quality``,
    first matching rule wins in that order) as a column -- the single
    frame both the ledger and the curated-zone write branch from, and
    the unit the ``curation_summary`` oracle attests value-level."""
    docs = fixtures.load(spark, sf_dir, "documents")
    benchmark = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)

    # ids-only rejection sets ------------------------------------------------
    keepers = exact_dedup(corpus).select("doc_id", "n_dups")
    contaminated = (
        contamination_pairs(corpus, benchmark, hash_shingles=True)
        .select(F.col("corpus_doc").alias("doc_id"))
        .distinct()
        .withColumn("_cont", F.lit(1))
    )

    # one tagged frame: every disposition signal as a column -----------------
    return (
        corpus.join(keepers.withColumn("_keep", F.lit(1)), "doc_id", "left")
        .join(contaminated, "doc_id", "left")
        .withColumn("_quality_ok", _quality_ok("text"))
        .withColumn(
            "disposition",
            F.when(F.col("_keep").isNull(), F.lit("duplicate"))
            .when(F.col("_cont") == 1, F.lit("contaminated"))
            .when(~F.col("_quality_ok"), F.lit("low_quality"))
            .otherwise(F.lit("kept")),
        )
    )


def run_curation_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    seed: int = 0,
    n_shards: int = 8,
) -> dict:
    """Run the curation DAG; returns paths + single-pass metrics.

    Returns ``{"curated": path, "ledger": path, "metrics": {...}}``
    where metrics carries kept/duplicate/contaminated/low_quality row
    counts (from the ledger write's Observation) and per-split counts
    (from the curated write's Observation).
    """
    tagged = disposition_frame(spark, sf_dir).persist()

    ledger_obs = Observation("curation_ledger")
    ledger = tagged.select("doc_id", "disposition").observe(
        ledger_obs,
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("disposition") == "kept", 1).otherwise(0))
        .cast("long")
        .alias("kept"),
        F.sum(F.when(F.col("disposition") == "duplicate", 1).otherwise(0))
        .cast("long")
        .alias("duplicate"),
        F.sum(F.when(F.col("disposition") == "contaminated", 1).otherwise(0))
        .cast("long")
        .alias("contaminated"),
        F.sum(F.when(F.col("disposition") == "low_quality", 1).otherwise(0))
        .cast("long")
        .alias("low_quality"),
    )
    ledger_path = f"{out_root}/curation/ledger"
    write_partitioned(ledger, ledger_path, "disposition", "doc_id")

    # curated corpus: scrub, split, shuffle keys, shard ----------------------
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    order_key = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("doc_id").cast("string"), F.lit(str(seed))
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
    ).cast("long")
    curated = (
        tagged.where(F.col("disposition") == "kept")
        .select(
            "doc_id",
            _redact(F.col("text")).alias("text"),
            "lang",
            "source",
            "n_chars",
            F.when(bucket < 8, F.lit("train"))
            .when(bucket == 8, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
            order_key.alias("order_key"),
            (order_key % n_shards).cast("int").alias("shard"),
        )
    )
    cur_obs = Observation("curated_corpus")
    curated = curated.observe(
        cur_obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long")
        .alias("train"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0))
        .cast("long")
        .alias("val"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
        .cast("long")
        .alias("test"),
    )
    curated_path = f"{out_root}/curation/curated"
    write_partitioned(curated, curated_path, "split", ["shard", "order_key"])

    metrics = {"ledger": ledger_obs.get, "curated": cur_obs.get}
    tagged.unpersist()
    return {"curated": curated_path, "ledger": ledger_path, "metrics": metrics}
