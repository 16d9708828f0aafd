"""Model-based text classification trained in-engine: per-class unigram
LMs scored by mean token probability -- the CCNet/DSIR-style domain /
provenance / quality classifier a training-data pipeline uses to build
mixtures, re-expressed as pure DataFrame algebra.

Why not log-space Naive Bayes: a sum of ``log p(t|c)`` doubles is
addition-order-dependent and 1-ulp-unstable across engines (the
``token_dist_drift`` rule), so the driver's bit-exact oracle compare
would flake. Instead each class LM is quantized to a fixed-point
integer weight

    w(t, c) = (cnt(t, c) + 1) * SCALE  div  (tot_c + V)

(Laplace-smoothed, exact IntegralDivide), and a document's class score
is the exact integer sum ``sum_t tf(t) * w(t, c)``; argmax with a
lexicographic tie-break is then engine-stable bit-for-bit. The
quantization IS the model definition -- a fixed-point class LM -- not
an approximation of a float model (at SCALE = 2^40 the quantization
error per token is < 1e-12 of the probability mass, far below the
smoothing floor).

Scale shape for a 100 TB corpus:
- tokens fold to ``xxhash64`` BEFORE the first exchange -- document
  text never crosses a shuffle (a string-side oracle makes a fold
  collision fail the value hash rather than pass silently);
- the (token, class) count table is SPARSE: zero-count cells never
  materialize; unseen-token mass enters through the per-doc baseline
  ``n_tokens * w0(c)``, never a |V| x |classes| densification;
- per-class constants are a |classes|-row broadcast; the class-name
  list is the sanctioned bounded driver scalar (like IVF centroids);
- the only wide shuffles are the tf build and the token-hash score
  join; the argmax window partitions by document id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

DEFAULT_SCALE = 1 << 40  # w(t,c) <= SCALE always fits int64


def class_lm_predictions(
    docs: DataFrame,
    *,
    label_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    train_flag: Column | str = "is_train",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Train fixed-point class LMs on the rows where ``train_flag`` is
    true and classify the rest. Returns one row per held-out document:
    ``(id_col, label_col, predicted)``.

    ``train_flag`` must be a deterministic function of stable row
    attributes (hash-bucket splits, date cutoffs) -- never of row
    order -- so re-runs and backfills classify identically.
    """
    flag = F.col(train_flag) if isinstance(train_flag, str) else train_flag
    labeled = docs.select(
        F.col(id_col), F.col(label_col), flag.alias("_train")
    )
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("_t"))
        .select(id_col, F.xxhash64("_t").alias("_h"))
        .groupBy(id_col, "_h")
        .agg(F.count("*").alias("_tf"))
        .join(labeled, id_col)
        .persist()  # shared by the class-count build and the scoring join
    )
    cnt = (
        tf.where(F.col("_train"))
        .groupBy("_h", F.col(label_col).alias("_cls"))
        .agg(F.sum("_tf").alias("_cnt"))
        .persist()  # sparse (token, class) training counts
    )
    vocab = cnt.agg(F.countDistinct("_h").alias("_v"))  # 1 row, tree-reduced
    # the class universe is every label seen in TRAINING -- a class
    # whose docs happen to be token-empty still exists (its Laplace-
    # smoothed LM is uniform), it must not vanish just because the
    # sparse count table has no rows for it
    train_labels = (
        labeled.where(F.col("_train"))
        .select(F.col(label_col).alias("_cls"))
        .distinct()
    )
    consts = (
        train_labels.join(
            cnt.groupBy("_cls").agg(F.sum("_cnt").alias("_tot")),
            "_cls",
            "left",
        )
        .na.fill({"_tot": 0})
        .crossJoin(F.broadcast(vocab))  # sanctioned 1-row scalar gate
        .select(
            "_cls",
            (F.col("_tot") + F.col("_v")).cast("decimal(38,0)").alias("_den"),
        )
        .withColumn(
            "_w0",
            # den = 0 only when NO training doc anywhere has a token
            # (V = 0): every LM is vacuous, score 0, lexicographic
            # first class wins -- defined rather than a divide-by-null
            F.when(
                F.col("_den") > 0,
                F.call_function(
                    "div", F.lit(scale).cast("decimal(38,0)"), F.col("_den")
                ),
            ).otherwise(F.lit(0)),
        )
        .persist()  # |classes| rows
    )
    # delta weight above the smoothing floor -- zero-count (token,
    # class) cells never materialize
    wd = cnt.join(F.broadcast(consts), "_cls").select(
        "_h",
        "_cls",
        (
            F.call_function(
                "div",
                (F.col("_cnt") + 1).cast("decimal(38,0)") * F.lit(scale),
                F.col("_den"),
            )
            - F.col("_w0")
        ).alias("_wd"),
    )
    # bounded driver scalar: one class name per training class
    classes = [r["_cls"] for r in consts.select("_cls").orderBy("_cls").collect()]
    test_docs = (
        labeled.where(~F.col("_train"))
        .join(
            tf.groupBy(id_col).agg(F.sum("_tf").alias("_n_tok")),
            id_col,
            "left",
        )
        .na.fill({"_n_tok": 0})  # empty docs still get classified
    )
    grid = test_docs.select(
        id_col,
        label_col,
        "_n_tok",
        F.explode(F.array(*[F.lit(c) for c in classes])).alias("_cls"),
    ).join(F.broadcast(consts.select("_cls", "_w0")), "_cls")
    partial = (
        tf.where(~F.col("_train"))
        .join(wd, "_h")
        .groupBy(id_col, "_cls")
        .agg(F.sum(F.col("_tf") * F.col("_wd")).alias("_part"))
    )
    win = Window.partitionBy(id_col).orderBy(
        F.col("_score").desc(), F.col("_cls").asc()
    )
    return (
        grid.join(partial, [id_col, "_cls"], "left")
        .na.fill({"_part": 0})
        .select(
            id_col,
            label_col,
            "_cls",
            (F.col("_n_tok") * F.col("_w0") + F.col("_part")).alias("_score"),
        )
        .withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") == 1)
        .select(id_col, label_col, F.col("_cls").alias("predicted"))
    )
