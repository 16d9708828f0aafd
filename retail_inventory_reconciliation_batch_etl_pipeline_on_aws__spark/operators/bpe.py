"""Distributed BPE merge learning (Sennrich et al. 2016, the public
byte-pair-encoding recipe) -- the tokenizer-training step of an LLM data
pipeline, expressed Spark-first.

The classic algorithm trains on the WORD-FREQUENCY table, not the raw
corpus: the corpus is scanned ONCE into (word, freq), and every merge
iteration then works on |vocab| rows -- orders of magnitude smaller than
the corpus, which is what makes tokenizer training tractable at 100 TB.
Per iteration:

  1. adjacent symbol pairs explode from each word's symbol array,
     weighted by word frequency (``zip_with`` of the array against its
     own shift -- JVM higher-order functions, no Python),
  2. one map-side-combined aggregate ranks pairs; the argmax (count
     desc, pair asc -- the deterministic tie-break replacing the
     reference implementation's dict order) is a 1-row collect,
  3. the winning pair merges into every word via a left-to-right
     ``F.aggregate`` fold (greedy non-overlapping, the published
     application order), guarded by an ``array_contains`` pre-filter so
     words without both symbols skip the fold,
  4. the rewritten vocabulary eagerly ``localCheckpoint``s -- lineage
     would otherwise grow by one fold per merge (the ``pagerank`` /
     ``label_propagation`` iterative-operator contract).

Pair counts follow the reference implementation's naive adjacent count
('aaa' contributes (a,a) twice even though only one merge can apply) --
the property the hypothesis test pins against an exact Python model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

#: end-of-word marker, per the published recipe: merges never cross a
#: word boundary, and word-final subwords stay distinct from prefixes.
EOW = "</w>"


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): the one corpus scan BPE training ever makes."""
    from ..functions.text import tokens

    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def _initial_symbols(word: F.Column) -> F.Column:
    """Character array + the end-of-word marker."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(EOW)))


def _apply_merge(syms, a, b) -> F.Column:
    """Greedy left-to-right merge of adjacent (a, b) -> a+b, the
    published application order: a fold whose accumulator is the
    rewritten prefix ('aaa' + (a,a) -> ['aa','a'], never ['a','aa']).
    Slice lengths are clamped with greatest(0, .) -- whole-stage
    codegen can evaluate a guarded branch's expressions before the
    guard (the r7 lesson). ``a``/``b`` may be python strings (the
    collected-literal apply path) or Columns (the chained train path,
    r14 -- the winning pair rides a broadcast 1-row frame instead of a
    driver round-trip)."""
    a_col = F.lit(a) if isinstance(a, str) else a
    b_col = F.lit(b) if isinstance(b, str) else b
    ab_col = F.lit(a + b) if isinstance(a, str) else F.concat(a_col, b_col)
    rest = F.slice(syms, 2, F.greatest(F.lit(0), F.size(syms) - 1))
    merged = F.aggregate(
        rest,
        F.slice(syms, 1, 1),
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == a_col) & (x == b_col),
            F.concat(
                F.slice(acc, 1, F.greatest(F.lit(0), F.size(acc) - 1)),
                F.array(ab_col),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return F.when(
        (F.size(syms) >= 2)
        & F.array_contains(syms, a_col)
        & F.array_contains(syms, b_col),
        merged,
    ).otherwise(syms)


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Train ``n_merges`` BPE merges on a document corpus; returns the
    merge table ``(rank, left, right, merged, pair_freq)`` in learned
    order -- fully deterministic (count desc, pair asc tie-break), so
    replays are bit-identical and the table is a versionable artifact
    (the tokenizer the rest of the pipeline ships with). If the
    vocabulary runs out of adjacent pairs, later ranks simply emit no
    row (same table the old early-``break`` produced).

    DRIVER-BOUNDARY SHAPE (r14 optimization round, guide §1.2/§5):
    the per-round 1-row ``first()`` argmax was a full Py4J round-trip
    plus its own job -- 2 actions per merge, measured 2.65 s of the
    4.8 s sf0.1 wall for 16 rounds of a 31-word vocabulary (pure
    per-action overhead). The winning pair now stays ON THE CLUSTER:
    each round cross-joins the vocabulary against the broadcast 1-row
    ``ORDER BY n DESC, left, right LIMIT 1`` frame and the fold reads
    the pair as COLUMNS. The merge table is the union of the argmax
    frames -- never driver literals.

    r15 refinements (r14 ADVICE item): each round's argmax frame is
    itself eagerly ``localCheckpoint``-ed, so (a) the terminal
    merge-table union reads 1-row in-memory frames instead of
    RE-EXECUTING every round's pair aggregation a second time, and
    (b) the vocabulary rewrite's broadcast build reads the same
    materialized row. An Observation rides the argmax checkpoint
    (zero extra actions) and reports emptiness: an exhausted
    vocabulary now BREAKS the loop again instead of paying
    ``n_merges - rank`` empty checkpoint rounds -- later ranks emit no
    row either way, so the output table is unchanged. Identical
    output: same argmax, same tie-break, same exhaustion rows; pinned
    by the hypothesis exact-Python-model test and the classic worked
    example."""
    if n_merges <= 0:
        return docs.sparkSession.createDataFrame(
            [],
            "rank int, left string, right string, merged string,"
            " pair_freq long",
        )
    words = (
        word_freq_table(docs, text_col)
        .select("freq", _initial_symbols(F.col("word")).alias("syms"))
        .localCheckpoint(eager=True)
    )
    merge_frames = []
    for rank in range(n_merges):
        pairs = (
            words.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(
                            F.col("syms"),
                            1,
                            F.greatest(F.lit(0), F.size("syms") - 1),
                        ),
                        F.slice(
                            F.col("syms"),
                            2,
                            F.greatest(F.lit(0), F.size("syms") - 1),
                        ),
                        lambda x, y: F.struct(
                            x.alias("left"), y.alias("right")
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
            .agg(F.sum("freq").alias("n"))
        )
        # 1-row argmax frame; never collected to the driver. Eagerly
        # checkpointed (r15): the terminal union and the rewrite's
        # broadcast both read this materialized row instead of each
        # re-running the pair aggregation. The emptiness probe rides
        # the checkpoint job as an observed metric -- no extra action.
        seen = Observation()
        best = (
            pairs.orderBy(
                F.col("n").desc(), F.col("left").asc(), F.col("right").asc()
            )
            .limit(1)
            .observe(seen, F.count(F.lit(1)).alias("n_rows"))
            .localCheckpoint(eager=True)
        )
        if seen.get["n_rows"] == 0:
            break  # exhausted: no adjacent pairs left anywhere
        merge_frames.append(
            best.select(
                F.lit(rank).cast("int").alias("rank"),
                "left",
                "right",
                F.concat("left", "right").alias("merged"),
                F.col("n").cast("long").alias("pair_freq"),
            )
        )
        if rank == n_merges - 1:
            break  # nothing consumes the final vocabulary rewrite
        words = (
            words.crossJoin(F.broadcast(best))
            .select(
                "freq",
                _apply_merge(
                    F.col("syms"), F.col("left"), F.col("right")
                ).alias("syms"),
            )
            .localCheckpoint(eager=True)
        )
    if not merge_frames:
        # exhausted before the first merge: empty table, same schema
        return docs.sparkSession.createDataFrame(
            [],
            "rank int, left string, right string, merged string,"
            " pair_freq long",
        )
    out = merge_frames[0]
    for mf in merge_frames[1:]:
        out = out.unionByName(mf)
    return out


def apply_bpe_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize a corpus with a learned merge list (in rank order).

    The folds run over the DISTINCT word table, one merge at a time
    with an eager ``localCheckpoint`` between steps, and the corpus
    then joins word -> symbol-array: (a) each unique word tokenizes
    exactly once no matter how often it occurs -- the same
    train-on-the-vocabulary economics as :func:`learn_bpe_merges` --
    and (b) the per-step materialization caps the expression tree.
    Chaining the k folds into ONE projection is wrong twice over: the
    tree grows ~6x per merge (each step references its input five
    times), so compile time explodes exponentially -- measured: 8
    chained merges never finished codegen, while 8 checkpointed vocab
    passes are milliseconds. Returns one row per (doc row, word
    occurrence) with the word's subword array in ``out_col``."""
    from ..functions.text import tokens

    vocab = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .distinct()
        .select("word", _initial_symbols(F.col("word")).alias(out_col))
        .localCheckpoint(eager=True)
    )
    for a, b in merges:
        vocab = vocab.select(
            "word", _apply_merge(F.col(out_col), a, b).alias(out_col)
        ).localCheckpoint(eager=True)
    word = docs.select("*", F.explode(tokens(text_col)).alias("word"))
    return word.join(vocab, "word").drop("word")
