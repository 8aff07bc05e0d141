"""Distributed BPE tokenizer training — the merge-table induction an LLM
data pipeline runs before tokenizing a corpus (Sennrich et al. byte-pair
encoding, the word-frequency-weighted formulation every production
tokenizer trainer uses).

Scale shape: the corpus is touched ONCE (word-count aggregate); the
iterative merge loop then operates on the VOCABULARY table (|distinct
words| rows — millions at web scale, never corpus-sized), with one
narrow pair-count shuffle per merge and a driver that holds only the
merge list (one (left, right) pair per round — the algorithm is
inherently sequential in the merge rank).  Symbol-array state is
localCheckpointed per round, the same lineage-truncation discipline as
the connected-components loop.

The in-word rewrite runs as an Arrow-batched pandas UDF — greedy
leftmost merging is a sequential scan within each (short) word, the
textbook case for the vectorized-Python escape hatch.

No SQL oracle (iterative argmax; the brief's sanctioned rows-only
class) — instead tests/test_bpe.py verifies the full merge table
against an independent single-machine reference implementation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import adjacent_pairs, tokens

def _merge_batch(left: str, right: str):
    merged = left + right

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_syms = []
            for s in pdf["syms"]:
                s = list(s)
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                        out.append(merged)  # greedy leftmost merge
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                out_syms.append(out)
            pdf = pdf.copy()
            pdf["syms"] = out_syms
            yield pdf

    return run


def train_bpe_merges(
    df: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    min_pair_freq: int = 2,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns
    [(rank, left, right, pair_freq), ...] — the persistable merge table
    a tokenizer ships.  Stops early when no pair reaches
    ``min_pair_freq``.  Ties break deterministically: highest frequency,
    then lexicographic (left, right)."""
    state = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .select("freq", F.split("w", "").alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            state.filter(F.size("syms") >= 2)
            .select("freq", F.explode(adjacent_pairs("syms")).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        # the candidate frame is |distinct pairs| rows; TakeOrdered pulls
        # exactly one winner to the driver — the merge table IS driver
        # state (a few thousand rows for a real tokenizer)
        best = pairs.orderBy(F.col("cnt").desc(), "a", "b").limit(1).collect()  # driver-ok: bounded argmax
        if not best or best[0].cnt < min_pair_freq:
            break
        a, b, cnt = best[0].a, best[0].b, int(best[0].cnt)
        merges.append((rank, a, b, cnt))
        state = state.mapInPandas(
            _merge_batch(a, b), state.schema
        ).localCheckpoint(eager=True)
    return merges


def bpe_merges_frame(
    df: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    min_pair_freq: int = 2,
) -> DataFrame:
    """:func:`train_bpe_merges` as a DataFrame (rank, left, right,
    pair_freq) for the query registry."""
    spark = df.sparkSession
    rows = train_bpe_merges(df, n_merges, text_col, min_pair_freq)
    schema = "rank int, left string, right string, pair_freq bigint"
    return spark.createDataFrame(rows, schema)


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode with a learned merge table: each word's symbols repeatedly
    merge the LOWEST-RANK applicable pair until none applies (the
    standard BPE encode), emitting (id, n_words, n_bpe_tokens) — the
    real token counts a packing/budgeting pass needs, replacing the
    whitespace approximation.

    Arrow-batched mapInPandas; the merge table ships in the closure
    (merge tables are a few 10k entries — well under broadcast scale)
    and distinct words memoize within each batch, so the per-word loop
    runs once per distinct word, not once per occurrence."""
    ranks = {(left, right): rank for rank, left, right, _ in merges}

    def encode_word(w: str, cache: dict) -> int:
        hit = cache.get(w)
        if hit is not None:
            return hit
        syms = list(w)
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[w] = len(syms)
        return len(syms)

    import re as _re

    # Encode-time word segmentation MUST match train-time tokens():
    # training splits on Java \s+, which is ASCII-only by default
    # ([ \t\n\x0B\f\r]), while Python's \s is Unicode-aware — on
    # 'foo bar' the two would disagree on word boundaries and
    # n_words would diverge from every tokens()-derived count.
    # re.ASCII pins \s to the identical ASCII class.
    _ws = _re.compile(r"\s+", _re.ASCII)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                words = [w for w in _ws.split((row.text or "").lower()) if w]
                out.append(
                    (row.doc_id, len(words), sum(encode_word(w, cache) for w in words))
                )
            yield pd.DataFrame(out, columns=["id", "n_words", "n_bpe_tokens"])

    src = df.select(F.col(id_col).cast("bigint").alias("doc_id"), F.col(text_col).alias("text"))
    return src.mapInPandas(
        run, "id bigint, n_words bigint, n_bpe_tokens bigint"
    )
