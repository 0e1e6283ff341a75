"""Byte-pair-encoding tokenizer: corpus-trained merges, applied at scale.

The missing piece between the regex token-count *proxy*
(``textstats.bpe_token_count``) and a real subword tokenizer. The shape is
the scalable one used by production tokenizer training:

- **Train**: BPE learning needs only the word → count histogram, which is
  a *bounded* artifact (distinct words, further capped at ``max_words``).
  One explode + hash aggregation on ``word`` (map-side combine, one
  shuffle) + a ``TakeOrderedAndProject`` top-k produces it; the classic
  greedy merge loop then runs driver-side over that small table — the same
  bounded-collect pattern as IVF centroid training
  (``similarity.ivf_train``). No per-iteration cluster pass: corpus size
  never matters after the histogram.
- **Apply**: merges broadcast to executors; tokenization is an
  Arrow-batched ``mapInPandas`` pass — linear, no shuffle, no state.

Ties in pair counts break by lexicographic pair order, so training is
deterministic for a given histogram (and the histogram itself is exact).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: end-of-word marker (classic Sennrich et al. formulation).
EOW = "</w>"

# Per-task memo cap for bpe_encode: ~1M entries ≈ low hundreds of MB worst
# case — covers any real vocabulary's head while bounding executor memory
# on adversarial long tails.
_CACHE_CAP = 1_000_000


def word_histogram(df: DataFrame, text_col: str, max_words: int = 50_000) -> DataFrame:
    """Exact corpus word histogram capped to the top ``max_words`` by
    count (ties by word — deterministic). The only distributed step of
    training."""
    w = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    return w.orderBy(F.desc("n"), F.asc("word")).limit(max_words)


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    pairs: Counter = Counter()
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += n
    return pairs


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Greedy left-to-right single-pair merge — the BPE application rule."""
    out: list[str] = []
    i = 0
    merged = pair[0] + pair[1]
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_bpe(histogram: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Classic greedy BPE merge learning over a word histogram (pure
    Python — the histogram is bounded). Returns the ordered merge list.
    Count ties break lexicographically on the pair, so the result is a
    pure function of the histogram."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, n in histogram:
        syms = tuple(word) + (EOW,)
        vocab[syms] = vocab.get(syms, 0) + n
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        # count desc, pair asc — deterministic tie-break
        top = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top)
        merges.append(best_pair)
        vocab = {_merge_word(s, best_pair): n for s, n in vocab.items()}
    return merges


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 200, max_words: int = 50_000
) -> list[tuple[str, str]]:
    """Distributed histogram + driver-side merge learning."""
    hist = [(r["word"], r["n"]) for r in word_histogram(df, text_col, max_words).collect()]
    return learn_bpe(hist, n_merges)


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply the ordered merge list to one word (training-order priority —
    the standard BPE inference rule)."""
    syms: tuple[str, ...] = tuple(word) + (EOW,)
    for pair in merges:
        if len(syms) == 1:
            break
        syms = _merge_word(syms, pair)
    return list(syms)


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize every document with the learned merges: Arrow-batched
    ``mapInPandas``, one linear pass, merges shipped in the closure
    (broadcast by Spark's task serialization — the merge list is KBs).

    Adds ``out_col`` (array<string>) and ``n_bpe_tokens`` (long).

    The per-task word→tokens memo is size-capped (``_CACHE_CAP`` entries):
    natural-language word frequency is Zipfian, so a bounded cache keeps
    nearly all the hit rate, while an unbounded dict on long-tail
    vocabularies (URLs, typos, hashes) would grow with the partition and
    eventually evict the executor, not the cache. Past the cap, misses
    are simply encoded without inserting — correctness is unaffected."""
    merges_local = list(merges)
    cache_cap = _CACHE_CAP  # bound at call time → pickled by value into tasks
    fields = df.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.StringType())),
        T.StructField("n_bpe_tokens", T.LongType()),
    ]
    schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc_text(text) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in text.split(" "):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = encode_word(w, merges_local)
                    if len(cache) < cache_cap:
                        cache[w] = got
                out.extend(got)
            return out

        for pdf in batches:
            toks = pdf[text_col].map(enc_text)
            pdf = pdf.assign(**{out_col: toks, "n_bpe_tokens": toks.map(len)})
            yield pdf

    return df.mapInPandas(run, schema=schema)


def save_merges(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist the ordered merge list as parquet (rank column preserves
    training order — application order IS the model)."""
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)], "rank int, a string, b string"
    )
    # bounded artifact: one part file, not one per default-parallelism slot
    df.coalesce(1).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list[tuple[str, str]]:
    rows = spark.read.parquet(path).collect()
    return [(r["a"], r["b"]) for r in sorted(rows, key=lambda r: r["rank"])]
