"""Distributed BPE tokenizer training + encoding — the tokenizer half
of a pre-training data pipeline (the reference stops at vectors; a
corpus engine that counts tokens should be able to DEFINE the tokens).

Byte-pair encoding (Sennrich et al. 2016, as used by GPT-2/LLaMA-class
tokenizers): start from characters, repeatedly merge the most frequent
adjacent symbol pair. The classic insight that makes this distributable
is that training never needs the corpus — only the DISTINCT-WORD
frequency table (word -> count), because pair counts are a sum over
word types weighted by count. So:

  * `bpe_train`: ONE distributed pass builds the word-frequency table
    (tokenize + explode + groupBy — map-side combine, shuffle carries
    (word, count) pairs only), pruned by `min_count`/`max_words`; the
    merge LOOP then runs driver-side over that small table (at 100 TB
    the distinct-word table after min_count pruning is millions of
    rows — megabytes — while the corpus is 10^11 documents). This is
    exactly how single-node BPE trainers work; the distributed part is
    the only part that touches the corpus.
  * `bpe_encode`: the learned merge ranks BROADCAST to executors; an
    Arrow-batched pandas UDF applies greedy lowest-rank-first merging
    per word with an LRU word cache (corpus word frequency is Zipfian:
    the cache hits ~95%+, so the per-row cost collapses to a dict
    lookup). No shuffle at all — a pure map over the corpus.

Scale contrast with a naive port: iterating T merges AGAINST THE CORPUS
(T distributed substitution passes) would read 100 TB hundreds of
times; training on the word table reads it once.

Reference: wensheng/picovdb has no tokenizer (README's "no tokenizer
dependencies" is a non-goal there); this module exists for the corpus
pipeline, not the vector store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from picovdb_spark.functions.text import tokens

END = "</w>"  # end-of-word sentinel: lets merges distinguish suffixes


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for syms, c in vocab.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + c
    return counts


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i, n = 0, len(syms)
    ab = pair[0] + pair[1]
    while i < n:
        if i < n - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(
    docs: DataFrame,
    num_merges: int = 1000,
    *,
    text_col: str = "text",
    min_count: int = 2,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges from a corpus. Returns the ordered
    merge list [(left, right), ...] — rank = list position, the entire
    tokenizer state (persist it as JSON; `bpe_encode` takes it back).

    Distributed part: word-frequency table via tokenize+explode+groupBy
    (whitespace/lowercase `tokens`, the repo-wide convention), keeping
    the `max_words` most frequent words with count >= `min_count`
    (ordered by (count desc, word) so the table — and therefore the
    learned merges — is deterministic). Driver part: the standard BPE
    loop over that table; ties on pair frequency break lexicographically
    (smallest pair), so training is reproducible across runs/engines.

    Stops early when no pair occurs twice (merging singletons would
    just memorize words)."""
    if num_merges <= 0:
        raise ValueError(f"num_merges must be positive, got {num_merges}")
    wf = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= int(min_count))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(int(max_words))
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["w"]) + (END,): int(r["c"]) for r in wf
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        vocab = {_merge_word(s, pair): c for s, c in vocab.items()}
    return merges


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The token inventory a merge list induces: every merge's joined
    string (characters themselves are implicit — any byte not covered
    by a merge surfaces as a single-char token)."""
    return [a + b for a, b in merges]


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly apply the LOWEST-rank
    applicable merge (the GPT-2 algorithm — training order, not left-
    to-right scanning, decides precedence)."""
    syms = tuple(word) + (END,)
    while len(syms) > 1:
        pairs = {(a, b) for a, b in zip(syms, syms[1:])}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, pair = min(ranked)
        syms = _merge_word(syms, pair)
    return list(syms)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_size: int = 65_536,
) -> DataFrame:
    """Tokenize a corpus with a trained merge list: (id_col, bpe_tokens
    array<string>, n_bpe_tokens). The merge ranks ride to executors
    inside the serialized UDF closure (a merge list is KBs–MBs); each
    Arrow batch is encoded with a per-executor word->encoding cache, so
    Zipfian corpora pay the per-word merge loop only on first sight of
    each word type. Pure map — no shuffle, pipelines with any
    downstream stage."""
    import pandas as pd

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    cap = int(cache_size)
    # one cache per deserialized UDF closure — lives across Arrow
    # batches for as long as the python worker keeps the task's
    # function object (worker reuse is on by default), not rebuilt
    # per ~10k-row batch
    cache: dict[str, list[str]] = {}

    def _encode_series(s):
        def enc(text: str) -> list[str]:
            out: list[str] = []
            # split on single spaces, exactly like functions.text.tokens
            # (the split bpe_train's word table was built with) — any-
            # whitespace split would encode words the model never saw
            for w in (text or "").lower().split(" "):
                if not w:
                    continue
                hit = cache.get(w)
                if hit is None:
                    hit = encode_word(w, ranks)
                    if len(cache) < cap:
                        cache[w] = hit
                out.extend(hit)
            return out

        return s.map(enc)

    # set REAL type-hint objects (module-level `from __future__ import
    # annotations` would otherwise hand pandas_udf unresolvable strings)
    _encode_series.__annotations__ = {"s": pd.Series, "return": pd.Series}
    enc_udf = F.pandas_udf(_encode_series, "array<string>")
    out = docs.select(
        F.col(id_col), enc_udf(F.col(text_col)).alias("bpe_tokens")
    )
    return out.withColumn("n_bpe_tokens", F.size("bpe_tokens").cast("long"))


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    """Persist a trained merge list as JSON — the tokenizer's entire
    state (rank = list position). Driver-side file write: the merge
    table is KBs-MBs by construction (bpe_train caps the word table)."""
    import json

    with open(path, "w") as f:
        json.dump([[a, b] for a, b in merges], f)


def load_merges(path: str) -> list[tuple[str, str]]:
    """Load a merge list saved by :func:`save_merges`, validating the
    shape so a truncated/foreign file fails here, not mid-encode."""
    import json

    with open(path) as f:
        raw = json.load(f)
    out: list[tuple[str, str]] = []
    for i, p in enumerate(raw):
        if not (isinstance(p, list) and len(p) == 2 and all(isinstance(x, str) for x in p)):
            raise ValueError(f"malformed merge at rank {i}: {p!r}")
        out.append((p[0], p[1]))
    return out
