"""Text-analysis operators over the `documents` table: language ID,
quality scoring, token counting, document fingerprinting.

These are the per-document map-side operators of an LLM data pipeline:
no shuffles at all (pure projections — they scale linearly and pipeline
with any downstream dedup/filter stage). All expressions are built-in
Catalyst string/array functions; every one has an exact DuckDB oracle.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from picovdb_spark.functions.text import (
    BPE_TOKEN_RE,
    STOPWORDS,
    md5_hash32,
    tokens,
    word_shingles,
)


def token_stats(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", round_to: int = 6
) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, a BPE-ish
    regex token count, chars, and mean token length.

    Tokenizes ONCE via a named `__t` projection — the same
    codegen-expansion fix as quality_score (inlining re-expands
    split+array_remove into every consumer; see that docstring for the
    measured 3× first-execution cost)."""
    base = docs.select(
        F.col(id_col), F.col(text_col), tokens(F.col(text_col)).alias("__t")
    )
    return base.select(
        F.col(id_col),
        F.size("__t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("__t")).cast("long").alias("n_distinct"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)).cast("long").alias("n_bpe_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        # CASE-guarded: a 0-token doc is a legal input (blank/boilerplate
        # rows are the expected corpus pathology) and Spark 4's ANSI
        # default makes an unguarded /0 abort the whole job
        F.round(
            F.when(
                F.size("__t") > 0,
                F.length(F.col(text_col)).cast("double") / F.size("__t").cast("double"),
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("chars_per_token"),
    )


def _stopword_hits(text: Column, words: list[str]) -> Column:
    """Token-equality stopword hit count as ONE compiled-regex pass.

    ``regexp_count`` (JVM-native, pattern compiled once) replaces the
    former ``size(filter(tokens, λ array_contains))`` form: HOF lambdas
    evaluate INTERPRETED per token, so the old form paid |tokens| lambda
    frames × an array scan per doc — at the 500k-doc tier that made the
    quality gate the most expensive stage of both flagship rows (r10;
    the same interpreted-HOF cost class r8/r9 removed from the dedup
    kernels). Values identical: a "hit" is a token — a single-space
    split piece of lower(text) — string-equal to a stopword, which the
    pattern states directly (start-or-space before, space-or-end
    after; consecutive hits resolve because the lookahead leaves the
    boundary space for the next match). NULL text → NULL, as before."""
    if not words:
        # preserve the NULL text -> NULL contract of the regex path
        # (regexp_count NULL-propagates); an unconditional lit(0) would
        # make the empty-list form the one caller-visible exception
        return F.when(text.isNotNull(), F.lit(0))
    alts = "|".join(_re.escape(w) for w in words)
    # \z (end of INPUT), not $: Java's $ matches before a trailing line
    # terminator, which would count "...the\n" as a hit even though the
    # token is "the\n" — diverging from token equality and the DuckDB
    # twins on newline-terminated text
    return F.regexp_count(F.lower(text), F.lit(rf"(?:^| )(?:{alts})(?= |\z)"))


def lang_id(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """N-gram-heuristic language ID: count stopword hits per language
    profile; predict the argmax (ties broken by language code ascending,
    'und' when nothing matches)."""
    scored = docs.select(
        F.col(id_col),
        *[
            _stopword_hits(F.col(text_col), ws).alias(f"__s_{lang}")
            for lang, ws in sorted(STOPWORDS.items())
        ],
    )
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"__s_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # ascending priority on ties
        pred = F.when((best > 0) & (F.col(f"__s_{lang}") == best), F.lit(lang)).otherwise(pred)
    return scored.select(F.col(id_col), pred.alias("pred_lang"), best.cast("long").alias("score"))


def quality_score(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", round_to: int = 6
) -> DataFrame:
    """Heuristic quality score in [0,1]:
    0.4·min(n_tokens/256, 1)  (length)  +
    0.4·(distinct/total tokens)  (lexical diversity)  +
    0.2·min(stopword_ratio·5, 1)  (natural-language prior).

    Tokenizes ONCE per doc: `__t` is a named projection the consumers
    reference as a column, not an inlined expression — inlining
    `tokens()` into every use re-expands split+array_remove 4× inside
    the generated code, and the resulting giant method's JIT/warm-up
    made the gate's FIRST execution ~3× slower (r11 interleaved A/B at
    500k: first pass 16.1 s inlined vs 5.4 s tokens-once, steady
    repeats equal at ~2.1 s, values checksum-identical). Fresh-child
    stage walls — and a 100 TB run, where every execution is a first
    execution — pay exactly that regime. CollapseProject leaves the
    two-projection shape alone because `__t` is non-cheap and
    multiply-referenced."""
    base = docs.select(
        F.col(id_col), F.col(text_col), tokens(F.col(text_col)).alias("__t")
    )
    n = F.size("__t").cast("double")
    # 0-token docs score 0 on every ratio (worst quality) instead of
    # aborting under Spark 4's ANSI divide-by-zero default — empty and
    # whitespace-only rows are exactly what a quality screen must handle
    distinct_ratio = F.when(
        n > 0, F.size(F.array_distinct("__t")).cast("double") / n
    ).otherwise(F.lit(0.0))
    sw = F.when(
        n > 0, _stopword_hits(F.col(text_col), STOPWORDS["en"]).cast("double") / n
    ).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(n / F.lit(256.0), F.lit(1.0))
        + F.lit(0.4) * distinct_ratio
        + F.lit(0.2) * F.least(sw * 5.0, F.lit(1.0))
    )
    return base.select(
        F.col(id_col),
        F.size("__t").cast("long").alias("n_tokens"),
        F.round(distinct_ratio, round_to).alias("distinct_ratio"),
        F.round(sw, round_to).alias("stopword_ratio"),
        F.round(score, round_to).alias("quality"),
    )


def doc_fingerprint(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    k: int = 8,
) -> DataFrame:
    """Bottom-k document fingerprint: the k smallest md5-derived shingle
    hashes, sorted, digested to one md5 — a compact content signature
    (equal fingerprints ⇒ near-identical shingle sets). The rolling-hash
    analog of the reference's content-hash auto-id, at document scope.

    One fused Arrow kernel (shared `_tok_list`/`_shingle_set` tokenizer,
    hashlib per shingle, bottom-k digest) — the last per-shingle
    Catalyst HOF left after the signature and window kernels moved to
    Arrow; values unchanged: fingerprint =
    md5(",".join(sorted(h32 of each distinct shingle)[:k])) with
    h32 = first 8 md5 hex chars as int, exactly the md5_hash32 /
    array_sort / slice / concat_ws form the DuckDB twin restates
    (md5('') for sub-shingle docs on both sides)."""
    from pyspark.sql import types as T

    from picovdb_spark.operators.dedup import _shingle_set, _tok_list

    out_schema = T.StructType(
        [
            docs.schema[id_col],
            T.StructField("fingerprint", T.StringType()),
            T.StructField("n_shingles", T.LongType()),
        ]
    )

    def kern(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            fps, ns = [], []
            for text in pdf[text_col]:
                sh = _shingle_set(_tok_list(text), shingle_n)
                hs = sorted(
                    int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")
                    for s in sh
                )
                fps.append(
                    hashlib.md5(",".join(str(v) for v in hs[:k]).encode()).hexdigest()
                )
                ns.append(len(sh))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "fingerprint": fps,
                    "n_shingles": pd.array(ns, dtype="int64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(kern, schema=out_schema)


def dataset_split(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "v1",
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic hash-based train/val/test assignment.

    Each id maps to a bucket in [0,1) via md5(salt || ':' || id) — stable
    across runs, machines and engines (no RNG, no ordering dependence),
    so re-running the pipeline never migrates a document between splits;
    changing `salt` produces an independent re-split. Pure projection,
    no shuffle.

    `group_col` (optional) hashes the GROUP instead of the id, so every
    document of a group lands in the same split — the leakage-safe form
    when near-duplicates cluster by source (same URL/domain/repository):
    id-hash splitting puts one crawl snapshot of a page in train and the
    next in test, and the eval measures memorization, not generalization.
    NULL groups fall back to the id hash (each such doc is its own
    group). Split FRACTIONS then hold over groups, not documents — a
    heavy group skews realized document counts, which is inherent to
    group splitting, not a defect.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    key = (
        F.coalesce(F.col(group_col).cast("string"), F.col(id_col).cast("string"))
        if group_col is not None
        else F.col(id_col).cast("string")
    )
    u = md5_hash32(F.concat(F.lit(f"{salt}:"), key)) / F.lit(
        4294967296.0
    )
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return docs.select(F.col(id_col), F.round(u, 6).alias("bucket"), expr.alias("split"))


def pack_sequences(
    chunks: DataFrame,
    *,
    id_cols: tuple[str, str] = ("doc_id", "chunk_idx"),
    token_col: str = "n_tokens",
    max_tokens: int = 256,
    partition_salt: str = "v1",
    strategy: str = "greedy",
    group_cols: tuple[str, ...] = (),
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Sequence packing: assign chunks to fixed-budget token bins (the
    pre-training batch-construction step).

    Distributed shape (both strategies): chunks are hashed into
    independent PACK GROUPS (deterministic md5 of the doc id —
    co-locates a doc's chunks) and packed per group over (doc, chunk)
    order. One shuffle on the group key; group count scales with the
    cluster, not the data. Chunks are never split.

    - ``strategy="greedy"`` (default): true greedy next-fit per group
      (`applyInPandas` loop) — a bin's content NEVER exceeds
      `max_tokens` unless a single chunk alone does (such a chunk gets a
      bin to itself). Use this to pack a model context window.
    - ``strategy="prefix"``: closed-form prefix-sum binning —
      bin_idx = floor(exclusive-prefix-sum / max_tokens). Pure window
      expression (SQL-expressible, hence the oracle-checked entry), but
      a chunk straddling a bin boundary lands in the earlier bin, so a
      bin may exceed the budget by up to one chunk.

    ``group_cols`` prepend extra pack-key columns (e.g. the dataset
    split) — a bin never mixes values of a group column, so packing a
    split corpus in one pass can't leak val/test chunks into train
    bins. ``payload_cols`` ride along unexamined (e.g. chunk_text), so
    the packed output is trainer-ready without a join back; payload
    moves in the same single shuffle the packing already pays.

    Output: (*group_cols, doc_id, chunk_idx, n_tokens, *payload_cols,
    pack_group, bin_idx). bin_idx is dense per (group_cols, pack_group).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import types as T

    doc_col, idx_col = id_cols
    g = (
        md5_hash32(F.concat(F.lit(f"{partition_salt}:"), F.col(doc_col).cast("string")))
        % F.lit(64)
    ).alias("pack_group")
    base = chunks.select(
        *group_cols, doc_col, idx_col, token_col, *payload_cols, g
    )
    keys = [*group_cols, "pack_group"]

    if strategy == "prefix":
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col(doc_col).asc(), F.col(idx_col).asc())
            .rowsBetween(W.unboundedPreceding, -1)
        )
        run = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0))
        return base.withColumn("bin_idx", F.floor(run / F.lit(max_tokens)).cast("int"))
    if strategy != "greedy":
        raise ValueError(f"unknown packing strategy: {strategy!r}")

    schema = T.StructType(
        [base.schema[c] for c in base.columns] + [T.StructField("bin_idx", T.IntegerType())]
    )

    def pack(pdf):
        pdf = pdf.sort_values([doc_col, idx_col], ignore_index=True)
        bins, cur_bin, cur_tot = [], 0, 0
        for n in pdf[token_col]:
            n = int(n)
            if cur_tot > 0 and cur_tot + n > max_tokens:
                cur_bin += 1
                cur_tot = 0
            bins.append(cur_bin)
            cur_tot += n
        pdf["bin_idx"] = bins
        return pdf

    return base.groupBy(*keys).applyInPandas(pack, schema=schema)


def packing_stats(
    packed: DataFrame,
    max_tokens: int,
    *,
    group_cols: tuple[str, ...] = (),
    token_col: str = "n_tokens",
) -> DataFrame:
    """The audit a trainer checks before reading packed sequences: per
    group (e.g. per split), how full the bins actually are —

    (group_cols..., n_bins, n_chunks, total_tokens, fill_rate,
     min_fill, overflow_bins)

    `fill_rate` = mean bin total / `max_tokens` (padding waste is
    1 - fill_rate), `min_fill` the emptiest bin's ratio, and
    `overflow_bins` counts bins whose total EXCEEDS the budget — under
    greedy packing that is exactly the single-chunk-too-long bins, so a
    non-zero count here is the "chunk your long docs first" signal.

    Two narrow aggregations (per-bin totals, then per-group rollup) over
    the already-packed frame; never touches payload columns."""
    bins = packed.groupBy(*group_cols, "pack_group", "bin_idx").agg(
        F.sum(F.col(token_col).cast("long")).alias("__bt"),
        F.count("*").alias("__bc"),
    )
    m = float(max_tokens)
    return bins.groupBy(*group_cols).agg(
        F.count("*").alias("n_bins"),
        F.sum("__bc").cast("long").alias("n_chunks"),
        F.sum("__bt").cast("long").alias("total_tokens"),
        F.round(F.avg(F.col("__bt") / m), 6).alias("fill_rate"),
        F.round(F.min(F.col("__bt") / m), 6).alias("min_fill"),
        F.sum((F.col("__bt") > F.lit(int(max_tokens))).cast("long")).alias(
            "overflow_bins"
        ),
    )


# PII patterns: deliberately simple, deterministic, and identically
# expressible in Spark and DuckDB regex dialects (no lookarounds).
PII_PATTERNS = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone": "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    "ssn": "[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "ipv4": "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
}


def pii_scan(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII indicator counts + a keep/quarantine flag.

    Map-side only. The regexes are a deterministic heuristic screen (the
    production analog plugs an NER model into the same projection); a
    doc with any hit is flagged for the quarantine branch of the
    pipeline."""
    cols = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    out = docs.select(F.col(id_col), *cols)
    total = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("long")).withColumn(
        "has_pii", F.col("n_pii") > 0
    )


def pii_redact(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tag_format: str = "[{name}]",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Span-level PII redaction: every match of every pattern is
    REPLACED in the text with its typed tag (``[email]``, ``[ssn]``,
    …), rather than quarantining the whole document the way
    `pii_scan`'s flag does — the standard pre-training treatment for
    documents that are valuable apart from their identifiers.

    Output: (id_col, text_redacted, n_redacted) — n_redacted counts
    matched spans as each pattern sees the text: patterns apply in
    dict order to the progressively rewritten text, so a span already
    rewritten by an earlier pattern is neither re-redacted nor
    double-counted by a later one.

    Map-side only (chained `regexp_replace` inside whole-stage codegen
    — no Python, no shuffle): at 100 TB this pipelines with the scan
    exactly like `pii_scan`. The default patterns are the shared
    `PII_PATTERNS` (Spark/DuckDB-dialect-portable); the production
    analog swaps an NER model into the same projection via
    `mapInPandas` without changing the plan shape around it.

    Fixed-point contract: under the DEFAULT patterns × tags the
    operator is idempotent — ``pii_redact(pii_redact(x)) ==
    pii_redact(x)`` with ``n_redacted == 0`` on the second pass
    (test-pinned) — because no rendered tag matches any pattern. A
    custom `tag_format`/`patterns` combination where a rendered tag
    DOES match a later (or a re-run's earlier) pattern breaks that:
    the tag itself gets re-redacted. Callers supplying custom tags own
    checking their tags against their patterns; ``$`` and ``\\`` in
    tags are safe (escaped to literals before the rewrite).
    """
    pats = PII_PATTERNS if patterns is None else patterns
    text = F.coalesce(F.col(text_col), F.lit(""))
    total = F.lit(0)
    for name, pat in pats.items():
        # regexp_replace's replacement is Java Matcher.replaceAll
        # syntax: '$' is a group reference and '\' an escape — a
        # caller tag like '<$name>' or one containing '$1' would
        # silently corrupt the output (or throw on a dangling '$'),
        # so the rendered tag is escaped to a literal here
        tag = tag_format.format(name=name).replace("\\", "\\\\").replace("$", "\\$")
        total = total + F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        text = F.regexp_replace(text, pat, tag)
    return docs.select(
        F.col(id_col),
        text.alias("text_redacted"),
        total.cast("long").alias("n_redacted"),
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    broadcast_eval: bool = True,
    min_hits: int = 1,
    min_frac: float | None = None,
    prefilter: bool = True,
    prefilter_max_tokens: int = 200_000,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word ``n``-gram with an evaluation set (the overlap screen run before
    pre-training so eval answers don't leak into the corpus).

    `min_hits` / `min_frac` tighten the screen from "any overlap" to a
    materiality threshold (the PaLM/GPT-3-style rule): keep a doc in the
    contaminated set only when it shares at least `min_hits` distinct
    grams AND (when `min_frac` is set) at least that fraction of its OWN
    distinct grams — one idiomatic phrase shared with a benchmark
    shouldn't condemn a long document. With `min_frac` set the output
    gains `n_grams` (the doc's distinct n-gram count) and `hit_frac`
    columns; `hit_frac` counts distinct gram HASHES over distinct gram
    strings, so a (2^-32-rare) collision can only nudge it up.

    Distributed shape: both sides explode to distinct per-doc n-grams;
    the (small) eval n-gram set is broadcast — the train side is never
    shuffled, making this a map-side semi-join + one count-distinct agg
    keyed by doc. At 100 TB the eval side is benchmarks (MBs), so
    broadcast always applies; set ``broadcast_eval=False`` to fall back
    to a shuffle hash join when it genuinely doesn't fit. Joining on the
    md5-derived 32-bit hash of the gram (not the string) keeps the
    broadcast table and the probe narrow; collisions can only ADD a
    candidate hit, and the count is of distinct matched grams, so a
    collision inflates `n_hits` by at most its own count (1 in 2^32-level
    rare) — acceptable for a screen whose action is "route to review".

    Output: one row per CONTAMINATED train doc — (id, n_hits = distinct
    overlapping n-grams).

    `prefilter` (default on): prune non-overlapping docs BEFORE they
    build shingle arrays — the LSH-verify-prefilter pattern
    (dedup.py `minhash_lsh_pairs`) applied to the corpus-side kernel.
    A doc can share an n-gram with the eval set only if it contains at
    least one eval TOKEN, so the kernel tokenizes each doc (cheap) and
    checks set-disjointness against the collected eval token set before
    constructing any gram strings; disjoint docs emit nothing. Entirely
    map-side — zero new shuffles, and the prune lives inside the SAME
    Arrow pass, so the plan downstream is unchanged. Values are
    identical by the superset property (a shared gram is a space-join
    of tokens, so any hash-MATCHED doc shares a token) up to the
    operator's documented 2^-32 hash-collision tolerance: a collision
    can only mint a PHANTOM hit, and only the unfiltered form can mint
    one from a token-disjoint doc — the prune strictly reduces the
    false-flag surface. Pinned identical by test on collision-free
    data. Worst case (every doc shares a stopword with the eval set)
    the prune keeps everything and costs one extra set-disjointness
    pass over already-tokenized docs — noise next to gram construction.

    Collecting the token set is one small EAGER job at call time (the
    one deviation from lazy plan building), bounded by
    `prefilter_max_tokens` rows on the driver; over the cap the prune
    disables itself and the unfiltered kernel runs. The prune only arms
    when `broadcast_eval=True` — `broadcast_eval=False` is the caller's
    declaration that the eval set is too big to hold in one place, so
    no token set is collected (and no eager job runs) on that path.
    """
    # the TRAIN side (the 100 TB side) shingles through the Arrow
    # kernel, not the Catalyst word_shingles HOF chain: the interpreted
    # sequence→transform→element_at×n expression allocates per position
    # and measured 86 s of a 105 s gate stage at 500k docs (~10× the
    # kernel, the same ratio dedup._shingled was built on). The tiny
    # eval side keeps the HOF form; both produce identical gram STRINGS
    # (order inside the per-doc set differs — no consumer observes it),
    # so the hash join semantics are unchanged.
    from picovdb_spark.operators.dedup import _shingled_hashed

    grams = F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias("__g")
    eval_grams = eval_docs.select(grams)
    e = eval_grams.select(md5_hash32(F.col("__g")).alias("__gh")).distinct()
    if broadcast_eval:
        e = F.broadcast(e)
    eval_tokens: frozenset | None = None
    if prefilter and broadcast_eval:
        # the prune set derives from the eval GRAM STRINGS themselves
        # (split on the same single space that joined them), so it is a
        # provable superset of every token that can appear in a shared
        # gram — independent of how either side tokenized. This re-runs
        # the eval-side explode (the broadcast hash set above is the
        # other pass) — the eval side is MBs by the broadcast_eval=True
        # contract, so the duplicate pass is cheaper than caching it
        tok_rows = (
            eval_grams.select(F.explode(F.split("__g", " ")).alias("__t"))
            .distinct()
            .limit(int(prefilter_max_tokens) + 1)
            .collect()
        )
        if len(tok_rows) <= prefilter_max_tokens:
            eval_tokens = frozenset(r["__t"] for r in tok_rows)
    # the kernel emits the gram HASHES directly (r12, `_shingled_hashed`):
    # the join below is on md5_hash32(gram) either way, so shipping the
    # gram strings JVM→Python→JVM and re-hashing them in Catalyst was
    # pure boundary cost — the explode now carries longs, not strings,
    # and the per-gram Catalyst md5 disappears. Values are identical:
    # same md5_hash32 ints, same distinct-count semantics (the kernel
    # dedups in digest space — the operator's documented 2^-32 tolerance)
    sh = _shingled_hashed(
        train, id_col, text_col, n, token_set=eval_tokens
    ).withColumnRenamed("sh", "__s")
    if min_frac is None:
        t = sh.select(F.col(id_col), F.explode("__s").alias("__gh"))
        hits = (
            t.join(e, "__gh")
            .groupBy(id_col)
            .agg(F.count_distinct("__gh").cast("long").alias("n_hits"))
        )
        if min_hits > 1:
            hits = hits.filter(F.col("n_hits") >= int(min_hits))
        return hits
    # fraction mode: the doc's distinct-gram total rides the SAME gram
    # explode (one extra int per row), so the train text is read and
    # shingled exactly once — no second corpus pass
    t = sh.select(
        F.col(id_col),
        F.size("__s").cast("long").alias("__ng"),
        F.explode("__s").alias("__gh"),
    )
    hits = (
        t.join(e, "__gh")
        .groupBy(id_col)
        .agg(
            F.count_distinct("__gh").cast("long").alias("n_hits"),
            F.first("__ng").alias("n_grams"),
        )
    )
    if min_hits > 1:
        hits = hits.filter(F.col("n_hits") >= int(min_hits))
    return (
        hits.withColumn(
            "hit_frac",
            F.round(F.col("n_hits") / F.greatest(F.col("n_grams"), F.lit(1)), 6),
        )
        .filter(F.col("hit_frac") >= float(min_frac))
        .select(id_col, "n_hits", "n_grams", "hit_frac")
    )


def repetition_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_word_frac: float = 0.5,
    max_top_bigram_frac: float = 0.05,
    round_to: int | None = None,
) -> DataFrame:
    """Gopher-style repetition filters: duplicate-word fraction and the
    fraction of the text covered by its single most frequent bigram.
    Degenerate machine-generated text scores high on both; `keep` is the
    conjunction of the thresholds.

    Map-side ONLY — the per-doc bigram histogram is built inside an
    Arrow-batched kernel (collections.Counter per row), not via
    explode + groupBy: no shuffle, no per-doc aggregation state leaves
    the task, so the operator scales linearly and pipelines with the
    scan. (A Catalyst-only formulation needs two shuffles keyed by
    doc_id or an O(len²) higher-order fold.)
    """
    import pandas as pd

    out_schema = (
        f"{id_col} {docs.schema[id_col].dataType.simpleString()}, n_words long, "
        "dup_word_frac double, top_bigram_frac double, keep boolean"
    )

    def kernel(batches):
        from collections import Counter

        for pdf in batches:
            ids, nw, dup, topbi = [], [], [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                ws = [w for w in (txt or "").split(" ") if w]
                nwords = len(ws)
                d = 1.0 - (len(set(ws)) / nwords) if nwords else 0.0
                if nwords >= 2:
                    c = Counter(zip(ws, ws[1:]))
                    tb = max(c.values()) / (nwords - 1)
                else:
                    tb = 0.0
                ids.append(i)
                nw.append(nwords)
                # default: no rounding — both fracs are single correctly-
                # rounded IEEE divisions, bit-identical to any SQL engine
                # computing the same expression (a round() here can DIVERGE
                # from SQL round on exact-half binary fractions)
                dup.append(d if round_to is None else round(d, round_to))
                topbi.append(tb if round_to is None else round(tb, round_to))
            out = pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": nw,
                    "dup_word_frac": dup,
                    "top_bigram_frac": topbi,
                }
            )
            out["keep"] = (out["dup_word_frac"] <= max_dup_word_frac) & (
                out["top_bigram_frac"] <= max_top_bigram_frac
            )
            yield out

    return docs.select(id_col, text_col).mapInPandas(kernel, schema=out_schema)


def repeated_ngram_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_df: int = 2,
) -> DataFrame:
    """Within-corpus repeated-n-gram screen (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): for each
    document, the fraction of its distinct word ``n``-grams that occur in
    at least ``min_df`` documents corpus-wide. Memorization-prone spans
    are exactly the ones whose long n-grams recur across documents —
    ``repeated_frac`` near 1.0 flags boilerplate/templated docs that
    per-doc repetition filters (repetition_stats) cannot see, because the
    evidence lives in OTHER documents.

    Distributed shape (two narrow shuffles, no wide rows move):
      1. per-doc distinct grams → md5-32 gram hash (8 bytes + id per row);
      2. document-frequency agg keyed by gram hash — map-side partial
         combine, so the shuffle carries one (hash, count) per distinct
         gram per partition, not per occurrence;
      3. equi-join positions back on the hash (repeated set is NOT
         broadcast — at 100 TB it is corpus-sized) + per-doc count agg.
    Text itself never shuffles. Hash collisions can only ADD a false
    repeat (same md5-32 reasoning as decontaminate); acceptable for a
    screen whose action is "flag for review". A gram hotter than every
    other (think a licence header in 10^8 docs) is ONE row after the
    map-side combine — df agg skew is bounded by the combine, and the
    join fans it back out doc-local, so no salt is needed.

    Output: one row per doc that HAS at least one n-gram —
    (id, n_grams, n_repeated, repeated_frac). Docs shorter than ``n``
    tokens have no grams and no row; callers LEFT-join and coalesce.
    """
    # shingles via the Arrow kernel, not the interpreted word_shingles
    # HOF chain (same swap, same reasoning, as decontaminate — the HOF
    # allocates per position and is ~10× slower on a corpus-sized
    # side); the kernel emits the md5_hash32 ints directly (r12,
    # `_shingled_hashed`) — every consumer below keys on the hash, so
    # gram strings crossed the Python boundary purely to be re-hashed
    from picovdb_spark.operators.dedup import _shingled_hashed

    g = _shingled_hashed(docs, id_col, text_col, n).select(
        F.col(id_col), F.explode("sh").alias("__gh")
    )
    df_counts = g.groupBy("__gh").agg(F.count("*").alias("__df"))
    rep = df_counts.filter(F.col("__df") >= min_df).select("__gh")
    totals = g.groupBy(id_col).agg(F.count("*").cast("long").alias("n_grams"))
    rep_counts = (
        g.join(rep, "__gh")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_repeated"))
    )
    return (
        totals.join(rep_counts, id_col, "left")
        .withColumn("n_repeated", F.coalesce(F.col("n_repeated"), F.lit(0).cast("long")))
        .withColumn(
            "repeated_frac",
            (F.col("n_repeated").cast("double") / F.col("n_grams").cast("double")),
        )
    )


def top_ngrams(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n: int = 2,
    k: int = 50,
) -> DataFrame:
    """Corpus-wide top-k word n-grams by DOCUMENT frequency (each doc
    contributes each distinct gram once) — the boilerplate audit (a
    boilerplate phrase shows up as an outlier here long before any
    per-doc filter sees it). Document frequency, not raw occurrence
    count, is the right statistic for boilerplate: a phrase repeated
    1000× inside one degenerate doc is repetition_stats' job.

    explode → count is ONE shuffle with map-side partial aggregation
    (counts combine before moving); the final global top-k ranks the
    tiny aggregated result (≤ distinct-gram count) in a single-partition
    window — fine because k and the distinct set are small by
    construction; ties break deterministically by gram ascending.
    """
    # Arrow-kernel shingles (see repeated_ngram_screen); the kernel
    # needs an id column, so synthesize a row id when pruning to text —
    # it never leaves the shingle projection
    from picovdb_spark.operators.dedup import _shingled

    g = _shingled(
        docs.select(F.monotonically_increasing_id().alias("__rid"), text_col),
        "__rid",
        text_col,
        n,
    ).select(F.explode("sh").alias("gram"))
    counts = g.groupBy("gram").agg(F.count("*").cast("long").alias("cnt"))
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("cnt").desc(), F.col("gram").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    *,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    salt: str = "sample-v1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the domain-mixing /
    rebalancing primitive of corpus curation (e.g. keep 10% of lang "en",
    100% of lang "zh").

    Same md5-uniform trick as `dataset_split`: a row survives iff
    md5(salt ':' id) maps below its stratum's rate — stable across runs
    and engines, independent of row order and partitioning, and a pure
    map-side filter (NO shuffle, no RNG state). Strata absent from
    `rates` get `default_rate`. Output keeps all input columns plus the
    rounded sampling bucket (so downstream audits can re-derive the
    decision)."""
    u = md5_hash32(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))) / F.lit(
        4294967296.0
    )
    rate = None
    for name, r in rates.items():
        cond = F.col(stratum_col) == F.lit(name)
        rate = F.when(cond, F.lit(float(r))) if rate is None else rate.when(cond, F.lit(float(r)))
    rate = F.lit(float(default_rate)) if rate is None else rate.otherwise(F.lit(float(default_rate)))
    # filter on the UNROUNDED bucket: u is exact in both engines (md5 →
    # integer → one IEEE divide), and rounding before the compare would
    # make rate=1.0 drop the ~2⁻²¹ of ids whose bucket rounds up to 1.0;
    # the emitted audit column is rounded for display/oracle hashing only
    return docs.withColumn("__u", u).filter(F.col("__u") < rate).withColumn(
        "bucket", F.round(F.col("__u"), 6)
    ).drop("__u")


def weighted_sample(
    scored: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    weight_col: str = "quality",
    salt: str = "wsample-v1",
    round_to: int = 6,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis A-ES, log form): every row draws a reproducible md5-uniform
    u ∈ (0,1) from its id and competes with key ln(u)/w — the global
    top-k keys are exactly a weight-proportional sample without
    replacement. No RNG state, stable across engines/partitionings/runs
    — the quality-weighted corpus-subsampling primitive (pick k docs
    with probability increasing in quality, reproducibly).

    Rows with w ≤ 0 are excluded (the A-ES domain). Spark-first shape:
    the key is one map-side expression; the global top-k plans as
    TakeOrderedAndProject (per-partition partial top-k, k·parts rows to
    the driver) — never a single-partition global sort
    (tests/test_corpus_hygiene.py plan pin). The DuckDB twin is the same
    expression + ORDER BY key DESC, id LIMIT k.

    Returns (id, wkey) for the sampled rows. Selection orders on the
    `round_to`-ROUNDED key with the id tiebreak — not the raw key:
    ln() differs by a last ulp between engines (JVM Math.log vs libm),
    and a raw-key comparison exactly at the rank-k boundary could flip
    sample membership between this plan and an oracle restating it.
    Rounding first makes the decision engine-independent; within a
    rounded tie the id order is total, so the selected set is unique."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = (
        md5_hash32(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
        + F.lit(0.5)  # never exactly 0 ⇒ ln(u) finite
    ) / F.lit(4294967296.0)
    key = F.log(u) / F.col(weight_col)
    return (
        scored.filter(F.col(weight_col) > 0)
        .select(F.col(id_col), F.round(key, round_to).alias("wkey"))
        .orderBy(F.col("wkey").desc(), F.col(id_col).asc())
        .limit(k)
    )


URL_PATTERN = r"https?://[^\s]+"
DOMAIN_PATTERN = r"https?://([^/\s:]+)"


def extract_urls(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per URL occurrence: (id, url, domain) — pure map-side
    regex (regexp_extract_all + explode), no Python, no shuffle. The
    domain is lowercased host (port/path stripped)."""
    urls = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), F.lit(0))
        ).alias("url"),
    )
    return urls.withColumn(
        "domain", F.lower(F.regexp_extract(F.col("url"), DOMAIN_PATTERN, 1))
    )


def domain_stats(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-domain corpus stats: (domain, n_urls, n_docs) — THE input to
    blocklist/allowlist curation (cut spam domains, cap boilerplate
    mirrors). Map-side extraction, one narrow groupBy on the domain
    string; document text never shuffles."""
    u = extract_urls(docs, id_col=id_col, text_col=text_col)
    return u.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct(id_col).alias("n_docs"),
    )


def filter_domains(
    docs: DataFrame,
    blocklist: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop documents containing a URL on a blocked domain — broadcast
    anti-join of the (tiny) blocklist against the extracted domains."""
    spark = docs.sparkSession
    bl = spark.createDataFrame([(d.lower(),) for d in blocklist], schema="domain string")
    bad_ids = (
        extract_urls(docs, id_col=id_col, text_col=text_col)
        .join(F.broadcast(bl), on="domain", how="left_semi")
        .select(id_col)
        .distinct()
    )
    return docs.join(bad_ids, on=id_col, how="left_anti")


def ngram_lm_fit(
    lm_docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 1,
) -> dict:
    """Fit a bigram language model with add-k smoothing — the CCNet/
    Wikipedia-LM style quality signal: documents whose token stream the
    reference corpus finds 'surprising' (high bits per token) are
    boilerplate, spam, or gibberish; very low surprise is template text.

    Returns {"bigrams": DF(w1, w2, c2), "unigrams": DF(w1, c1),
    "vocab_size": int, "min_count": int} — two small count tables (the
    whole model state; persist them as parquet to reuse across batches)
    plus the smoothing denominator. Training is two narrow groupBys over
    gram keys (map-side partial aggregation; text never shuffles).
    `min_count` prunes the bigram tail (count < min_count drops to the
    smoothed floor), which bounds the table at corpus scale — the
    standard LM-pruning trade.

    Fit on a held-out reference slice (e.g. a known-clean subcorpus),
    then score the full corpus: at 100 TB the model tables stay
    megabytes while scoring is one join + one per-doc aggregate.

    The unigram table comes back CACHED (vocab_size already forced one
    pass; every score call re-reads both tables). Release it with
    `lm["unigrams"].unpersist()` when done, or persist both tables to
    parquet and reload — the durable form."""
    t = tokens(F.col(text_col))
    toks = lm_docs.select(t.alias("t")).filter(F.size("t") >= 1)
    uni = (
        toks.select(F.explode("t").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    bi = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(t, 1, size(t) - 1)"),
                    F.expr("slice(t, 2, size(t) - 1)"),
                )
            ).alias("bg")
        )
        .select(F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )
    if min_count > 1:
        bi = bi.filter(F.col("c2") >= min_count)
    uni = uni.cache()
    vocab_size = uni.count()
    return {
        "bigrams": bi,
        "unigrams": uni,
        "vocab_size": vocab_size,
        "min_count": min_count,
    }


def ngram_lm_score(
    docs: DataFrame,
    lm: dict,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 1.0,
) -> DataFrame:
    """Score every document against an `ngram_lm_fit` model:
    bits_per_token = mean over bigram positions of
    −log₂ p(w2 | w1), with p = (c2 + k) / (c1 + k·V) (add-k smoothing —
    unseen bigrams and unseen prefixes both fall to the smoothed floor
    instead of −∞).

    Output: (id_col, n_bigrams, oov_bigrams, bits_per_token); documents
    with fewer than two tokens score NULL (no bigram evidence) with
    n_bigrams = 0. High bits = unnatural text (gibberish, spam);
    abnormally low bits = templated repetition — pipelines usually keep
    a middle band, like the quality-score keep rule (quality_score).

    Scale shape: one explode to (doc, position) bigram rows, one join
    per count table (broadcast when the LM is small — the usual case, a
    pruned LM is MBs; shuffle-join on gram keys otherwise — Catalyst/AQE
    decides), one per-doc aggregate. The mean is a float64 sum whose
    addend ORDER is partition-dependent at the last ulp, so this is a
    tolerance-checked operator (pytest DuckDB twin at 1e-9), not a
    bit-hash one — the honest contract for any floating reduction."""
    v = float(lm["vocab_size"])
    k = float(add_k)
    t = tokens(F.col(text_col))
    toks = docs.select(F.col(id_col), t.alias("t"))
    bg = toks.filter(F.size("t") >= 2).select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.expr("slice(t, 1, size(t) - 1)"),
                F.expr("slice(t, 2, size(t) - 1)"),
            )
        ).alias("bg"),
    ).select(F.col(id_col), F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2"))
    joined = (
        bg.join(lm["bigrams"], on=["w1", "w2"], how="left")
        .join(lm["unigrams"], on="w1", how="left")
        .withColumn(
            "__p",
            (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + F.lit(k))
            / (F.coalesce(F.col("c1"), F.lit(0)).cast("double") + F.lit(k * v)),
        )
    )
    scored = joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum(F.when(F.col("c2").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("oov_bigrams"),
        F.avg(-F.log2("__p")).alias("bits_per_token"),
    )
    return docs.select(F.col(id_col)).join(scored, on=id_col, how="left").select(
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias("n_bigrams"),
        F.coalesce(F.col("oov_bigrams"), F.lit(0).cast("long")).alias("oov_bigrams"),
        F.col("bits_per_token"),
    )


def lm_bucket_cutoffs(
    scored: DataFrame,
    fracs: tuple[float, ...] = (1 / 3, 2 / 3),
    *,
    score_col: str = "bits_per_token",
    accuracy: int = 10_000,
) -> list[float]:
    """Estimate per-corpus perplexity cutoffs — the CCNet step that
    turns raw LM scores into head/middle/tail tertiles: compute the
    score distribution's quantiles at `fracs` over the scored corpus
    (NULL scores — <2-token docs — are excluded, as CCNet excludes
    unscorable lines).

    Scale shape: `percentile_approx` (Greenwald–Khanna sketch) — one
    map-side sketch per partition merged at the driver, NO global sort,
    error bounded by 1/`accuracy` in RANK space. At 100 TB this is the
    only viable form; an exact percentile would sort the corpus. The
    returned floats are meant to be FROZEN into pipeline config (like
    CCNet ships its cutoffs with the model) so bucket assignment stays
    a pure map — see `lm_buckets`.

    Reference contrast: the reference has no corpus-statistics step at
    all (pico_vdb.py stores vectors only); this is pipeline-side.
    """
    if not fracs or any(not (0.0 < f < 1.0) for f in fracs):
        raise ValueError(f"fracs must be in (0, 1), got {fracs!r}")
    if sorted(fracs) != list(fracs):
        raise ValueError(f"fracs must be ascending, got {fracs!r}")
    row = (
        scored.filter(F.col(score_col).isNotNull())
        .agg(
            F.percentile_approx(
                F.col(score_col), F.lit(list(float(f) for f in fracs)), accuracy
            ).alias("q")
        )
        .first()
    )
    return [float(x) for x in (row["q"] or [])]


def lm_buckets(
    scored: DataFrame,
    cutoffs: list[float],
    *,
    score_col: str = "bits_per_token",
    bucket_col: str = "lm_bucket",
    labels: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style perplexity bucketing: label every scored document by
    which side of the frozen `cutoffs` its LM score falls on —
    `head` (score < cutoffs[0]: most reference-like, the slice CCNet
    trains on first), `middle`, `tail` (most surprising — boilerplate
    and gibberish live here). len(labels) must be len(cutoffs) + 1.
    NULL scores (unscorable <2-token docs) get a NULL bucket — the
    length gates own those, not the LM.

    Pure map-side projection (one chained CASE) — no shuffle, pipelines
    with any downstream filter, and the frozen cutoffs make the
    assignment reproducible across batches/engines the way `dataset_
    split`'s md5 bucket is. Pair with `lm_bucket_cutoffs` to fit the
    cutoffs once on a reference slice, then apply them corpus-wide.
    """
    if len(labels) != len(cutoffs) + 1:
        raise ValueError(
            f"need len(cutoffs)+1 labels: {len(cutoffs)} cutoffs, "
            f"{len(labels)} labels"
        )
    if sorted(cutoffs) != list(cutoffs):
        raise ValueError(f"cutoffs must be ascending, got {cutoffs!r}")
    s = F.col(score_col)
    expr = None
    for c, lab in zip(cutoffs, labels):
        branch = F.when(s < F.lit(float(c)), F.lit(lab))
        expr = branch if expr is None else expr.when(s < F.lit(float(c)), F.lit(lab))
    expr = expr.otherwise(F.lit(labels[-1]))
    return scored.withColumn(bucket_col, F.when(s.isNotNull(), expr))


def sample_to_budget(
    docs: DataFrame,
    budgets: dict[str, int],
    *,
    id_col: str = "doc_id",
    domain_col: str = "lang",
    tokens_col: str = "n_tokens",
    salt: str = "budget-v1",
    buckets: int = 4096,
) -> DataFrame:
    """Deterministic per-domain sampling to a TOKEN budget — the data-
    mixing primitive (Pile/Dolma-style): for each domain, keep documents
    in md5-hash order until the domain's token budget is reached; the
    document that crosses the budget line is the last one kept (prefix-
    until-reached — budgets are floors, overshoot is < one document).
    Domains absent from `budgets` are dropped. Unlike `stratified_
    sample` (a RATE per stratum), this hits an absolute token TARGET —
    what a training-mixture spec actually states.

    Output: the kept rows with all input columns plus `cum_tokens`
    (tokens up to and including this doc within its domain's hash
    order) — the audit trail that re-derives every keep decision.

    Scale shape — the naive form is one window per domain
    (`SUM(tokens) OVER (PARTITION BY domain ORDER BY md5(id))`), which
    puts each ENTIRE domain in a single partition: a skew cliff at
    100 TB where one domain can be 30 TB. This implementation is the
    two-pass equivalent with identical output:
      1. Aggregate token sums per (domain, hash-bucket) — `buckets`
         buckets from the md5 prefix; a narrow partial-aggregating
         shuffle of (domain, int, long) triplets. The per-domain
         cumulative walk over ≤`buckets` rows happens on the driver
         (|domains| x `buckets` small rows) and yields each domain's
         BOUNDARY bucket + tokens remaining on entry.
      2. Map-side verdicts: buckets before the boundary keep
         everything, after it drop everything; ONLY boundary-bucket
         rows (≈ 1/`buckets` of the domain) run the exact cumulative
         window — per-domain partitions of corpus_size/`buckets` rows,
         no skew cliff. Ordering is (md5 hex, id): the bucket is a
         PREFIX of the same hex, so bucket-then-hash order equals
         global hash order and the two-pass output is bit-identical to
         the naive window (pinned in tests).
    The driver table is |domains| x `buckets` rows — fine for mixing
    specs (domains in the thousands); for millions of micro-domains
    lower `buckets` or fall back to the one-window form.
    """
    if not budgets:
        raise ValueError("budgets is empty — every domain would be dropped")
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    from pyspark.sql import Window

    spark = docs.sparkSession
    hx = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    # ORDER-PRESERVING bucket: floor(prefix16 * buckets / 65536). Monotone
    # in the hex prefix, so every bucket is a CONTIGUOUS hash range and
    # bucket-then-hash order equals global hash order — a modulo here
    # would interleave ranges and silently break the naive-window
    # equivalence the two-pass design promises
    pv = F.conv(F.substring(hx, 1, 4), 16, 10).cast("long")
    bkt = F.floor(pv * F.lit(int(buckets)) / F.lit(65536)).cast("int")
    bdf = spark.createDataFrame(
        [(str(d), int(b)) for d, b in budgets.items()], f"{domain_col} string, __budget long"
    )
    base = (
        docs.join(F.broadcast(bdf), on=domain_col, how="inner")
        .withColumn("__hx", hx)
        .withColumn("__bkt", bkt)
    )
    # pass 1: (domain, bucket) token sums -> driver cumulative walk
    sums = (
        base.groupBy(domain_col, "__bkt")
        .agg(F.sum(F.col(tokens_col).cast("long")).alias("__t"))
        .collect()
    )
    per_dom: dict[str, dict[int, int]] = {}
    for r in sums:
        per_dom.setdefault(r[domain_col], {})[r["__bkt"]] = r["__t"]
    plan_rows = []  # (domain, boundary_bucket, tokens_entering_boundary)
    for dom, bsums in per_dom.items():
        budget = int(budgets[dom])
        cum = 0
        boundary, entering = None, None
        for b in sorted(bsums):
            if cum >= budget:
                break
            if cum + bsums[b] >= budget:
                boundary, entering = b, cum
                break
            cum += bsums[b]
        if boundary is None and cum < budget:
            boundary, entering = int(buckets), cum  # budget never reached: keep all
        if boundary is None:
            boundary, entering = -1, 0  # budget <= 0: keep nothing
        plan_rows.append((dom, int(boundary), int(entering)))
    plan = spark.createDataFrame(
        plan_rows, f"{domain_col} string, __boundary int, __entering long"
    )
    j = base.join(F.broadcast(plan), on=domain_col, how="inner")
    pre = j.filter(F.col("__bkt") < F.col("__boundary")).withColumn(
        "__cum_in", F.lit(None).cast("long")
    )
    # pass 2: exact window over ONLY the boundary bucket's rows
    wb = Window.partitionBy(domain_col).orderBy(F.col("__hx").asc(), F.col(id_col).asc())
    bnd = (
        j.filter(F.col("__bkt") == F.col("__boundary"))
        .withColumn("__cum_in", F.sum(F.col(tokens_col).cast("long")).over(wb))
        .filter(
            F.col("__entering") + F.col("__cum_in") - F.col(tokens_col).cast("long")
            < F.col("__budget")
        )
    )
    out = pre.unionByName(bnd)
    # cum_tokens audit: exact within the boundary bucket; for pre-boundary
    # rows recompute the in-bucket window + per-domain bucket offsets so
    # the audit column matches the naive one-window form bit-for-bit
    offs = []
    for dom, bsums in per_dom.items():
        cum = 0
        for b in sorted(bsums):
            offs.append((dom, int(b), int(cum)))
            cum += bsums[b]
    odf = spark.createDataFrame(offs, f"{domain_col} string, __bkt int, __off long")
    w2 = Window.partitionBy(domain_col, "__bkt").orderBy(
        F.col("__hx").asc(), F.col(id_col).asc()
    )
    return (
        out.join(F.broadcast(odf), on=[domain_col, "__bkt"], how="left")
        .withColumn(
            "cum_tokens",
            F.col("__off") + F.sum(F.col(tokens_col).cast("long")).over(w2),
        )
        .drop("__hx", "__bkt", "__budget", "__boundary", "__entering", "__cum_in", "__off")
    )


def dsir_weights(
    docs: DataFrame,
    target_lm: dict,
    raw_lm: dict,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 1.0,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR — Xie et al.,
    NeurIPS 2023), bigram-LM instantiation: weight every raw-corpus
    document by how much more likely the TARGET distribution finds its
    token stream than the RAW distribution,

        log_ratio = bits_raw - bits_target      (per token, log2)
        importance weight w = 2^log_ratio

    Fit `target_lm` on the domain you want more of (`ngram_lm_fit` on
    e.g. curated encyclopedic text) and `raw_lm` on a sample of the
    crawl itself; documents whose ratio is high look like the target.
    Output: (id_col, n_bigrams, bits_target, bits_raw, log_ratio,
    dsir_w). Docs with <2 tokens score NULL throughout (no evidence —
    exclude them, as DSIR's own preprocessing drops degenerate docs).

    Pair with `weighted_sample(..., weight_col="dsir_w")` to draw the
    training subset: A-ES top-k with these weights IS importance
    resampling without replacement. Bigram ratios are a few bits either
    way, so w = 2^ratio stays well inside float range — no log-space
    sampler needed.

    Scale shape: two `ngram_lm_score` passes (each: one explode, two
    broadcast joins against MB-scale count tables, one per-doc agg) and
    an id join — everything narrow; both models' tables are broadcast
    at 100 TB. Reuses the oracle-checked scorer rather than fusing the
    passes: the fused form would save one corpus read but lose the
    per-model audit columns pipelines log."""
    t = ngram_lm_score(docs, target_lm, id_col=id_col, text_col=text_col, add_k=add_k).select(
        id_col, "n_bigrams", F.col("bits_per_token").alias("bits_target")
    )
    r = ngram_lm_score(docs, raw_lm, id_col=id_col, text_col=text_col, add_k=add_k).select(
        id_col, F.col("bits_per_token").alias("bits_raw")
    )
    ratio = F.col("bits_raw") - F.col("bits_target")
    return (
        t.join(r, id_col)
        .withColumn("log_ratio", ratio)
        .withColumn("dsir_w", F.pow(F.lit(2.0), ratio))
    )


def mixture_budgets(
    docs: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    *,
    domain_col: str = "lang",
    tokens_col: str = "n_tokens",
    respect_available: bool = True,
) -> dict[str, int]:
    """Turn a mixture SPEC ({domain: weight}, total token budget) into
    the per-domain token budgets `sample_to_budget` consumes — with
    water-filling: a domain that cannot supply its proportional share
    (weight/Σweights x total exceeds what the corpus HAS) is capped at
    its available tokens and the shortfall is redistributed across the
    uncapped domains in weight proportion, iterating until stable. This
    is the allocation step every mixture spec needs and most pipelines
    hand-roll: without it, a scarce high-weight domain silently deflates
    the total while abundant domains stay underweighted.

    One distributed aggregation (per-domain token totals over the listed
    domains — narrow (domain, long) shuffle) + a driver loop over
    |domains| entries. `respect_available=False` skips the corpus scan
    and returns the plain proportional split (useful when budgets will
    screen a FUTURE stream whose supply is unknown).

    Returns {domain: budget_tokens} (ints). Total allocated ≤
    `total_tokens`, with EQUALITY whenever the corpus has enough supply:
    shares are floored, then the flooring remainder (< |domains| tokens)
    is dealt +1 at a time in (weight desc, domain asc) order, so the
    allocation is deterministic and accounts for every budgeted token."""
    if total_tokens <= 0:
        raise ValueError(f"total_tokens must be positive, got {total_tokens}")
    if not weights:
        raise ValueError("weights is empty")
    bad = {d: w for d, w in weights.items() if w <= 0}
    if bad:
        raise ValueError(f"weights must be positive, got {bad}")
    def _proportional(doms_w: dict[str, float], budget: int) -> dict[str, int]:
        # floor each share, then deal the flooring remainder (< |domains|
        # tokens) one at a time in (weight desc, name asc) order — the
        # documented "equality when supply allows" contract; independent
        # floors alone silently drop up to |domains|-1 tokens
        wsum = float(sum(doms_w.values()))
        alloc = {d: int(budget * w / wsum) for d, w in doms_w.items()}
        left = budget - sum(alloc.values())
        for d in sorted(doms_w, key=lambda x: (-doms_w[x], x))[: max(left, 0)]:
            alloc[d] += 1
        return alloc

    if not respect_available:
        return _proportional(dict(weights), int(total_tokens))
    doms = list(weights)
    avail_rows = (
        docs.filter(F.col(domain_col).isin(doms))
        .groupBy(domain_col)
        .agg(F.sum(F.col(tokens_col).cast("long")).alias("__t"))
        .collect()
    )
    avail = {r[domain_col]: int(r["__t"]) for r in avail_rows}
    capped: dict[str, int] = {}
    remaining = int(total_tokens)
    free = {d: float(weights[d]) for d in doms}
    # each pass caps every domain whose proportional share exceeds its
    # supply; terminates in <= |domains| passes (every pass caps >= 1
    # domain or fixes the allocation)
    while free:
        wsum = sum(free.values())
        over = {
            d: avail.get(d, 0)
            for d in free
            if remaining * free[d] / wsum >= avail.get(d, 0)
        }
        if not over:
            # every free domain's supply strictly exceeds its share, so
            # the remainder deal (at most +1 each) can't overshoot avail
            capped.update(_proportional(free, remaining))
            break
        for d, a in over.items():
            capped[d] = a
            remaining -= a
            del free[d]
        if remaining <= 0:
            for d in free:
                capped[d] = 0
            break
    return {d: capped.get(d, 0) for d in doms}


def interleave_by_weight(
    docs: DataFrame,
    weights: dict[str, float],
    *,
    domain_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "mix-v1",
    rank_col: str = "interleave_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic weighted interleaving — the ORDER half of a mixture
    spec that `mixture_budgets` (how much) and `sample_to_budget` (which
    docs) don't cover: deal the listed domains into one global training
    order where a domain with weight w contributes ~w-proportionally to
    every prefix of the stream (stride scheduling: domain d's i-th doc,
    in md5(seed:id) pseudo-shuffle order, sorts by key i/w_d; ties break
    (domain, id)). A trainer reading the stream in `rank_col` order sees
    the spec'd mixture at every step — no epoch-boundary domain clumping,
    no RNG state, reproducible from (seed, weights) alone.

    Rows whose domain is not in `weights` are dropped (the spec defines
    the stream). Output: all input columns + `rank_col` (1-based, dense).

    Plan shape: two `global_rank` passes (range shuffle + offsets each —
    never a single-partition window). The per-domain position comes from
    the FIRST global order (domain, shuffle-key, id): because domains are
    contiguous in that order, position-within-domain = global_rank −
    (docs in earlier domains), a |domains|-entry driver map. The stride
    key i/w is IEEE-754 double division — bit-identical across engines,
    so the order is oracle-statable.
    """
    if not weights:
        raise ValueError("weights is empty")
    bad = {d: w for d, w in weights.items() if w <= 0}
    if bad:
        raise ValueError(f"weights must be positive, got {bad}")
    from picovdb_spark.operators.ordering import global_rank

    doms = sorted(weights)
    keyed = docs.filter(F.col(domain_col).isin(list(doms))).withColumn(
        "__ikey",
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
    )
    first = global_rank(
        keyed,
        [(domain_col, "asc"), ("__ikey", "asc"), (id_col, "asc")],
        rank_col="__g1",
        num_partitions=num_partitions,
    )
    counts = {
        r[domain_col]: r["c"]
        for r in first.groupBy(domain_col).agg(F.count("*").alias("c")).collect()
    }
    offset, acc = {}, 0
    for d in doms:  # same asc order as the rank
        offset[d] = acc
        acc += counts.get(d, 0)
    off_expr = F.create_map(
        *[x for d in doms for x in (F.lit(d), F.lit(offset[d]))]
    )
    w_expr = F.create_map(
        *[x for d in doms for x in (F.lit(d), F.lit(float(weights[d])))]
    )
    strided = first.withColumn(
        "__stride",
        (F.col("__g1") - off_expr[F.col(domain_col)]).cast("double")
        / w_expr[F.col(domain_col)],
    )
    second = global_rank(
        strided,
        [("__stride", "asc"), (domain_col, "asc"), (id_col, "asc")],
        rank_col=rank_col,
        num_partitions=num_partitions,
    )
    out = second.select(*docs.columns, rank_col)
    # BOTH passes' pinned sources must survive until the caller consumes
    # the result: the second pass reads through the first's cached
    # partitioning, and an evicted/lost partition recomputed through an
    # unpersisted first source would re-sample range boundaries and
    # silently shift ranks. release_global_rank(result) frees both.
    out._global_rank_source = second._global_rank_source  # type: ignore[attr-defined]
    out._global_rank_extra = (first._global_rank_source,)  # type: ignore[attr-defined]
    return out
