"""Corpus-hygiene text operators: decontamination, repetition filters,
document-frequency n-gram audit (operators/textops.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from picovdb_spark.operators.textops import decontaminate, repetition_stats, top_ngrams
from picovdb_spark.plans import explain_str


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "completely different words nothing shared here at all folks"),
        (3, "spam spam spam spam spam spam spam spam"),
        (4, "a b a b a b a b a b"),
        (5, ""),
        (6, "solo"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_exact_ngram_overlap(spark, docs):
    eval_docs = spark.createDataFrame(
        [(100, "quick brown fox jumps over"), (101, "zzz yyy xxx www vvv")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_hits"] for r in decontaminate(docs, eval_docs, n=5).collect()}
    # doc 1 contains the eval 5-gram "quick brown fox jumps over"; no other doc does
    assert got == {1: 1}


def test_decontaminate_counts_distinct_grams(spark):
    train = spark.createDataFrame(
        [(1, "a b c d e f g")], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(9, "a b c d e f")], "doc_id long, text string"
    )
    # train shares two distinct 5-grams with eval: "a b c d e", "b c d e f"
    got = decontaminate(train, ev, n=5).collect()
    assert got[0]["n_hits"] == 2


def test_decontaminate_plan_broadcasts_eval(spark, docs):
    ev = docs.limit(1)
    plan = explain_str(decontaminate(docs, ev, n=3), mode="simple")
    assert "BroadcastHashJoin" in plan, plan
    # train side reaches the broadcast join without an Exchange before it
    assert "SortMergeJoin" not in plan, plan


def test_repetition_stats_values(spark, docs):
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # doc 3: 8 words, 1 distinct -> dup 7/8; bigram "spam spam" covers 7/7
    assert got[3]["dup_word_frac"] == pytest.approx(7 / 8, abs=0)
    assert got[3]["top_bigram_frac"] == pytest.approx(1.0, abs=0)
    assert got[3]["keep"] is False
    # doc 4: "a b" x5 alternating: 10 words 2 distinct; top bigram "a b" 5/9
    assert got[4]["dup_word_frac"] == pytest.approx(0.8, abs=0)
    assert got[4]["top_bigram_frac"] == pytest.approx(5 / 9, abs=0)
    # doc 1: 10 words, 9 distinct ("the" twice), all bigrams unique (1/9)
    assert got[1]["dup_word_frac"] == pytest.approx(1 - 9 / 10, rel=1e-15)
    assert got[1]["keep"] is False  # top_bigram_frac 1/9 > 0.05
    # empty doc: zeros, kept
    assert got[5]["n_words"] == 0 and got[5]["keep"] is True
    # one-word doc: no bigram exists
    assert got[6]["top_bigram_frac"] == 0.0 and got[6]["keep"] is True


def test_repetition_stats_no_shuffle(spark, docs):
    plan = explain_str(repetition_stats(docs), mode="simple")
    assert "Exchange" not in plan, plan


def test_top_ngrams_doc_frequency_not_occurrences(spark, docs):
    got = top_ngrams(docs, n=2, k=3).collect()
    # "spam spam" appears in ONE doc (doc frequency 1) despite 7 occurrences;
    # no bigram spans two docs, so every cnt is 1 and gram-asc breaks ties
    assert [r["cnt"] for r in got] == [1, 1, 1]
    grams = [r["gram"] for r in got]
    assert grams == sorted(grams)
    assert [r["rank"] for r in got] == [1, 2, 3]


def test_keep_best_per_component_rule(spark):
    """Keep = highest score per component; ties break to smallest id;
    singletons always keep."""
    from picovdb_spark.operators.dedup import keep_best_per_component

    comp = spark.createDataFrame(
        [(1, 1, False), (2, 1, True), (3, 1, True), (4, 4, False), (5, 5, False)],
        schema="doc_id long, component_id long, is_dup boolean",
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.1), (5, 0.5)],
        schema="doc_id long, quality double",
    )
    rows = {r["doc_id"]: r["keep"] for r in keep_best_per_component(comp, scores).collect()}
    # component 1: docs 2 and 3 tie at 0.9 -> smallest id (2) keeps
    assert rows == {1: False, 2: True, 3: False, 4: True, 5: True}


def test_keep_best_unscored_docs_survive_and_never_win(spark):
    """A doc missing a quality row must stay in the decision set (LEFT
    join) with NULL score, rank last in its component, and keep only if
    it is a singleton."""
    from picovdb_spark.operators.dedup import keep_best_per_component

    comp = spark.createDataFrame(
        [(1, 1, False), (2, 1, True), (7, 7, False)],
        schema="doc_id long, component_id long, is_dup boolean",
    )
    scores = spark.createDataFrame([(2, 0.1)], schema="doc_id long, quality double")
    out = {r["doc_id"]: (r["keep"], r["quality"]) for r in
           keep_best_per_component(comp, scores).collect()}
    assert set(out) == {1, 2, 7}              # nobody silently dropped
    assert out[2] == (True, 0.1)              # scored doc beats unscored
    assert out[1][0] is False and out[1][1] is None
    assert out[7][0] is True and out[7][1] is None  # unscored singleton keeps


def test_filter_domains_blocklist(spark):
    from picovdb_spark.operators.textops import domain_stats, filter_domains

    docs = spark.createDataFrame(
        [
            (1, "clean doc no links"),
            (2, "spam here http://bad.example/x and more"),
            (3, "good link https://ok.example.org/page"),
            (4, "mixed http://bad.example/y plus https://ok.example.org/z"),
        ],
        schema="doc_id long, text string",
    )
    kept = filter_domains(docs, ["bad.example"])
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]
    stats = {r["domain"]: (r["n_urls"], r["n_docs"]) for r in domain_stats(docs).collect()}
    assert stats == {"bad.example": (2, 2), "ok.example.org": (2, 2)}


def test_repeated_ngram_stats_brute_force(spark):
    from itertools import islice

    from picovdb_spark.operators.textops import repeated_ngram_stats

    rows = [
        (1, "one two three four five six seven"),
        (2, "zzz one two three four five yyy"),       # shares "one two three four five" with 1
        (3, "alpha beta gamma delta epsilon zeta"),   # unique grams only
        (4, "one two three four five"),               # exactly the shared gram, nothing else
        (5, "too short"),                             # < n tokens -> no row
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repeated_ngram_stats(docs, n=5, min_df=2).collect()}

    def grams(t, n=5):
        ws = [w for w in t.lower().split(" ") if w]
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    corpus = {i: grams(t) for i, t in rows}
    df = {}
    for gs in corpus.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    for i, gs in corpus.items():
        if not gs:
            assert i not in got
            continue
        n_rep = sum(1 for g in gs if df[g] >= 2)
        assert got[i]["n_grams"] == len(gs), i
        assert got[i]["n_repeated"] == n_rep, i
        assert got[i]["repeated_frac"] == pytest.approx(n_rep / len(gs), abs=0)


def test_repeated_ngram_stats_min_df(spark):
    from picovdb_spark.operators.textops import repeated_ngram_stats

    docs = spark.createDataFrame(
        [(i, "common gram shared by everyone here") for i in range(3)]
        + [(9, "a different two document overlap text"), (10, "a different two document overlap text")],
        "doc_id long, text string",
    )
    # min_df=3: only the 3-way gram set counts as repeated
    got = {r["doc_id"]: r["n_repeated"] for r in repeated_ngram_stats(docs, n=5, min_df=3).collect()}
    assert got[0] > 0 and got[1] > 0 and got[2] > 0
    assert got[9] == 0 and got[10] == 0


def test_profile_kernels_handle_empty_docs(spark):
    """Blank/whitespace-only docs are the expected corpus pathology —
    every ratio kernel must yield zeros, not an ANSI DIVIDE_BY_ZERO
    abort (Spark 4 default) or a NULL that bypasses quality gates."""
    from picovdb_spark.operators.textops import quality_score, token_stats

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a normal little document here")],
        "doc_id long, text string",
    )
    q = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert q[1]["quality"] == 0.0 and q[1]["distinct_ratio"] == 0.0
    assert q[2]["quality"] == 0.0 and q[2]["stopword_ratio"] == 0.0
    assert q[3]["quality"] > 0.0
    ts = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert ts[1]["chars_per_token"] == 0.0
    assert ts[2]["n_tokens"] == 0


# ----------------------------------------------------- weighted_sample (A-ES)


@pytest.fixture(scope="module")
def weighted(spark):
    """210 rows: 10 heavy (w=1.0) + 200 light (w=0.05)."""
    rows = [(f"h{i:02d}", 1.0) for i in range(10)] + [
        (f"l{i:03d}", 0.05) for i in range(200)
    ]
    return spark.createDataFrame(rows, schema="doc_id string, quality double")


def test_weighted_sample_is_weight_proportional(spark, weighted):
    """With a 20x weight ratio, every heavy row should make a k=50 draw
    from 210 (P[miss one heavy] is astronomically small under A-ES), and
    the light rows fill the rest. Deterministic under the fixed salt."""
    from picovdb_spark.operators.textops import weighted_sample

    kept = {r["doc_id"] for r in weighted_sample(weighted, 50).collect()}
    assert len(kept) == 50
    heavies = {d for d in kept if d.startswith("h")}
    assert len(heavies) == 10, sorted(kept)


def test_weighted_sample_deterministic_and_partition_independent(spark, weighted):
    from picovdb_spark.operators.textops import weighted_sample

    a = sorted(map(tuple, weighted_sample(weighted, 25).collect()))
    b = sorted(map(tuple, weighted_sample(weighted.repartition(7), 25).collect()))
    assert a == b and len(a) == 25


def test_weighted_sample_excludes_nonpositive_and_caps_at_n(spark):
    from picovdb_spark.operators.textops import weighted_sample

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 0.0), ("c", -2.0), ("d", 0.5)],
        schema="doc_id string, quality double",
    )
    kept = {r["doc_id"] for r in weighted_sample(df, 100).collect()}
    assert kept == {"a", "d"}  # k > n keeps every positive-weight row
    with pytest.raises(ValueError, match="k must be positive"):
        weighted_sample(df, 0)


def test_weighted_sample_plan_is_partial_topk(spark, weighted):
    """Plan pin: global top-k must be TakeOrderedAndProject (partition-
    local partial top-k, driver merges k rows/partition) — never a
    single-partition global sort."""
    from picovdb_spark.operators.textops import weighted_sample

    plan = explain_str(weighted_sample(weighted.repartition(8), 10), mode="simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_weighted_sample_prefix_nested(spark, weighted):
    """A-ES with fixed deterministic keys is a PRIORITY sample: the k-row
    sample is always a prefix of the (k+m)-row sample, so growing a
    corpus budget never un-picks a document (stable curation decisions
    across budget changes)."""
    from picovdb_spark.operators.textops import weighted_sample

    s10 = {r["doc_id"] for r in weighted_sample(weighted, 10).collect()}
    s25 = {r["doc_id"] for r in weighted_sample(weighted, 25).collect()}
    s50 = {r["doc_id"] for r in weighted_sample(weighted, 50).collect()}
    assert s10 < s25 < s50


def test_decontaminate_min_hits_and_frac(spark):
    # doc 1: 3 distinct 5-grams, 2 shared (frac 2/3); doc 2: many grams, 1 shared
    train = spark.createDataFrame(
        [(1, "a b c d e f g"),
         (2, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 a b c d e")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(9, "a b c d e f")], "doc_id long, text string")
    base = {r["doc_id"]: r["n_hits"] for r in decontaminate(train, ev, n=5).collect()}
    assert base == {1: 2, 2: 1}
    # min_hits=2 drops doc 2
    got = {r["doc_id"] for r in decontaminate(train, ev, n=5, min_hits=2).collect()}
    assert got == {1}
    # min_frac: doc 1 has 3 grams (2/3 = 0.666667), doc 2 has 11 (1/11 ~ 0.09)
    rows = {r["doc_id"]: r for r in decontaminate(train, ev, n=5, min_frac=0.5).collect()}
    assert set(rows) == {1}
    assert rows[1]["n_grams"] == 3 and rows[1]["n_hits"] == 2
    assert abs(rows[1]["hit_frac"] - round(2 / 3, 6)) < 1e-9
    # min_frac=0.0 keeps the any-overlap row set but adds the audit columns
    all_rows = {r["doc_id"]: r for r in decontaminate(train, ev, n=5, min_frac=0.0).collect()}
    assert set(all_rows) == {1, 2}
    assert all_rows[2]["n_grams"] == 11


def test_pii_redact_spans_and_counts(spark):
    """pii_redact replaces each matched span with its typed tag and
    counts spans; clean docs pass through byte-identical; null text
    redacts to ''. Progressive rewriting: a span consumed by an earlier
    pattern is not re-counted by a later one."""
    from picovdb_spark.operators.textops import pii_redact

    docs = spark.createDataFrame(
        [
            (1, "mail me at a.b@test.org or call 555-123-4567 ok"),
            (2, "ssn 123-45-6789 from 10.0.0.1"),
            (3, "nothing sensitive here"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert rows[1]["text_redacted"] == "mail me at [email] or call [phone] ok"
    assert rows[1]["n_redacted"] == 2
    assert rows[2]["text_redacted"] == "ssn [ssn] from [ipv4]"
    assert rows[2]["n_redacted"] == 2
    assert rows[3]["text_redacted"] == "nothing sensitive here"
    assert rows[3]["n_redacted"] == 0
    assert rows[4]["text_redacted"] == "" and rows[4]["n_redacted"] == 0
    # custom tag format + custom pattern set
    one = pii_redact(
        docs.filter("doc_id = 2"),
        patterns={"ssn": "[0-9]{3}-[0-9]{2}-[0-9]{4}"},
        tag_format="<{name}>",
    ).collect()[0]
    assert one["text_redacted"] == "ssn <ssn> from 10.0.0.1"
    assert one["n_redacted"] == 1


def test_pii_redact_idempotent_under_default_patterns(spark):
    """Fixed-point contract (docstring): redacting already-redacted
    text is a no-op under the default patterns × tags — no rendered
    tag matches any pattern, so the second pass rewrites nothing and
    counts zero. Pins the defaults against a future pattern whose
    language could match a tag like '[email]'."""
    from picovdb_spark.operators.textops import pii_redact

    docs = spark.createDataFrame(
        [
            (1, "a.b@test.org 555-123-4567 123-45-6789 10.0.0.1"),
            (2, "mixed: x@y.io then [email] literal and 1.2.3.4"),
            (3, "clean text"),
        ],
        "doc_id long, text string",
    )
    first = pii_redact(docs)
    second = pii_redact(first, text_col="text_redacted")
    f = {r["doc_id"]: r for r in first.collect()}
    s = {r["doc_id"]: r for r in second.collect()}
    for did in f:
        assert s[did]["text_redacted"] == f[did]["text_redacted"]
        assert s[did]["n_redacted"] == 0


def test_pii_redact_tag_with_regex_replacement_metachars(spark):
    """'$' and '\\' in a custom tag are literals in the output, not
    Java Matcher group references/escapes — '<$name>' or '$1' in a
    tag must neither corrupt the text nor throw."""
    from picovdb_spark.operators.textops import pii_redact

    docs = spark.createDataFrame(
        [(1, "reach a.b@test.org now")], "doc_id long, text string"
    )
    dollar = pii_redact(docs, tag_format="<${name}$1>").collect()[0]
    assert dollar["text_redacted"] == "reach <$email$1> now"
    backslash = pii_redact(docs, tag_format="\\{name}\\").collect()[0]
    assert backslash["text_redacted"] == "reach \\email\\ now"


def test_decontaminate_prefilter_identical_values(spark):
    """The token-overlap prefilter (r9 verdict #4: the LSH-verify
    prefilter pattern applied to the decontaminate gate) changes NO
    values — it prunes only docs provably unable to share a gram.
    Covers the tripwire cases: a doc sharing tokens but no full n-gram
    (must survive the prune and still score 0 hits → absent either
    way), a disjoint doc (pruned), contaminated docs (identical
    hits/fractions), and min_frac mode (n_grams denominator comes from
    the surviving doc's own shingles)."""
    train = spark.createDataFrame(
        [
            (1, "a b c d e f g"),        # shares grams with eval
            (2, "e a c b d f"),          # shares TOKENS only, no 5-gram
            (3, "x y z w v u t"),        # token-disjoint: pruned
            (4, "q r s a b c d e t u"),  # one shared gram, long doc
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(9, "a b c d e f")], "doc_id long, text string")
    for kw in ({}, {"min_frac": 0.3}):
        with_pf = {
            r["doc_id"]: r.asDict()
            for r in decontaminate(train, ev, n=5, prefilter=True, **kw).collect()
        }
        without = {
            r["doc_id"]: r.asDict()
            for r in decontaminate(train, ev, n=5, prefilter=False, **kw).collect()
        }
        assert with_pf == without, (kw, with_pf, without)
    base = {r["doc_id"]: r["n_hits"] for r in decontaminate(train, ev, n=5).collect()}
    assert base == {1: 2, 4: 1}
    # cap guard: an over-cap eval token set disables the prune, values hold
    capped = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(train, ev, n=5, prefilter_max_tokens=2).collect()
    }
    assert capped == base
    # broadcast_eval=False declares a too-big-to-collect eval set: the
    # prune must not arm (no eager token job), values still identical
    unbroadcast = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(train, ev, n=5, broadcast_eval=False).collect()
    }
    assert unbroadcast == base


def test_stopword_hits_token_equality_on_newline_terminated_text(spark):
    """The regexp stopword counter must match TOKEN equality exactly —
    Java's $ matches before a trailing line terminator, so '(?= |$)'
    would count "...the\\n" as a hit even though the token is "the\\n"
    (review catch, r10: the pattern must end with \\z). Pinned against
    the filter-lambda reference form on newline/CRLF-terminated text."""
    from pyspark.sql import functions as F

    from picovdb_spark.functions.text import STOPWORDS
    from picovdb_spark.operators.textops import _stopword_hits

    docs = spark.createDataFrame(
        [
            (1, "see the\n"),          # trailing \n glued to a stopword
            (2, "the\r\nfox and the\r\n"),
            (3, "the quick fox"),       # clean hits front and mid
            (4, "of and to"),           # all hits, no terminator
            (5, "cathedral offline"),   # substrings must not match
        ],
        "doc_id long, text string",
    )
    t = F.filter(F.split(F.lower(F.col("text")), " "), lambda x: x != "")
    arr = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    reference = F.size(F.filter(t, lambda x: F.array_contains(arr, x)))
    rows = docs.select(
        "doc_id",
        _stopword_hits(F.col("text"), STOPWORDS["en"]).alias("got"),
        reference.alias("want"),
    ).collect()
    assert {r["doc_id"]: r["got"] for r in rows} == {
        r["doc_id"]: r["want"] for r in rows
    }
    assert {r["doc_id"]: r["want"] for r in rows} == {1: 0, 2: 1, 3: 1, 4: 3, 5: 0}


def test_stopword_hits_empty_word_list_null_semantics(spark):
    """_stopword_hits([]) must keep the non-empty path's NULL contract:
    NULL text -> NULL, non-NULL text -> 0 (advisor catch, r10 — the old
    unconditional lit(0) made the empty list the one exception)."""
    from pyspark.sql import functions as F

    from picovdb_spark.operators.textops import _stopword_hits

    docs = spark.createDataFrame(
        [(1, "some text"), (2, None)], "doc_id long, text string"
    )
    rows = docs.select(
        "doc_id", _stopword_hits(F.col("text"), []).alias("hits")
    ).collect()
    got = {r["doc_id"]: r["hits"] for r in rows}
    assert got == {1: 0, 2: None}


def test_decontaminate_prefilter_no_eager_job_when_unbroadcast(spark):
    """broadcast_eval=False is the caller's declaration that the eval
    set can't be collected — decontaminate(prefilter=True) must build a
    PURELY LAZY plan on that path: zero Spark jobs at call time (r10
    verdict #7: the no-eager-job contract, pinned not just documented).
    Positive control: the broadcast path DOES run its one bounded
    collect job."""
    from picovdb_spark.operators.textops import decontaminate

    train = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "h i j k l m n")], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    sc = spark.sparkContext

    sc.setJobGroup("decon_lazy", "plan-only")
    try:
        df = decontaminate(train, ev, n=5, prefilter=True, broadcast_eval=False)
        lazy_jobs = sc.statusTracker().getJobIdsForGroup("decon_lazy")
    finally:
        sc.setJobGroup(None, None)
    assert lazy_jobs == [], f"plan construction launched jobs: {lazy_jobs}"
    # the deferred plan still computes the right answer when acted on
    assert {r["doc_id"]: r["n_hits"] for r in df.collect()} == {1: 1}

    sc.setJobGroup("decon_eager", "prefilter-collect")
    try:
        decontaminate(train, ev, n=5, prefilter=True, broadcast_eval=True)
        eager_jobs = sc.statusTracker().getJobIdsForGroup("decon_eager")
    finally:
        sc.setJobGroup(None, None)
    assert eager_jobs != [], "broadcast prefilter should run its bounded collect"
