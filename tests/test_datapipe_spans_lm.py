"""Round-5 training-data ops: exact duplicated-span accounting and
unigram-LM quality scoring — each differential-tested against an
independent pure-Python reference (the datapipe oracle stance: value
checks, never just row counts)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from logstash_spark.datapipe import dedup, textstats


# --------------------------------------------------------- references
def _ref_span_stats(rows, k, min_occ, cross_doc):
    occ: Counter = Counter()
    docs_per: dict[str, set] = defaultdict(set)
    wins_per_doc: dict[int, list[str]] = {}
    for did, text in rows:
        ws = re.split(r"\s+", text.strip()) if text and text.strip() else []
        wins = (
            [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]
            if len(ws) >= k
            else []
        )
        wins_per_doc[did] = wins
        for s in wins:
            occ[s] += 1
            docs_per[s].add(did)
    out = {}
    for did, wins in wins_per_doc.items():
        dup = sum(
            1
            for s in wins
            if (len(docs_per[s]) if cross_doc else occ[s]) >= min_occ
        )
        out[did] = (len(wins), dup, dup / len(wins) if wins else 0.0)
    return out


def _ref_unigram(rows, score_rows=None, alpha=1.0, min_count=1):
    def toks(t):
        return [w for w in re.split(r"\s+", t.lower().strip()) if w] if t else []

    cnt: Counter = Counter()
    for _, t in rows:
        cnt.update(toks(t))
    vocab = {w: c for w, c in cnt.items() if c >= min_count}
    t_total = sum(vocab.values())
    denom = t_total + alpha * (len(vocab) + 1)
    out = {}
    for did, t in score_rows if score_rows is not None else rows:
        ws = toks(t)
        if not ws:
            out[did] = (0, None, None)
            continue
        mean_lp = sum(
            math.log((vocab.get(w, 0) + alpha) / denom) for w in ws
        ) / len(ws)
        out[did] = (len(ws), mean_lp, math.exp(-mean_lp))
    return out


# ------------------------------------------------------------ fixtures
BOILER = "all rights reserved contact us about privacy terms of service"

SPAN_ROWS = [
    (0, f"alpha beta gamma delta {BOILER} epsilon zeta eta theta iota"),
    (1, f"one two three four {BOILER} five six seven eight nine ten"),
    (2, "entirely unique text with no repeated span content whatsoever here"),
    (3, "loop loop loop loop loop loop loop loop loop loop loop loop"),
    (4, "short doc"),  # shorter than k: no windows
    (5, None),  # null text: no windows
]


@pytest.fixture(scope="module")
def span_docs(spark):
    return spark.createDataFrame(SPAN_ROWS, "doc_id long, text string")


# ---------------------------------------------------- duplicated spans
@pytest.mark.parametrize("cross_doc", [False, True])
def test_duplicated_span_stats_matches_reference(spark, span_docs, cross_doc):
    k = 8
    got = {
        r.doc_id: (r.total_windows, r.dup_windows, r.dup_frac)
        for r in dedup.duplicated_span_stats(
            span_docs, span_k=k, cross_doc_only=cross_doc
        ).collect()
    }
    dedup.release_dedup_caches()
    want = _ref_span_stats(SPAN_ROWS, k, 2, cross_doc)
    want[5] = (0, 0, 0.0)  # null text: no windows, zero-filled
    assert set(got) == set(want)
    for did in want:
        tw, dw, frac = want[did]
        assert got[did][0] == tw and got[did][1] == dw, (did, got[did], want[did])
        assert got[did][2] == pytest.approx(frac, abs=1e-12)
    # semantics spot-checks: doc 3 is pure self-repetition — every
    # window duplicated corpus-wide, NONE under cross-doc-only; docs
    # 0/1 share only the boilerplate run
    if cross_doc:
        assert got[3][1] == 0
        assert 0 < got[0][1] < got[0][0]
    else:
        assert got[3] == (got[3][0], got[3][0], 1.0)
    assert got[2] == (got[2][0], 0, 0.0)
    assert got[4] == (0, 0, 0.0)


def test_top_duplicated_spans(spark, span_docs):
    out = dedup.top_duplicated_spans(span_docs, span_k=8, limit=5).collect()
    assert out, "boilerplate must surface"
    # the hottest span: doc 3's 12x 'loop' yields 5 windows of the same
    # span ('loop'*8) → n_occ 5 from ONE doc; the shared boilerplate
    # run appears in 2 docs
    top = out[0]
    assert top.span == " ".join(["loop"] * 8)
    assert top.n_occ == 5 and top.n_docs == 1
    cross = [r for r in out if r.n_docs == 2]
    assert cross and all(r.span in BOILER for r in cross)


def test_duplicated_span_skew_linear(spark):
    # 500 identical docs: the hot span hash is ONE groupBy key and the
    # join fans out 500 rows per window — linear, no pair join anywhere
    base = "repeated boilerplate sentence that every single page carries today"
    df = spark.createDataFrame(
        [(i, base) for i in range(500)] + [(999, "one unique document body")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.dup_frac for r in
           dedup.duplicated_span_stats(df, span_k=8).collect()}
    dedup.release_dedup_caches()
    assert got[0] == 1.0 and got[499] == 1.0
    assert got[999] == 0.0


# ------------------------------------------------------- unigram LM
LM_ROWS = [
    (0, "the cat sat on the mat and the dog sat too"),
    (1, "the dog ran over the hill and the cat ran home"),
    (2, "Zyzzyva quokka axolotl wombat capybara pangolin"),  # rare words
    (3, "the the the the the"),  # max-likelihood tokens
    (4, ""),  # empty: null score
]


def test_unigram_logprob_matches_reference(spark):
    df = spark.createDataFrame(LM_ROWS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.mean_logprob, r.perplexity)
        for r in textstats.unigram_logprob(df).collect()
    }
    dedup.release_dedup_caches()  # self-trained vocab cache
    want = _ref_unigram(LM_ROWS)
    assert set(got) == set(want)
    for did, (n, lp, ppl) in want.items():
        assert got[did][0] == n
        if lp is None:
            assert got[did][1] is None and got[did][2] is None
        else:
            assert got[did][1] == pytest.approx(lp, rel=1e-9)
            assert got[did][2] == pytest.approx(ppl, rel=1e-9)
    # gibberish scores worse than common-word prose; stopword soup best
    assert got[2][1] < got[0][1] < got[3][1]


def test_unigram_logprob_heldout_vocab_and_pruning(spark):
    train = spark.createDataFrame(LM_ROWS[:2], "doc_id long, text string")
    score = spark.createDataFrame(LM_ROWS[2:4], "doc_id long, text string")
    vocab = textstats.unigram_vocab(train, min_count=2)
    got = {
        r.doc_id: (r.n_tokens, r.mean_logprob)
        for r in textstats.unigram_logprob(score, vocab=vocab).collect()
    }
    want = _ref_unigram(LM_ROWS[:2], score_rows=LM_ROWS[2:4], min_count=2)
    for did in got:
        assert got[did][0] == want[did][0]
        assert got[did][1] == pytest.approx(want[did][1], rel=1e-9)
    # doc 2 is 100% OOV under the held-out vocab: every token takes the
    # reserved smoothing slot, so its mean logprob is exactly log(alpha/denom)
    tv = vocab.agg(F.sum("cnt"), F.count(F.lit(1))).collect()[0]
    denom = float(tv[0]) + 1.0 * (tv[1] + 1)
    assert got[2][1] == pytest.approx(math.log(1.0 / denom), rel=1e-9)


# ------------------------------------- Gopher-style repetition signals
def _ref_repetition(rows):
    out = {}
    for did, text in rows:
        ws = [w for w in re.split(r"\s+", text.strip().lower()) if w] if text else []
        dwf = 1.0 - len(set(ws)) / len(ws) if ws else 0.0
        grams = [f"{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1)]
        cnt = Counter(grams)
        tot = sum(c * len(g) for g, c in cnt.items())
        best = max((c * len(g) for g, c in cnt.items()), default=0)
        dup = sum(c * len(g) for g, c in cnt.items() if c > 1)
        out[did] = (
            round(dwf, 6),
            round(best / tot, 6) if tot else 0.0,
            round(dup / tot, 6) if tot else 0.0,
        )
    return out


REP_ROWS = [
    (0, "a b a b a"),          # grams a-b x2, b-a x2: all duplicated
    (1, ""),                   # empty text
    (2, "solo"),               # one word: no grams
    (3, "x y z"),              # unique grams
    (4, "aa aa aa"),           # single repeated gram
    (5, "the cat sat on the mat the cat sat again"),
    (6, "  padded   whitespace \t tokens  "),
]


def test_repetition_stats_matches_reference(spark):
    df = spark.createDataFrame(REP_ROWS, "doc_id long, text string")
    got = {
        r.doc_id: (r.dup_word_frac, r.top_2gram_char_frac, r.dup_2gram_char_frac)
        for r in textstats.repetition_stats(df).collect()
    }
    assert got == _ref_repetition(REP_ROWS)


def test_repetition_stats_documents_table(spark, sf_dir="/root/testdata/sf0.001"):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    got = {
        r.doc_id: (r.dup_word_frac, r.top_2gram_char_frac, r.dup_2gram_char_frac)
        for r in textstats.repetition_stats(docs).collect()
    }
    assert got == _ref_repetition(rows)
    # word-soup corpus: repetition must actually vary, not be degenerate
    assert len({v[1] for v in got.values()}) > 10


# ---------------------------------------------- benchmark decontamination
def _ref_decontaminate(rows, bench_texts, k):
    def wins(text):
        ws = re.split(r"\s+", text.strip()) if text and text.strip() else []
        return [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]

    bench = {w for t in bench_texts for w in wins(t)}
    out = {}
    for did, text in rows:
        w = wins(text)
        hits = sum(1 for x in w if x in bench)
        out[did] = (len(w), hits, hits > 0)
    return out


def test_decontaminate_matches_reference(spark):
    k = 5
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta"),   # contains bench span
        (1, "one two three four five six"),               # clean
        (2, "alpha beta gamma delta"),                    # < k words: no window
        (3, "x alpha beta gamma delta epsilon y"),        # bench span embedded
        (4, ""),                                          # empty
    ]
    bench_texts = ["alpha beta gamma delta epsilon", "unused bench words here now"]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(t,) for t in bench_texts], "text string")

    got = {
        r.doc_id: (r.n_windows, r.n_contaminated, r.contaminated)
        for r in dedup.decontaminate(df, bench, span_k=k).collect()
    }
    assert got == _ref_decontaminate(rows, bench_texts, k)

    clean = dedup.decontaminate(df, bench, span_k=k, drop=True)
    assert set(clean.columns) == {"doc_id", "text"}
    assert {r.doc_id for r in clean.collect()} == {1, 2, 4}


def test_decontaminate_documents_table(spark):
    """Planted-duplicate groups in the synthetic table: using a slice of
    the corpus as the 'benchmark' must flag exactly the docs sharing a
    13-gram with it (their duplicates), per the pure-Python reference."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 17 == 0).select("text")
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    bench_texts = [r.text for r in docs.filter(F.col("doc_id") % 17 == 0).collect()]
    got = {
        r.doc_id: (r.n_windows, r.n_contaminated, r.contaminated)
        for r in dedup.decontaminate(docs, bench).collect()
    }
    want = _ref_decontaminate(rows, bench_texts, 13)
    assert got == want
    # the benchmark slice itself is trivially contaminated; at least one
    # NON-member (a planted duplicate) must be flagged too
    flagged = {d for d, (_, _, c) in got.items() if c}
    assert any(d % 17 != 0 for d in flagged)


# ----------------------------------------------------------- dedup_lines
def _ref_dedup_lines(rows, min_chars=1, sep="\n"):
    """Greedy single pass in (doc, position) order — the definitional
    form of 'keep the first occurrence corpus-wide'."""
    seen: set = set()
    out = {}
    for doc_id, text in sorted(rows):
        if text is None:
            out[doc_id] = (None, 0, 0)
            continue
        lines = text.split(sep)
        kept = []
        removed = 0
        for ln in lines:
            if len(ln) < min_chars:
                kept.append(ln)
            elif ln in seen:
                removed += 1
            else:
                seen.add(ln)
                kept.append(ln)
        out[doc_id] = (sep.join(kept), len(lines), removed)
    return out


def test_dedup_lines_hand_cases(spark):
    rows = [
        (1, "alpha line\nshared boilerplate\nunique one"),
        (2, "shared boilerplate\nbeta line\n\nbeta line"),
        (3, None),
        (4, ""),
        (5, "alpha line"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup.dedup_lines(df).collect()}
    assert got[1]["text"] == rows[0][1] and got[1]["n_removed"] == 0
    # doc 2 loses the cross-doc dup AND its own within-doc repeat;
    # the empty line (< min_chars) survives both occurrences
    assert got[2]["text"] == "beta line\n"
    assert got[2]["n_lines"] == 4 and got[2]["n_removed"] == 2
    assert got[3]["text"] is None and got[3]["n_lines"] == 0
    assert got[4]["text"] == "" and got[4]["n_removed"] == 0
    assert got[5]["text"] == "" and got[5]["n_removed"] == 1
    assert got[5]["n_lines"] == 1


def test_dedup_lines_matches_reference(spark):
    import random

    rng = random.Random(7)
    pool = [f"sentence number {i} with some words" for i in range(40)]
    rows = []
    for d in range(300):
        n = rng.randint(0, 8)
        lines = [rng.choice(pool) if rng.random() < 0.6
                 else f"unique {d}-{j} {rng.randint(0, 9)}"
                 for j in range(n)]
        if rng.random() < 0.1:
            lines.insert(rng.randrange(len(lines) + 1), "")
        rows.append((d, "\n".join(lines) if lines else ""))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
           for r in dedup.dedup_lines(df).collect()}
    want = _ref_dedup_lines(rows)
    assert got == want


def test_dedup_lines_hot_key_stays_aggregate(spark):
    """1 000 docs sharing one boilerplate line: the first-occurrence
    pick is a partial-aggregating groupBy (no per-key window sort) and
    exactly one copy survives."""
    rows = [(d, f"only doc {d} says this\nEVERY PAGE HAS THIS FOOTER")
            for d in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.dedup_lines(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # min(struct) aggregate, not row_number
    survivors = out.filter(
        F.col("text").contains("FOOTER")).select("doc_id").collect()
    assert [r["doc_id"] for r in survivors] == [0]
    assert out.filter(F.col("n_removed") == 1).count() == 999
