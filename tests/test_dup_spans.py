"""duplicated_spans: hand-checked coverage, a brute-force Python
reference over randomized docs, edge cases (short docs, within-doc
repeats, full-doc duplicates), and the no-forced-broadcast plan shape."""

import random

import pytest
from pyspark.sql import functions as F

from htrc_feature_reader_spark.operators.dedup import duplicated_spans


def _brute(texts, n, min_count):
    """Reference: count window occurrences, mark covered positions."""
    docs = {i: t.split(" ") for i, t in texts.items()}
    from collections import Counter

    cnt = Counter()
    for words in docs.values():
        for i in range(max(len(words) - n + 1, 0)):
            cnt[" ".join(words[i : i + n])] += 1
    out = {}
    for i, words in docs.items():
        covered = set()
        for p in range(max(len(words) - n + 1, 0)):
            if cnt[" ".join(words[p : p + n])] >= min_count:
                covered.update(range(p, p + n))
        out[i] = (len(words), len(covered))
    return out


def _run(spark, texts, n=4, min_count=2):
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    rows = duplicated_spans(df, n=n, min_count=min_count).collect()
    return {r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_frac) for r in rows}


def test_hand_checked(spark):
    texts = {
        # docs 0 and 1 share "a b c d" at different positions; doc 2 clean
        0: "a b c d x y z w",
        1: "p q a b c d r s",
        2: "only unique tokens here nothing repeats at all",
        3: "t",  # shorter than n: zero windows, zero coverage
    }
    got = _run(spark, texts, n=4)
    assert got[0] == (8, 4, 0.5)
    assert got[1] == (8, 4, 0.5)
    assert got[2] == (8, 0, 0.0)
    assert got[3] == (1, 0, 0.0)


def test_overlapping_spans_merge(spark):
    # "a b c d e" appears twice -> two overlapping 4-windows each, but
    # coverage per doc is the merged 5 tokens, not 4+4
    texts = {0: "a b c d e x x1 x2", 1: "y y1 y2 a b c d e"}
    got = _run(spark, texts, n=4)
    assert got[0] == (8, 5, 5 / 8)
    assert got[1] == (8, 5, 5 / 8)


def test_within_doc_repeat_counts(spark):
    # the repeated window lives entirely inside ONE doc
    texts = {0: "a b c d z a b c d", 1: "nothing shared here at all ok"}
    got = _run(spark, texts, n=4)
    assert got[0][1] == 8  # positions 0-3 and 5-8; the middle "z" is not covered
    assert got[1][1] == 0


def test_full_duplicate_docs(spark):
    texts = {0: "w1 w2 w3 w4 w5 w6", 1: "w1 w2 w3 w4 w5 w6"}
    got = _run(spark, texts, n=4)
    assert got[0] == (6, 6, 1.0)
    assert got[1] == (6, 6, 1.0)


@pytest.mark.parametrize("n,min_count", [(3, 2), (4, 2), (4, 3)])
def test_matches_brute_force(spark, n, min_count):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = {}
    for i in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
        texts[i] = " ".join(words)
    got = _run(spark, texts, n=n, min_count=min_count)
    ref = _brute(texts, n, min_count)
    for i in texts:
        n_tok, cov = ref[i]
        # splitting "" yields [""] (1 empty word) on both engines
        exp_tok = max(n_tok, 1)
        assert got[i][0] == exp_tok, (i, got[i], ref[i])
        assert got[i][1] == cov, (i, got[i], ref[i])


def test_validation(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_count"):
        duplicated_spans(df, min_count=1)
    with pytest.raises(ValueError, match="n must"):
        duplicated_spans(df, n=0)


def test_no_forced_broadcast(spark):
    df = spark.createDataFrame(
        [(i, "a b c d e") for i in range(4)], "doc_id long, text string"
    )
    plan = (
        duplicated_spans(df)._jdf.queryExecution().logical().toString()
    )
    assert "ResolvedHint" not in plan  # unbounded shingle space: AQE decides


# ---------------------------------------------------------------------------
# remove_duplicate_spans

from htrc_feature_reader_spark.operators.dedup import remove_duplicate_spans


def _brute_remove(texts, n, min_count):
    """Reference: rank occurrences per window globally by (id, pos);
    non-first occurrences of windows with count >= min_count mark their
    positions; removal wins."""
    from collections import defaultdict

    docs = {i: t.split(" ") for i, t in sorted(texts.items())}
    occs = defaultdict(list)
    for i, words in docs.items():
        for p in range(max(len(words) - n + 1, 0)):
            occs[" ".join(words[p : p + n])].append((i, p))
    removed = defaultdict(set)
    for lst in occs.values():
        if len(lst) >= min_count:
            for i, p in sorted(lst)[1:]:
                removed[i].update(range(p, p + n))
    out = {}
    for i, words in docs.items():
        kept = [w for p, w in enumerate(words) if p not in removed[i]]
        out[i] = (" ".join(kept), len(words), len(words) - len(kept))
    return out


def _run_remove(spark, texts, n=4, min_count=2):
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    rows = remove_duplicate_spans(df, n=n, min_count=min_count).collect()
    return {r.doc_id: (r.text, r.n_tokens, r.n_removed) for r in rows}


def test_remove_keeps_first_occurrence(spark):
    texts = {
        0: "a b c d x y z w",       # first occurrence (doc 0 < doc 1): kept
        1: "p q a b c d r s",       # later occurrence: removed
        2: "clean doc with its own words here",
    }
    got = _run_remove(spark, texts, n=4)
    assert got[0] == ("a b c d x y z w", 8, 0)
    assert got[1] == ("p q r s", 8, 4)
    assert got[2][2] == 0


def test_remove_full_duplicate_doc_empties(spark):
    texts = {0: "w1 w2 w3 w4 w5", 1: "w1 w2 w3 w4 w5"}
    got = _run_remove(spark, texts, n=4)
    assert got[0] == ("w1 w2 w3 w4 w5", 5, 0)
    assert got[1] == ("", 5, 5)


def test_remove_within_doc_repeat(spark):
    # second in-doc occurrence removed, first kept
    texts = {0: "a b c d z a b c d"}
    got = _run_remove(spark, texts, n=4)
    assert got[0] == ("a b c d z", 9, 4)


def test_remove_roundtrips_clean_docs_byte_identically(spark):
    texts = {0: "solo  doc with  double  spaces preserved", 1: "x"}
    got = _run_remove(spark, texts, n=4)
    assert got[0][0] == texts[0]
    assert got[1][0] == texts[1]


@pytest.mark.parametrize("n,min_count", [(3, 2), (4, 2), (4, 3)])
def test_remove_matches_brute_force(spark, n, min_count):
    rng = random.Random(19)
    vocab = [f"w{i}" for i in range(25)]
    texts = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 22)))
        for i in range(35)
    }
    got = _run_remove(spark, texts, n=n, min_count=min_count)
    ref = _brute_remove(texts, n, min_count)
    for i in texts:
        assert got[i] == ref[i], (i, got[i], ref[i])
