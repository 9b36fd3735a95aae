"""Boundary/property pins for blocked_ngram_jaccard_pairs after the
r10 PPJoin prefix-filter rewrite.

The oracle gate proves Spark==DuckDB on the fixture corpus at two
sfs; these prove the DEFINITION on adversarial shapes the fixture may
never hit: an exact-threshold pair (J == t must be KEPT — the filter
is inclusive), prefix-filter no-miss on a corpus crafted so prefixes
are maximally unlucky, and blocking semantics (equal grams in a
different block must NOT pair).  ngram_n=1 makes gram sets fully
controllable (grams == distinct chars).
"""

from __future__ import annotations

import itertools
import random

from kinesis_s3_data_shipper_spark.operators.dedup import (
    blocked_ngram_jaccard_pairs)

T = 0.6


def _pairs(spark, rows, threshold=T, n=1):
    df = spark.createDataFrame(rows, "doc_id long, blk string, text string")
    out = blocked_ngram_jaccard_pairs(
        df, id_col="doc_id", text_col="text", block_cols=["blk"],
        ngram_n=n, threshold=threshold)
    return {(r.doc_a, r.doc_b): r.jaccard for r in out.collect()}


def _brute(rows, threshold=T):
    """Reference all-pairs over distinct-char gram sets."""
    want = {}
    for (ia, ba, ta), (ib, bb, tb) in itertools.combinations(rows, 2):
        if ba != bb:
            continue
        a, b = min(ia, ib), max(ia, ib)
        ga, gb = set(ta if a == ia else tb), set(tb if a == ia else ta)
        j = len(ga & gb) / len(ga | gb)
        if j >= threshold:
            want[(a, b)] = j
    return want


def test_exact_threshold_pair_is_kept(spark):
    """J == t exactly (|A∩B|=3, |A∪B|=5 at t=0.6): the >= filter is
    inclusive, and the prefix filter must not have dropped the
    candidate — the boundary where an off-by-one prefix (the IEEE
    ceil hazard the 1e-9 nudge guards) would first show."""
    rows = [(1, "x", "abcde"), (2, "x", "abc")]
    got = _pairs(spark, rows)
    assert got == {(1, 2): 0.6}


def test_blocking_prevents_cross_block_pairs(spark):
    """Identical gram sets in different blocks never pair; the same
    pair inside one block does."""
    rows = [(1, "x", "abcde"), (2, "y", "abcde"), (3, "x", "abcde")]
    got = _pairs(spark, rows)
    assert set(got) == {(1, 3)} and got[(1, 3)] == 1.0


def test_no_miss_on_seeded_random_corpus(spark):
    """Every qualifying pair of a seeded random corpus is found, and
    nothing below threshold leaks through — the operator vs an
    in-process brute force (a third implementation, independent of
    both engines' oracle pair)."""
    rng = random.Random(42)
    alphabet = "abcdefghijklmnop"
    rows = []
    for i in range(60):
        k = rng.randint(3, 10)
        rows.append((i, rng.choice("xy"),
                     "".join(sorted(rng.sample(alphabet, k)))))
    # plant exact near-dups and threshold-straddlers
    rows += [(100, "x", "abcdefgh"), (101, "x", "abcdefgh"),   # J=1
             (102, "x", "abcdefghij"), (103, "x", "abcdefg")]  # J=0.7
    got = _pairs(spark, rows)
    want = _brute(rows)
    assert set(got) == set(want), (
        set(want) - set(got), set(got) - set(want))
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_no_miss_across_thresholds_where_filters_bite(spark):
    """r10b added PPJoin's length + positional filters to the
    candidate join.  Their pruning power grows with t (prefixes
    shrink, alpha approaches s), so a wrong alpha or an off-by-one in
    the positional bound drops true pairs FIRST at high thresholds —
    sweep t over the range where the filters go from lazy to
    aggressive, against the in-process brute force."""
    rng = random.Random(7)
    alphabet = "abcdefghijklmnop"
    rows = []
    for i in range(50):
        k = rng.randint(3, 12)
        rows.append((i, "x", "".join(sorted(rng.sample(alphabet, k)))))
    # planted gradations: J = 1, 11/12, 6/7, 3/4, 2/3
    rows += [(200, "x", "abcdefghijkl"), (201, "x", "abcdefghijkl"),
             (202, "x", "abcdefghijk"),   # vs 200: J = 11/12
             (203, "x", "abcdefghijmn"),  # vs 200: J = 10/14 = 5/7
             (204, "x", "abcdefgh"),      # vs 200: J = 8/12 = 2/3
             ]
    for t in (0.6, 0.7, 0.75, 0.8, 0.9, 0.95, 1.0):
        got = _pairs(spark, rows, threshold=t)
        want = _brute(rows, threshold=t)
        assert set(got) == set(want), (
            t, set(want) - set(got), set(got) - set(want))


def test_duplication_heavy_corpus_matches_brute_force(spark):
    """The r10c exact-dup collapse routes verbatim copies around the
    PPJoin pipeline (group by (block, md5(text)), rep-only join,
    within/cross expansion).  Pin its output equality on the regime
    it exists for: every distinct text present in FIVE verbatim
    copies, so the result is dominated by within-group (J = 1) pairs
    and by cross-group pairs that must inherit their reps' scores —
    including across interleaved doc-id ranges (copies get ids far
    from their originals, exercising the least/greatest ordering)."""
    rng = random.Random(11)
    alphabet = "abcdefghijklmnop"
    texts = []
    for i in range(12):
        k = rng.randint(3, 10)
        texts.append("".join(sorted(rng.sample(alphabet, k))))
    texts += ["abcdefgh", "abcdefg"]  # a planted J=7/8 cross pair
    rows = []
    for copy in range(5):
        for j, txt in enumerate(texts):
            # interleave: copy c of text j gets id c + 5*j + 1000*c
            rows.append((copy * 1000 + j, "x", txt))
    got = _pairs(spark, rows)
    want = _brute(rows)
    assert set(got) == set(want), (
        len(got), len(want),
        set(want) - set(got), set(got) - set(want))
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
    # sanity: the dup groups actually produced within-group pairs
    n_exact = sum(1 for v in want.values() if v == 1.0)
    assert n_exact >= len(texts) * 10  # C(5,2) per distinct text


def test_no_miss_at_unlucky_thresholds(spark):
    """Thresholds that are NOT short decimals (2/3: the computed-
    threshold class the ceil nudge insures) on sets sized to sit at
    the boundary: J = 2/3 exactly must be kept at t = 2/3."""
    rows = [(1, "x", "abcd"), (2, "x", "abc"),    # J = 3/4 >= 2/3
            (3, "x", "ab"),                        # vs 2: J = 2/3
            (4, "x", "xyzu")]                      # J = 0 with all
    got = _pairs(spark, rows, threshold=2 / 3)
    want = _brute(rows, threshold=2 / 3)
    assert set(got) == set(want)
    assert (2, 3) in got  # the exact-2/3 pair survived the prefix
