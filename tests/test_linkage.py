"""Deletion-neighborhood fuzzy matching: exact-recall property vs a
brute-force reference, edit-type coverage, and the no-cartesian plan."""

from __future__ import annotations

import random

from gpu_bdb_spark.operators.linkage import deletion_variants, fuzzy_pairs
from gpu_bdb_spark.plans import formatted_plan


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _run(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "name STRING")
    return {(r.name_1, r.name_2, r.dist)
            for r in fuzzy_pairs(df, "name").collect()}


def test_fuzzy_pairs_edit_types(spark):
    got = _run(spark, ["abcd", "abxd", "abd", "abcde", "zzzz"])
    assert ("abcd", "abxd", 1) in got          # substitution
    assert ("abcd", "abd", 1) in got           # deletion
    assert ("abcd", "abcde", 1) in got         # insertion
    assert ("abd", "abxd", 1) in got           # insertion of x
    assert not any("zzzz" in p[:2] for p in got)


def test_fuzzy_pairs_matches_bruteforce(spark):
    rng = random.Random(7)
    alphabet = "abc"
    vals = list({"".join(rng.choice(alphabet)
                         for _ in range(rng.randint(2, 5)))
                 for _ in range(60)})
    expected = {
        (a, b, 1)
        for i, a in enumerate(vals) for b in vals[i + 1:]
        if _lev(a, b) == 1
    }
    expected = {(min(a, b), max(a, b), d) for a, b, d in expected}
    assert _run(spark, vals) == expected


def test_deletion_variants_count(spark):
    df = spark.createDataFrame([("abc",)], "v STRING")
    keys = [r._key for r in deletion_variants(df, "v").collect()]
    assert sorted(keys) == ["ab", "abc", "ac", "bc"]


def test_fuzzy_pairs_plan_no_cartesian(spark, sf_dir):
    from gpu_bdb_spark.io import read_table

    c = read_table(spark, sf_dir, "customer", ["c_name"],
                   hint_broadcast=False)
    plan = formatted_plan(fuzzy_pairs(c, "c_name"))
    assert "Cartesian" not in plan and "NestedLoop" not in plan, (
        "candidate generation must be an equi join on deletion keys")


def test_registry_has_linkage_entry():
    from gpu_bdb_spark.queries.registry import all_specs, oracle_sql

    assert "fuzzy_name_pairs" in all_specs()
    assert oracle_sql()["fuzzy_name_pairs"]


def test_jaccard_set_join_equals_exhaustive(spark):
    """Prefix-filtered set-similarity join ≡ brute-force quadratic
    Jaccard on a corpus engineered with near-threshold pairs on BOTH
    sides of the cut (recall 1.0 + precision via the exact verify)."""
    random.seed(7)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    base = vocab[:20]
    # clusters of near-identical sets + unrelated sets
    for i in range(30):
        s = set(base)
        for _ in range(random.randint(0, 2)):
            s.discard(random.choice(base))
        for _ in range(random.randint(0, 2)):
            s.add(random.choice(vocab[20:]))
        docs.append((i, sorted(s)))
    for i in range(30, 50):
        docs.append((i, sorted(random.sample(vocab, random.randint(5, 15)))))
    df = spark.createDataFrame(docs, "doc_id LONG, toks ARRAY<STRING>")
    from gpu_bdb_spark.operators.linkage import jaccard_set_join

    num, den = 4, 5  # t = 0.8
    got = {(r.id_a, r.id_b): (r.inter_n, r.union_n)
           for r in jaccard_set_join(df, "doc_id", "toks", num, den)
           .collect()}
    expect = {}
    for i, a in docs:
        for j, b in docs:
            if i < j:
                inter = len(set(a) & set(b))
                un = len(set(a) | set(b))
                if inter * den >= un * num:
                    expect[(i, j)] = (inter, un)
    assert got == expect
    assert len(expect) > 10  # fixture actually exercises the join


def test_jaccard_set_join_threshold_boundary(spark):
    """Rational threshold is inclusive and integer-exact: jaccard
    exactly AT num/den is kept, one element short is dropped."""
    rows = [
        (1, ["a", "b", "c", "d"]),
        (2, ["a", "b", "c", "d", "e"]),   # J vs 1 = 4/5 exactly
        (3, ["a", "b", "c", "e", "f"]),   # J vs 1 = 3/6 = 0.5
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, toks ARRAY<STRING>")
    from gpu_bdb_spark.operators.linkage import jaccard_set_join

    got = {(r.id_a, r.id_b) for r in
           jaccard_set_join(df, "doc_id", "toks", 4, 5).collect()}
    assert got == {(1, 2)}
