"""Driver-contract entry for the record-linkage operator. The DuckDB
oracle is the EXHAUSTIVE quadratic levenshtein self-join — an
independent statement of the semantics — so the driver hash proves the
deletion-neighborhood blocking loses no pairs (recall is provably 1.0,
see operators/linkage docstring)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_bdb_spark.io import read_table
from gpu_bdb_spark.operators.linkage import fuzzy_pairs
from gpu_bdb_spark.queries.registry import register

FUZZY_ORACLE = """
WITH names AS (SELECT DISTINCT c_name FROM customer)
SELECT a.c_name AS name_1, b.c_name AS name_2,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM names a JOIN names b ON a.c_name < b.c_name
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


@register("fuzzy_name_pairs", oracle=FUZZY_ORACLE,
          tags=("linkage", "fuzzy", "blocking"))
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer-name pairs within edit distance 1, found by
    deletion-neighborhood (SymSpell) blocking + codegen'd levenshtein
    verify — linear candidate generation vs the oracle's quadratic
    scan, with identical (provably lossless) output."""
    c = read_table(spark, sf_dir, "customer", ["c_name"],
                   hint_broadcast=False)
    return fuzzy_pairs(c, "c_name", max_dist=1)


#: Exhaustive-pair oracle with ONE pure-math restriction (round 12):
#: J ≥ 19/20 forces |A∩B| ≤ min(szA, szB) and |A∪B| ≥ max(szA, szB), so
#: 20·min ≥ 19·max is a NECESSARY condition derived from the threshold
#: alone — no token ordering, prefixes, or any replay of our algorithm.
#: It keeps the oracle an independent statement of the semantics while
#: cutting the sf1zipf pair space 1.25G → 80M list-intersections
#: (feasible), which is what lets the sf1zipf sweep run this entry
#: unexcluded (VERDICT r04 item 8).
JACCARD_JOIN_ORACLE = """
WITH s AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '')) AS toks
  FROM documents
),
s2 AS MATERIALIZED (
  SELECT doc_id, toks, len(toks) AS sz FROM s WHERE len(toks) > 0),
szs AS (SELECT DISTINCT sz FROM s2),
compat AS MATERIALIZED (
  SELECT a.sz AS sza, b.sz AS szb
  FROM szs a JOIN szs b
    ON a.sz * 20 >= b.sz * 19 AND b.sz * 20 >= a.sz * 19
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.toks, b.toks)) AS inter,
         a.sz + b.sz - len(list_intersect(a.toks, b.toks)) AS un
  FROM s2 a
  JOIN compat c ON a.sz = c.sza
  JOIN s2 b ON b.sz = c.szb AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter_n,
       CAST(un AS BIGINT) AS union_n
FROM p WHERE inter * 20 >= un * 19
"""


@register("jaccard_join_prefix", oracle=JACCARD_JOIN_ORACLE,
          tags=("linkage", "set-similarity", "prefix-filter"), bench=True)
def jaccard_join_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs with token-set Jaccard ≥ 0.95 via AllPairs prefix
    filtering (rarest-tokens-first prefixes → equi-join candidates →
    exact integer verify) — the oracle is the EXHAUSTIVE quadratic
    list_intersect self-join, so the driver hash proves the prefix
    blocking loses no pairs."""
    from gpu_bdb_spark.functions import tokenize
    from gpu_bdb_spark.operators.linkage import jaccard_set_join

    d = read_table(spark, sf_dir, "documents", ["doc_id", "text"],
                   hint_broadcast=False)
    toks = d.select(
        "doc_id",
        tokenize(F.lower(F.col("text"))).alias("toks"))
    return jaccard_set_join(toks, "doc_id", "toks",
                            threshold_num=19, threshold_den=20)


def _jaccard_lsh_oracle(num_hashes: int = 32, bands: int = 16,
                        num: int = 19, den: int = 20) -> str:
    """DuckDB replay of the composed LSH-candidate + token-Jaccard
    verify pipeline, stage by stage (signatures → bands → candidate
    join → exact integer verify) — the md5 family makes every stage
    engine-portable, so the gate is deterministic at any SF."""
    rows = num_hashes // bands
    # Carter–Wegman family: one md5 per token → h1,
    # sig_i = MIN((a_i·h1 + b_i) % 2^61−1)
    # (matches lsh_verified_pairs_portable)
    from gpu_bdb_spark.operators.dedup import _CW_P, minhash_cw_constants
    mins = ",\n         ".join(
        f"MIN(({a} * h1 + {b}) % {_CW_P}) AS sig_{i}"
        for i, (a, b) in enumerate(minhash_cw_constants(num_hashes)))
    band_rows = "\n  UNION ALL ".join(
        "SELECT id, {b} AS band, {bh} AS bh FROM sig".format(
            b=b,
            bh=" || ',' || ".join(
                f"CAST(sig_{b * rows + r} AS VARCHAR)" for r in range(rows)))
        for b in range(bands))
    return r"""
WITH t AS (
  SELECT doc_id AS id,
         list_distinct(list_filter(
           string_split_regex(lower(text), '\s+'), x -> x <> '')) AS toks
  FROM documents
),
tk AS (SELECT id, unnest(toks) AS tok FROM t WHERE len(toks) > 0),
tkh AS (
  SELECT id,
         CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS h1
  FROM tk),
sig AS (
  SELECT id,
         """ + mins + """
  FROM tkh GROUP BY id
),
bandv AS (
  """ + band_rows + """
),
cand AS (
  SELECT DISTINCT a.id AS id_1, b.id AS id_2
  FROM bandv a JOIN bandv b
    ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
),
sizes AS (SELECT id, CAST(len(toks) AS BIGINT) AS sz FROM t),
inter AS (
  SELECT c.id_1, c.id_2, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM cand c
  JOIN tk a ON a.id = c.id_1
  JOIN tk b ON b.id = c.id_2 AND b.tok = a.tok
  GROUP BY c.id_1, c.id_2
)
SELECT i.id_1, i.id_2,
       ROUND(CAST(i.n_inter AS DOUBLE)
             / CAST(s1.sz + s2.sz - i.n_inter AS DOUBLE), 6) AS jaccard
FROM inter i
JOIN sizes s1 ON i.id_1 = s1.id
JOIN sizes s2 ON i.id_2 = s2.id
WHERE i.n_inter * """ + str(den) + """ >= (s1.sz + s2.sz - i.n_inter) * """ + str(num) + """
"""


@register("jaccard_lsh_verified", oracle=_jaccard_lsh_oracle(),
          tags=("linkage", "set-similarity", "minhash", "lsh",
                "portable", "pipeline"))
def jaccard_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r3-verdict composition: `jaccard_join_prefix`'s exact
    token-Jaccard verify (rational threshold 19/20) fed by md5
    MinHash-band LSH CANDIDATES instead of AllPairs prefixes — the
    documented fallback for uniform-token-frequency corpora where
    prefix filtering degenerates to near-quadratic (SCALE.md
    "jaccard_join_prefix"). RECALL CONTRACT: candidate generation is
    LSH's 1−(1−j^r)^b (r=2, b=16 → ≥ 1−(1−0.95²)¹⁶ ≈ 1−10⁻¹⁹ at the
    0.95 threshold: effectively exhaustive for pairs that can pass the
    verify); false positives are impossible (exact integer verify), so
    output ⊆ the exhaustive quadratic join always. The DuckDB oracle
    replays every stage, so the hash gate is deterministic — recall is
    the operator's stated contract, not a hash hazard.

    REGIME (measured, SCALE.md round 10): token-SET LSH needs low mean
    inter-doc Jaccard — on a Zipfian corpus random docs share the
    vocabulary head, P(band collision) ≈ J̄^r per band, and candidates
    approach all-pairs; there `jaccard_join_prefix` is the right tool
    (rare-token prefixes prune hard). The two candidate generators are
    complementary; pick by a one-scan df profile (`skew_report`)."""
    from gpu_bdb_spark.functions import tokenize
    from gpu_bdb_spark.operators.dedup import lsh_verified_pairs_portable

    d = read_table(spark, sf_dir, "documents", ["doc_id", "text"],
                   hint_broadcast=False)
    toks = F.array_distinct(tokenize(F.lower(F.col("text"))))
    sets = d.select(
        F.col("doc_id").alias("id"),
        toks.alias("members"),
        F.size(toks).cast("long").alias("n_members"),
    ).filter(F.col("n_members") > 0)
    return lsh_verified_pairs_portable(
        sets, num_hashes=32, bands=16, threshold_num=19, threshold_den=20)
