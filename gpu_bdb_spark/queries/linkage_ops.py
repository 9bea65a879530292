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

def _fuzzy_cert_sql() -> str:
    from gpu_bdb_spark.operators.sampling import certification_sample_sql
    return certification_sample_sql("customer", "c_name", 50_000, 0.125)


FUZZY_ORACLE = """
WITH names AS (
  SELECT DISTINCT c_name FROM customer
  WHERE {cert}
)
SELECT a.c_name AS name_1, b.c_name AS name_2,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM names a JOIN names b ON a.c_name < b.c_name
WHERE levenshtein(a.c_name, b.c_name) <= 1
""".format(cert=_fuzzy_cert_sql())


@register("fuzzy_name_pairs", oracle=FUZZY_ORACLE,
          tags=("linkage", "fuzzy", "blocking"))
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer-name pairs within edit distance 1, found by
    deletion-neighborhood (SymSpell) blocking + codegen'd levenshtein
    verify — linear candidate generation vs the oracle's quadratic
    scan, with identical (provably lossless) output.

    Certification tier (round 13): the oracle is quadratic BY DESIGN
    (that independence is the recall-1.0 proof) — 11.2G levenshtein
    calls at sf1's 150k customers. Above 50k rows both engines restrict
    to the deterministic ⅛ md5 NAME sample (¼ until round 14 — trimmed
    per the r06 verdict because the oracle's quadratic leg was the
    sf1zipf sweep's heaviest at 319 s; pair predicates are pairwise, so
    the sampled gate certifies exactly the sampled sub-problem; the
    containment argument of probe_cert_sample.py applies); driver SFs
    (≤15k) stay full-corpus."""
    from gpu_bdb_spark.operators.sampling import certification_sample

    c = read_table(spark, sf_dir, "customer", ["c_name"],
                   hint_broadcast=False)
    c = certification_sample(c, "c_name", 50_000, 0.125)
    return fuzzy_pairs(c, "c_name", max_dist=1)


#: Size-bounded certification tier (VERDICT r05 item 1): at or below
#: this document count (every driver SF: 500/500/5000) the entries run
#: the FULL corpus — byte-identical to the pre-tier gate; above it both
#: the Spark side and the oracle restrict to the deterministic ⅛ md5
#: content-hash sample (¼ until round 15 — trimmed per the r07 verdict
#: because the exhaustive oracle's quadratic leg was the sf1zipf
#: sweep's heaviest at 211 s; ⅛ cuts the pair space another 4× to
#: ~1.2M list-intersections, same as fuzzy_name_pairs' round-14 trim).
#: The FULL-corpus run at big SFs stays covered by the containment/
#: row-count invariant probe (.claude/skills/verify/
#: probe_cert_sample.py): sampled output == full output restricted to
#: sampled ids — pair predicates are pairwise, so the sampled gate
#: certifies exactly the sampled sub-problem.
CERT_DOC_BOUND = 20_000
CERT_FRACTION = 0.125

#: Routing budget for the measured LSH bucket pair-work (see
#: `lsh_verified_pairs_portable`): driver fixtures 0.85M/0.87M/84M and
#: sf1zipf-sampled ~3M all stay on the LSH arm (certified hashes
#: unchanged); only vocabulary-degenerate corpora (uniform sf1: 8.2G)
#: route to the prefix verify.
LSH_PAIR_WORK_BUDGET = 200_000_000


def _cert_sample_sql() -> str:
    from gpu_bdb_spark.operators.sampling import certification_sample_sql
    return certification_sample_sql(
        "documents", "doc_id", CERT_DOC_BOUND, CERT_FRACTION)


#: Exhaustive-pair oracle with ONE pure-math restriction (round 12):
#: J ≥ 19/20 forces |A∩B| ≤ min(szA, szB) and |A∪B| ≥ max(szA, szB), so
#: 20·min ≥ 19·max is a NECESSARY condition derived from the threshold
#: alone — no token ordering, prefixes, or any replay of our algorithm.
#: It keeps the oracle an independent statement of the semantics while
#: cutting the sf1zipf pair space 1.25G → 80M list-intersections,
#: which with the certification-sample tier (→ ~5M) is what lets the
#: sf1zipf sweep run this entry unexcluded (VERDICT r04 item 8 +
#: r05 item 1).
JACCARD_JOIN_ORACLE = """
WITH s AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x <> '')) AS toks
  FROM documents
  WHERE {cert}
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


@register("jaccard_join_prefix",
          oracle=JACCARD_JOIN_ORACLE.format(cert=_cert_sample_sql()),
          tags=("linkage", "set-similarity", "prefix-filter"), bench=True)
def jaccard_join_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs with token-set Jaccard ≥ 0.95 via AllPairs prefix
    filtering (rarest-tokens-first prefixes → equi-join candidates →
    exact integer verify) — the oracle is the EXHAUSTIVE quadratic
    list_intersect self-join, so the driver hash proves the prefix
    blocking loses no pairs. Above CERT_DOC_BOUND docs both sides
    certify on the deterministic CERT_FRACTION content-hash sample
    (the size-bounded tier; identical to the full gate at every driver
    SF)."""
    from gpu_bdb_spark.functions import tokenize
    from gpu_bdb_spark.operators.linkage import jaccard_set_join
    from gpu_bdb_spark.operators.sampling import certification_sample

    d = read_table(spark, sf_dir, "documents", ["doc_id", "text"],
                   hint_broadcast=False)
    d = certification_sample(d, "doc_id", CERT_DOC_BOUND, CERT_FRACTION)
    toks = d.select(
        "doc_id",
        tokenize(F.lower(F.col("text"))).alias("toks"))
    return jaccard_set_join(toks, "doc_id", "toks",
                            threshold_num=19, threshold_den=20)


def _jaccard_lsh_oracle(num_hashes: int = 32, bands: int = 16,
                        num: int = 19, den: int = 20) -> str:
    """DuckDB replay of the composed LSH-candidate + token-Jaccard
    verify pipeline, stage by stage (certification sample → signatures
    → bands → MEASURED pair-work routing → candidate join → exact
    integer verify) — the md5 family makes every stage engine-portable,
    so the gate is deterministic at any SF. The routing stat and both
    arms are guarded at their INPUT CTEs (an output-level filter would
    still build the expensive join), and every multiply-referenced CTE
    is MATERIALIZED (the round-8 re-inlining lesson). The routed arm's
    oracle is the EXHAUSTIVE size-compatible pair join — valid because
    prefix filtering has provable recall 1.0, so its output IS the
    exhaustive truth."""
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
WITH t AS MATERIALIZED (
  SELECT doc_id AS id,
         list_distinct(list_filter(
           string_split_regex(lower(text), '\s+'), x -> x <> '')) AS toks
  FROM documents
  WHERE """ + _cert_sample_sql() + r"""
),
tk AS MATERIALIZED (
  SELECT id, unnest(toks) AS tok FROM t WHERE len(toks) > 0),
tkh AS (
  SELECT id,
         CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS h1
  FROM tk),
sig AS MATERIALIZED (
  SELECT id,
         """ + mins + """
  FROM tkh GROUP BY id
),
bandv AS MATERIALIZED (
  """ + band_rows + """
),
stat AS MATERIALIZED (
  SELECT COALESCE(SUM(c * (c - 1) // 2), 0) AS pw
  FROM (SELECT COUNT(*) AS c FROM bandv GROUP BY band, bh)
),
lsh_bandv AS (
  SELECT * FROM bandv
  WHERE (SELECT pw FROM stat) <= """ + str(LSH_PAIR_WORK_BUDGET) + r"""
),
cand AS (
  SELECT DISTINCT a.id AS id_1, b.id AS id_2
  FROM lsh_bandv a JOIN lsh_bandv b
    ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
),
sizes AS (SELECT id, CAST(len(toks) AS BIGINT) AS sz FROM t),
inter AS (
  SELECT c.id_1, c.id_2, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM cand c
  JOIN tk a ON a.id = c.id_1
  JOIN tk b ON b.id = c.id_2 AND b.tok = a.tok
  GROUP BY c.id_1, c.id_2
),
lsh_out AS (
  SELECT i.id_1, i.id_2,
         ROUND(CAST(i.n_inter AS DOUBLE)
               / CAST(s1.sz + s2.sz - i.n_inter AS DOUBLE), 6) AS jaccard
  FROM inter i
  JOIN sizes s1 ON i.id_1 = s1.id
  JOIN sizes s2 ON i.id_2 = s2.id
  WHERE i.n_inter * """ + str(den) + """ >= (s1.sz + s2.sz - i.n_inter) * """ + str(num) + r"""
),
ex_s2 AS MATERIALIZED (
  SELECT id, toks, len(toks) AS sz FROM t
  WHERE len(toks) > 0
    AND (SELECT pw FROM stat) > """ + str(LSH_PAIR_WORK_BUDGET) + r"""
),
ex_szs AS (SELECT DISTINCT sz FROM ex_s2),
ex_compat AS MATERIALIZED (
  SELECT a.sz AS sza, b.sz AS szb
  FROM ex_szs a JOIN ex_szs b
    ON a.sz * """ + str(den) + " >= b.sz * " + str(num) + """
   AND b.sz * """ + str(den) + " >= a.sz * " + str(num) + r"""
),
ex_out AS (
  SELECT a.id AS id_1, b.id AS id_2,
         ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
               / CAST(a.sz + b.sz - len(list_intersect(a.toks, b.toks))
                      AS DOUBLE), 6) AS jaccard
  FROM ex_s2 a
  JOIN ex_compat c ON a.sz = c.sza
  JOIN ex_s2 b ON b.sz = c.szb AND a.id < b.id
  WHERE len(list_intersect(a.toks, b.toks)) * """ + str(den) + r"""
        >= (a.sz + b.sz - len(list_intersect(a.toks, b.toks))) * """ + str(num) + r"""
)
SELECT * FROM lsh_out UNION ALL SELECT * FROM ex_out
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

    REGIME (measured, SCALE.md rounds 10 + 13): the failure mode of
    token-SET LSH is vocabulary degeneracy — signature minima collapse
    into shared buckets and the band join's output explodes. Round-13
    MEASUREMENT inverted the earlier intuition about WHERE that bites:
    the 31-word driver fixture is the most degenerate (pair-work/doc
    16.9k at sf0.1), a Zipf corpus's tail DIVERSIFIES signatures
    (pw/doc 980 at sf1zipf — in-regime!), and only the uniform-vocab
    sf1 corpus truly explodes (8.2G). So the operator routes on the
    MEASURED bucket pair-work (one cheap aggregate, exactly replayed in
    the oracle's stat CTE), not on a vocabulary heuristic: over
    LSH_PAIR_WORK_BUDGET it falls back to `jaccard_join_prefix`'s
    prefix verify, whose recall is provably 1.0 so the routed output is
    the exhaustive truth and the oracle's routed arm is the EXHAUSTIVE
    size-compatible join. Above CERT_DOC_BOUND docs both engines
    certify on the deterministic CERT_FRACTION content-hash sample
    (size-bounded tier — sf1zipf's 49M-pair verify would otherwise cost >25 min in
    the single-threaded oracle)."""
    from gpu_bdb_spark.functions import tokenize
    from gpu_bdb_spark.operators.dedup import lsh_verified_pairs_portable
    from gpu_bdb_spark.operators.sampling import certification_sample

    d = read_table(spark, sf_dir, "documents", ["doc_id", "text"],
                   hint_broadcast=False)
    d = certification_sample(d, "doc_id", CERT_DOC_BOUND, CERT_FRACTION)
    toks = F.array_distinct(tokenize(F.lower(F.col("text"))))
    sets = d.select(
        F.col("doc_id").alias("id"),
        toks.alias("members"),
        F.size(toks).cast("long").alias("n_members"),
    ).filter(F.col("n_members") > 0)
    return lsh_verified_pairs_portable(
        sets, num_hashes=32, bands=16, threshold_num=19, threshold_den=20,
        pair_work_budget=LSH_PAIR_WORK_BUDGET)
