"""Record linkage / fuzzy matching: find all pairs of strings within a
small edit distance WITHOUT a quadratic comparison, using deletion
neighborhoods (the SymSpell blocking scheme).

For edit distance ≤ 1 the blocking is EXACT, not approximate: let
D(s) = {s} ∪ {s with one character deleted}. If lev(a, b) ≤ 1 and
a ≠ b then D(a) ∩ D(b) ≠ ∅ —
  * substitution at position i: deleting position i from both gives the
    same string;
  * insertion/deletion: deleting the inserted character from the longer
    string yields the shorter string, which is in its own neighborhood.
So joining on neighborhood keys generates a candidate superset of the
true pair set, and the final codegen'd `levenshtein` filter makes it
exact. Recall is provably 1.0 — unlike prefix/length blocking, which
silently drops pairs whose edit falls inside the blocking key.

Scale: each string of length n emits n+1 keys (strings here are short
identity fields — names, emails — so the expansion is a small constant),
the join is an equi shuffle-hash join on the key, and candidate
multiplicity collapses with a distinct on the id pair before scoring.
A skewed key (a hot deletion variant) is an AQE skew-join case, same as
any hash join in the repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(df: DataFrame, col: str) -> DataFrame:
    """Explode each string into its deletion neighborhood: (col, key)
    rows where key ranges over the string itself (i=0) and every
    one-character-deleted variant (i=1..len). Pure codegen'd
    substring/concat expressions — no interpreted array lambdas."""
    i = F.explode(
        F.sequence(F.lit(0), F.length(F.col(col)))).alias("_i")
    out = df.select(F.col(col), i)
    variant = F.when(F.col("_i") == 0, F.col(col)).otherwise(
        F.concat(
            F.substring(F.col(col), 1, F.col("_i") - F.lit(1)),
            F.col(col).substr(
                F.col("_i") + F.lit(1), F.length(F.col(col))),
        )
    )
    return out.select(F.col(col), variant.alias("_key"))


def fuzzy_pairs(
    df: DataFrame,
    col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All unordered pairs of DISTINCT values of `col` with
    levenshtein ≤ `max_dist`, via deletion-neighborhood blocking.

    Only max_dist=1 is supported (the neighborhood construction is
    exact exactly there; higher distances need multi-deletion
    neighborhoods, which grow combinatorially — at corpus scale you
    chain this operator or fall back to LSH candidates + verify).
    Returns (name_1, name_2, dist) with name_1 < name_2.
    """
    if max_dist != 1:
        raise ValueError("deletion-neighborhood blocking is exact only "
                         "for max_dist=1")
    vals = df.select(F.col(col).alias("_v")).distinct()
    var = deletion_variants(vals, "_v")
    cand = (
        var.alias("l")
        .join(var.alias("r"), F.col("l._key") == F.col("r._key"))
        .select(
            F.col("l._v").alias("name_1"),
            F.col("r._v").alias("name_2"),
        )
        .filter(F.col("name_1") < F.col("name_2"))
        .distinct()
    )
    dist = F.levenshtein("name_1", "name_2")
    return (
        cand.filter(dist <= F.lit(int(max_dist)))
        .select("name_1", "name_2", dist.cast("int").alias("dist"))
    )


def jaccard_set_join(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold_num: int = 19,
    threshold_den: int = 20,
) -> DataFrame:
    """Exact set-similarity self-join: all unordered id pairs whose
    token SETS have Jaccard ≥ threshold_num/threshold_den, via
    AllPairs/PPJoin prefix filtering (Bayardo et al., WWW'07) instead
    of the quadratic all-pairs comparison.

    Blocking argument (recall is provably 1.0): order the vocabulary
    by ascending document frequency (rarest first; ties by token).
    If J(a,b) ≥ t then |a∩b| ≥ t·|a∪b| ≥ t·|s| for each s ∈ {a,b},
    so the intersection has ≥ c = ceil(t·|s|) elements and its
    globally-smallest member must sit within the first
    |s| − c + 1 positions of s's ordered list — the "prefix". Hence
    every qualifying pair shares at least one token across its two
    prefixes, and an equi join on prefix tokens generates a candidate
    superset; the final exact intersection check makes it precise.
    The threshold is a RATIONAL (num/den) so every comparison is
    integer arithmetic — no float on the cut line.

    Scale: the vocabulary aggregate is one token-key shuffle over bare
    (token) rows; the global frequency rank is a window over the VOCAB
    (tiny next to the corpus — the one deliberate single-partition
    sort, same trade as quantile_bins). Prefixes are rare tokens by
    construction, so the candidate join's blocks are small exactly
    where the data is big; candidates collapse to bare id pairs
    (distinct) BEFORE the wide token arrays re-attach for
    verification. The ranked-sets frame feeds three consumers on three
    different keys (prefix explode, verify-left, verify-right), so it
    is persisted — ReusedExchange cannot dedup across differing keys.

    Returns (id_a, id_b, inter_n, union_n) with id_a < id_b.
    """
    from pyspark.sql.window import Window

    num, den = int(threshold_num), int(threshold_den)
    if not 0 < num <= den:
        raise ValueError(f"threshold must be in (0, 1], got {num}/{den}")
    sets = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(F.col(tokens_col)).alias("_toks"),
    ).filter(F.size("_toks") > 0)
    vocab = (
        sets.select(F.explode("_toks").alias("_tok"))
        .groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    )
    rank = vocab.select(
        "_tok",
        F.row_number().over(Window.orderBy("_df", "_tok")).alias("_rank"),
    )
    ranked = (
        sets.select("_id", F.explode("_toks").alias("_tok"))
        .join(F.broadcast(rank), "_tok")
        .groupBy("_id")
        .agg(F.transform(
            F.sort_array(F.collect_list(F.struct("_rank", "_tok"))),
            lambda x: x["_tok"]).alias("_rtoks"))
        .select("_id", "_rtoks", F.size("_rtoks").alias("_sz"))
        .persist()
    )
    # prefix length p = sz - ceil(t*sz) + 1, all-integer
    c = F.floor((F.col("_sz") * num + (den - 1)) / den).cast("int")
    prefix = ranked.select(
        F.col("_id"), F.col("_sz"),
        F.explode(F.slice("_rtoks", 1, F.col("_sz") - c + 1)).alias("_tok"),
    )
    cand = (
        prefix.alias("l")
        .join(prefix.alias("r"),
              (F.col("l._tok") == F.col("r._tok"))
              & (F.col("l._id") < F.col("r._id"))
              & (F.least("l._sz", "r._sz") * den
                 >= F.greatest("l._sz", "r._sz") * num))
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    a = ranked.select(F.col("_id").alias("id_a"),
                      F.col("_rtoks").alias("_ta"), F.col("_sz").alias("_sa"))
    b = ranked.select(F.col("_id").alias("id_b"),
                      F.col("_rtoks").alias("_tb"), F.col("_sz").alias("_sb"))
    inter = F.size(F.array_intersect("_ta", "_tb"))
    union = F.col("_sa") + F.col("_sb") - inter
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .filter(inter * den >= union * num)
        .select("id_a", "id_b",
                inter.cast("long").alias("inter_n"),
                union.cast("long").alias("union_n"))
    )
