"""Fuzzy entity resolution: dictionary-level blocked edit-distance linkage.

The record-linkage shape a curation pipeline needs when an entity column
(product names, author strings, site hostnames) carries typo/variant
noise: find near-identical name variants, pick each name's best fuzzy
match, and canonicalize every variant onto the heaviest spelling of its
neighborhood.

Design for 100 TB -- link the DICTIONARY, not the records:

* ``name_dictionary`` first collapses the record table to DISTINCT
  names + their record counts.  Real entity vocabularies are
  sublinear in record count (here SF-invariant: 64 names at every sf),
  so the quadratic-ish fuzzy stage runs over a vocabulary-sized,
  usually broadcastable relation while record mass rides along as a
  count column.  Linking raw records directly would re-compare
  identical spellings millions of times -- the classic mistake this
  module exists to avoid.
* ``blocked_pairs`` never goes all-pairs even over the dictionary:
  multi-pass blocking (one pass per blocking key; standard record-
  linkage practice, e.g. Christen's "Data Matching", Springer 2012)
  generates candidates as equi-joins on each key, unions the passes,
  and only then pays ``levenshtein`` on the distinct survivors.  A
  block key with a hot value degrades to a bounded within-block join,
  never a cartesian (no-cartesian plan shape pinned in
  tests/test_linkage.py).
* Scoring is Spark's built-in ``levenshtein`` (JVM codegen; DuckDB has
  the identical integer-exact function, so every leg value-hashes).

Reference parity note: the reference (Surabhi_Srinath_NYC_Taxi_Assignment_FInal.txt)
has no fuzzy matching -- this is part of the beyond-the-reference
training-data-pipeline surface, like dedup/similarity/packing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def name_dictionary(
    records: DataFrame, name_col: str, id_col: str
) -> DataFrame:
    """Collapse a record table to ``(name, n_records, min_id)``.

    ``min_id`` is the deterministic witness record (useful for joining
    canonical metadata back); ``n_records`` is the record mass that the
    pair/canonicalization stages weight by.  NULL/empty names are
    dropped (a NULL name is unmatchable and would otherwise diverge
    between engines on NULL sort order -- the packing r16 rule).
    """
    return (
        records.filter(
            F.col(name_col).isNotNull() & (F.col(name_col) != "")
        )
        .groupBy(F.col(name_col).alias("name"))
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.min(id_col).alias("min_id"),
        )
    )


#: default blocking keys for "adjective noun"-shaped names: a pair is a
#: candidate iff it shares the first OR the last whitespace token.
#: (Multi-pass blocking: each key is one pass; missed-by-all-keys pairs
#: are the recall tradeoff every blocked linkage makes.)
DEFAULT_BLOCK_KEYS: tuple[str, ...] = (
    "split_part(name, ' ', 1)",
    "split_part(name, ' ', -1)",
)


def blocked_pairs(
    dictionary: DataFrame,
    max_dist: int = 3,
    block_keys: tuple[str, ...] = DEFAULT_BLOCK_KEYS,
) -> DataFrame:
    """Candidate near-variant pairs from multi-pass blocking.

    Each blocking key contributes one self-equi-join pass over the
    dictionary; passes are unioned and DISTINCTed BEFORE the
    levenshtein filter so a pair sharing several keys is scored once.
    Output: ``(name_a, name_b, lev, pair_mass)`` with ``name_a <
    name_b`` (each unordered pair once) and ``pair_mass = n_records_a *
    n_records_b`` -- the number of record-level pairs this dictionary
    pair represents.

    Block-key contract: each key is a SQL expression over the column
    identifier ``name`` (rewritten word-bounded to name_a/name_b per
    join side).  The rewrite is textual, so a key whose STRING LITERALS
    contain the word ``name`` (e.g. ``coalesce(name, 'no name')``) is
    unsupported -- spell such constants without the word.
    """
    import re

    if not block_keys:
        raise ValueError(
            "block_keys must be non-empty: blocking is what keeps the "
            "pair stage off the all-pairs product"
        )

    left = dictionary.select(
        F.col("name").alias("name_a"), F.col("n_records").alias("cnt_a")
    )
    right = dictionary.select(
        F.col("name").alias("name_b"), F.col("n_records").alias("cnt_b")
    )
    passes = None
    for key in block_keys:
        # rewrite ONLY the whole identifier `name` (word-bounded): a key
        # like upper(surname) must not become upper(sur(name_a))
        ka = F.expr(re.sub(r"\bname\b", "name_a", key))
        kb = F.expr(re.sub(r"\bname\b", "name_b", key))
        p = left.join(
            right, (ka == kb) & (F.col("name_a") < F.col("name_b"))
        ).select("name_a", "name_b", "cnt_a", "cnt_b")
        passes = p if passes is None else passes.unionByName(p)
    return (
        passes.distinct()
        .withColumn("lev", F.levenshtein("name_a", "name_b"))
        .filter(F.col("lev") <= max_dist)
        .select(
            "name_a",
            "name_b",
            F.col("lev").cast("long").alias("lev"),
            (F.col("cnt_a") * F.col("cnt_b"))
            .cast("long")
            .alias("pair_mass"),
        )
    )


def _symmetrize(pairs: DataFrame) -> DataFrame:
    """Both directions of each unordered pair (for per-name windows)."""
    fwd = pairs.select(
        F.col("name_a").alias("name"), F.col("name_b").alias("other"), "lev"
    )
    rev = pairs.select(
        F.col("name_b").alias("name"), F.col("name_a").alias("other"), "lev"
    )
    return fwd.unionByName(rev)


def best_match(pairs: DataFrame) -> DataFrame:
    """Each name's single best fuzzy neighbor.

    min ``lev``, ties broken by ``other`` ascending -- one
    ``min_by``-shaped window over the symmetrized pair list (names with
    no candidate pair are absent: no match is a valid linkage outcome).
    Output: ``(name, match, lev)``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("name").orderBy(
        F.col("lev").asc(), F.col("other").asc()
    )
    return (
        _symmetrize(pairs)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("name", F.col("other").alias("match"), "lev")
    )


def canonical_map(pairs: DataFrame, dictionary: DataFrame) -> DataFrame:
    """Canonicalize each name onto the HEAVIEST spelling among itself
    and its fuzzy neighbors (max ``n_records``, ties by name ascending).

    The merge-into-the-most-frequent-variant rule: one window over the
    symmetrized pairs plus a self row per name (lev 0), so an isolated
    name canonicalizes to itself and a typo variant folds into the
    dominant spelling.  Single-hop by design -- a transitive chain
    a~b~c with no a~c pair keeps a and c apart (chasing chains is the
    connected-components job; see dedup.connected_components).
    Output: ``(name, canon, canon_records)``.
    """
    from pyspark.sql import Window

    self_rows = dictionary.select(
        F.col("name"), F.col("name").alias("other"), F.lit(0).alias("lev")
    )
    sym = _symmetrize(pairs).unionByName(self_rows)
    weighted = sym.join(
        dictionary.select(
            F.col("name").alias("other"),
            F.col("n_records").alias("other_records"),
        ),
        "other",
    )
    w = Window.partitionBy("name").orderBy(
        F.col("other_records").desc(), F.col("other").asc()
    )
    return (
        weighted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "name",
            F.col("other").alias("canon"),
            F.col("other_records").cast("long").alias("canon_records"),
        )
    )


def linkage_report(
    records: DataFrame,
    name_col: str,
    id_col: str,
    max_dist: int = 3,
    block_keys: tuple[str, ...] = DEFAULT_BLOCK_KEYS,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Convenience bundle: (pairs, best, canon) over one dictionary."""
    d = name_dictionary(records, name_col, id_col)
    p = blocked_pairs(d, max_dist=max_dist, block_keys=block_keys)
    return p, best_match(p), canonical_map(p, d)
