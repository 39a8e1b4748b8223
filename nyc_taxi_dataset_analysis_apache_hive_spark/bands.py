"""Machine-readable BASELINE.md performance bands (r16).

Until r15 the per-entry and per-leg bands lived only in BASELINE.md
prose, so verifying a capture meant hand-carrying ~35 numbers from the
markdown tables into arithmetic.  This module is the same tables as
data, plus the comparison ``out_of_band`` that bench.py runs on its own
capture -- the bench JSON now NAMES any entry/leg/build outside its
band, so the driver and the judge read violations off the artifact
instead of re-deriving them.

Conventions (unchanged from BASELINE.md):

* ENTRY bands compare against the sweep's median-of-3 WARM numbers at
  sf0.1 (checkpoint-heavy entries' cold first pass lands in
  ``first_exec`` and is never banded).
* LEG bands are [0.4x, 2.5x] of the standing single-shot capture --
  deliberately wider than entry bands because legs are single-shot
  diagnostics; a leg flag means "re-time idle and attribute", not
  "regression confirmed".
* BUILD envelopes are the same [0.4x, 2.5x] convention over the
  shared-artifact build phase of the five checkpoint/training-heavy
  multi-leg entries.
* Only the SLOW side is a violation: a number below a band's low edge
  is the machine being faster (the judge's r15 a1/o3 reading), never
  flagged.

* A band WIDENED UNDER LOAD is provisional (r17 convention): it
  carries a "re-tighten at next idle capture" obligation in its
  comment, and the next round's idle capture re-sets it by
  [0.6x min, 1.5x max] over the warm passes -- so the ratchet
  self-reverses instead of permanently hiding a genuine regression
  inside a load-inflated top edge (the e1 r16->r17 cycle is the
  worked example).

Entries/legs without a band (sub-second tail) are simply absent here;
``tests/test_bands.py`` pins every banded name to an existing registry
entry/leg so a rename cannot silently orphan a band.
"""

from __future__ import annotations

#: entry -> (low, high) seconds at sf0.1, median-of-3 warm.
#: Source: BASELINE.md headline + sweep band tables.
ENTRY_BANDS: dict[str, tuple[float, float]] = {
    # headline
    "a1_group_count": (0.25, 0.75),
    "a3_two_key_count": (0.43, 1.21),
    "w1_pct_share": (0.39, 1.21),
    "p456_predicate_surface": (0.77, 2.27),
    "p7_derived_duration_join": (0.97, 2.72),
    "f9_case_segmentation": (0.36, 1.04),
    "o3_topk_multi_sort": (0.21, 0.56),
    "a9_percentile": (1.87, 5.34),
    "s3_etl_clean_derive": (0.41, 1.48),
    # re-tightened r17 from a fresh IDLE capture (the r16 band's 3.5
    # top was widened under ambient load and carried the implicit
    # "re-tighten at next idle capture" marker -- see the module
    # docstring convention below): warm passes 1.93/1.55/1.60 s with
    # all SIX legs (robust joined r17; per-leg marginals 0.12-0.29 s
    # over the ONE checkpointed keys x days series), rule
    # [0.6 x min, 1.5 x max] = [0.93, 2.89]
    "e1_tumbling_window_counts": (0.9, 2.9),
    "e2_sessionize": (1.2, 3.77),
    "a10_distinct_counts": (2.0, 12.11),
    "d3_minhash_lsh_pairs": (1.78, 10.74),
    "d4_ngram_jaccard_pairs": (5.34, 15.17),
    "d5_simhash_pairs": (3.11, 9.55),
    "d6_dup_clusters": (3.51, 11.6),
    # re-centered r16: three routed-mining legs joined the r15-banded
    # 4-leg entry (attribution in BASELINE.md's k1 row)
    "k1_knn_bruteforce": (1.2, 4.4),
    "k2_ann_lsh_ivf": (6.0, 17.5),
    "t1_text_profile": (0.98, 3.9),
    # sweep-only
    # re-centered r17 from fresh idle captures (16.6 / 17.7 s medians,
    # load avg 0.04): the colloc_win leg added a corpus-sized windowed
    # pair explode+aggregate to the entry's checkpoint builds, and the
    # r17 machine runs every entry ~1.3x the r16 driver's numbers (the
    # uniform inflation is visible across d4/a10/k2 in the same
    # captures).  Per-leg marginals all small (colloc_win 0.12 s);
    # the growth is the shared build.  Rule [0.6 x min, 1.5 x max]
    "tv1_text_stats": (9.9, 26.5),
    "pl1_curation_funnel": (2.8, 7.6),
    "k3_embedding_near_pairs": (5.9, 17.0),
    # re-centered r16: the three fuzzy-linkage legs joined the surface
    # (10-leg union; dictionary-sized joins, ~0.5-1 s of scheduling)
    "j5_join_surface": (5.2, 9.8),
    "d7_cross_corpus_decontam": (1.4, 4.5),
    "s7_stratified_rates": (2.4, 9.7),
    "d1_dedup_groups": (1.8, 6.5),
    "s8_upsert": (1.4, 4.5),
    "cx1_time_ops": (0.4, 2.2),
    "s6_hash_split": (0.9, 3.5),
}

#: (entry, leg) -> (low, high) seconds; >=1 s legs only.
#: Source: BASELINE.md per-leg band table ([0.4x, 2.5x] of capture).
LEG_BANDS: dict[tuple[str, str], tuple[float, float]] = {
    ("d4_ngram_jaccard_pairs", "ngram"): (1.2, 7.4),
    ("tv1_text_stats", "scrub"): (1.2, 7.8),
    ("tv1_text_stats", "lm"): (0.7, 4.6),
    ("k2_ann_lsh_ivf", "ivf_trained"): (1.4, 8.9),
    ("k2_ann_lsh_ivf", "pq"): (1.4, 8.5),
    ("k2_ann_lsh_ivf", "ivfpq"): (1.9, 12.2),
    ("k2_ann_lsh_ivf", "ivf"): (0.4, 2.8),
    ("d7_cross_corpus_decontam", "spans"): (0.9, 5.3),
    ("d7_cross_corpus_decontam", "overlap"): (0.5, 3.4),
    ("a10_distinct_counts", "exact_by_flag"): (1.0, 6.1),
    ("a10_distinct_counts", "cms"): (0.6, 3.8),
    ("s7_stratified_rates", "dsir"): (1.4, 8.6),
    ("s8_upsert", "scd2"): (0.9, 5.6),
    ("s8_upsert", "scd1"): (0.5, 3.2),
    # top nudged r17: the leg measured 4.607 idle on the ~1.3x-slower
    # r17 machine (0.15% over the old 4.6 top); 1.5x the measurement,
    # deliberately tighter than the 2.5x leg convention would allow
    ("k3_embedding_near_pairs", "near_pairs"): (0.7, 6.9),
    ("k3_embedding_near_pairs", "admit"): (0.6, 3.8),
}

#: entry -> (low, high) seconds for the shared-artifact build phase.
#: [0.4x, 2.5x] of the r15 standing capture (BASELINE.md).
BUILD_BANDS: dict[str, tuple[float, float]] = {
    "k3_embedding_near_pairs": (3.8, 23.5),
    "tv1_text_stats": (3.2, 19.7),
    "d4_ngram_jaccard_pairs": (2.5, 15.8),
    "d6_dup_clusters": (2.0, 12.7),
    # re-based r16 on the 5.2 s standing build (the bucketed/zorder
    # table WRITES happen at entry-call time, so a cold page cache can
    # spike a single-shot build far above the warm number -- 17.2 s
    # observed once this round, 5.2 s on the controlled re-time)
    "j5_join_surface": (2.1, 13.0),
}


def out_of_band(
    sweep: dict[str, float] | None = None,
    leg_timings: dict[str, dict] | None = None,
) -> dict[str, dict]:
    """Name every banded number in a bench capture that exceeds its
    band's HIGH edge.

    Returns ``{"entries": {...}, "legs": {...}, "builds": {...}}`` with
    only the violating keys present (all three empty on a clean
    capture).  Each violation carries the observed seconds and its
    band, so the flag is self-describing in the bench artifact.
    """
    viol: dict[str, dict] = {"entries": {}, "legs": {}, "builds": {}}
    for name, sec in (sweep or {}).items():
        band = ENTRY_BANDS.get(name)
        if band and sec > band[1]:
            viol["entries"][name] = {"sec": sec, "band": list(band)}
    for name, rec in (leg_timings or {}).items():
        bband = BUILD_BANDS.get(name)
        if bband and rec.get("build", 0.0) > bband[1]:
            viol["builds"][name] = {
                "sec": rec["build"],
                "band": list(bband),
            }
        for leg, sec in rec.get("legs", {}).items():
            lband = LEG_BANDS.get((name, leg))
            if lband and sec > lband[1]:
                viol["legs"][f"{name}.{leg}"] = {
                    "sec": sec,
                    "band": list(lband),
                }
    return viol
