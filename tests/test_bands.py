"""Band-table integrity + out_of_band unit behavior (r16).

bands.py is BASELINE.md's band tables as data; these tests pin (a)
that every banded name still exists in the registry -- a rename or leg
reshuffle cannot silently orphan a band into dead weight the bench
check never consults -- and (b) the comparison semantics: slow-side
only, self-describing violation records, empty on a clean capture.
Pure unit tests, no SparkSession.
"""

from __future__ import annotations

from nyc_taxi_dataset_analysis_apache_hive_spark import bands, registry


def test_entry_bands_name_real_registry_entries():
    unknown = set(bands.ENTRY_BANDS) - set(registry.QUERIES)
    assert not unknown, f"bands for nonexistent entries: {sorted(unknown)}"


def test_leg_bands_name_real_declared_legs():
    for (entry, leg), band in bands.LEG_BANDS.items():
        assert entry in registry.LEGS, f"leg band for unbanded entry {entry}"
        _, legs = registry.LEGS[entry]
        assert leg in legs, f"band for undeclared leg {entry}.{leg}"
        assert band[0] < band[1]


def test_build_bands_name_leg_entries():
    unknown = set(bands.BUILD_BANDS) - set(registry.LEGS)
    assert not unknown, f"build bands for non-leg entries: {sorted(unknown)}"


def test_all_bands_are_ordered_positive():
    for lo, hi in [
        *bands.ENTRY_BANDS.values(),
        *bands.LEG_BANDS.values(),
        *bands.BUILD_BANDS.values(),
    ]:
        assert 0 < lo < hi


def test_out_of_band_clean_capture_is_empty():
    # every banded number exactly at its high edge -> clean
    sweep = {n: hi for n, (_, hi) in bands.ENTRY_BANDS.items()}
    legs = {
        entry: {"build": bands.BUILD_BANDS.get(entry, (0, 1e9))[1], "legs": {}}
        for entry in registry.LEGS
    }
    for (entry, leg), (_, hi) in bands.LEG_BANDS.items():
        legs[entry]["legs"][leg] = hi
    viol = bands.out_of_band(sweep, legs)
    assert viol == {"entries": {}, "legs": {}, "builds": {}}


def test_out_of_band_flags_slow_side_only():
    lo, hi = bands.ENTRY_BANDS["a1_group_count"]
    # below the low edge = faster machine, never a violation
    assert not bands.out_of_band({"a1_group_count": lo / 2})["entries"]
    viol = bands.out_of_band({"a1_group_count": hi + 1.0})
    assert viol["entries"]["a1_group_count"] == {
        "sec": hi + 1.0,
        "min": hi + 1.0,
        "band": [lo, hi],
    }


def test_out_of_band_min_statistic_shields_bursts():
    """mins= (r17): when an entry ran multiple passes, the band check
    flags on the MIN -- a steal burst inflating the median while one
    pass stayed in-band is load, not a regression; a min above the top
    still flags (a real regression is slow in every pass)."""
    name = "a1_group_count"
    lo, hi = bands.ENTRY_BANDS[name]
    # mild burst shape: median just over the top, quiet pass inside ->
    # clean (no hard flag, not ambiguous enough for the soft one)
    clean = bands.out_of_band({name: hi * 1.2}, mins={name: hi * 0.9})
    assert not clean["entries"]
    # heavy burst shape: median far (>1.5x) over the top while the min
    # stayed inside -> surfaced as a SOFT flag (r18, ADVICE: an
    # intermittent real regression must not hide behind the min), but
    # still distinguishable from a hard violation
    soft = bands.out_of_band({name: hi * 3}, mins={name: hi * 0.9})
    assert soft["entries"][name]["soft"] is True
    assert soft["entries"][name]["sec"] == hi * 3
    # genuine regression: every pass over the top -> flagged, record
    # carries both the reported median and the confirming min
    viol = bands.out_of_band({name: hi * 3}, mins={name: hi * 2})
    assert viol["entries"][name] == {
        "sec": hi * 3,
        "min": hi * 2,
        "band": [lo, hi],
    }


def test_out_of_band_flags_legs_and_builds():
    (entry, leg), (llo, lhi) = next(iter(bands.LEG_BANDS.items()))
    bentry, (blo, bhi) = next(iter(bands.BUILD_BANDS.items()))
    legs = {
        entry: {"build": 0.0, "legs": {leg: lhi * 2}},
        bentry: {"build": bhi * 2, "legs": {}},
    }
    if entry == bentry:  # collapse if the same entry carries both
        legs = {entry: {"build": bhi * 2, "legs": {leg: lhi * 2}}}
    viol = bands.out_of_band({}, legs)
    assert viol["legs"][f"{entry}.{leg}"]["band"] == [llo, lhi]
    assert viol["builds"][bentry]["band"] == [blo, bhi]


def test_out_of_band_ignores_unbanded_names():
    viol = bands.out_of_band(
        {"zz_not_an_entry": 999.0},
        {"zz_not_an_entry": {"build": 999.0, "legs": {"zz": 999.0}}},
    )
    assert viol == {"entries": {}, "legs": {}, "builds": {}}
