"""GTID interval-set semantics (the real GTID_SUBSET relation, not the
reference's lexicographic shortcut)."""

from __future__ import annotations

import pytest

from xxt_cdc_spark.model.gtid import GTIDSet

U1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
U2 = "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"


class TestParse:
    def test_roundtrip_and_normalization(self):
        g = GTIDSet.parse(f"{U1}:1-5:6-10:12, {U2}:3")
        # adjacent ranges merge; singletons kept
        assert g.as_string() == f"{U1}:1-10:12,{U2}:3"

    def test_empty(self):
        assert GTIDSet.parse("").by_uuid == ()

    def test_bad_range(self):
        with pytest.raises(ValueError):
            GTIDSet.parse(f"{U1}:9-3")
        with pytest.raises(ValueError):
            GTIDSet.parse(U1)


class TestContainment:
    def test_subset(self):
        big = GTIDSet.parse(f"{U1}:1-100,{U2}:1-50")
        small = GTIDSet.parse(f"{U1}:5-10,{U2}:50")
        assert big.contains(small)
        assert not small.contains(big)

    def test_gap_not_contained(self):
        holey = GTIDSet.parse(f"{U1}:1-10:20-30")
        assert not holey.contains(GTIDSet.parse(f"{U1}:5-25"))
        assert holey.contains(GTIDSet.parse(f"{U1}:8-10"))

    def test_unknown_uuid(self):
        assert not GTIDSet.parse(f"{U1}:1-10").contains(GTIDSet.parse(f"{U2}:1"))


class TestCompare:
    def test_total_when_linear(self):
        a = GTIDSet.parse(f"{U1}:1-100")
        b = GTIDSet.parse(f"{U1}:1-150")
        assert a.compare(b) == -1
        assert b.compare(a) == 1
        assert a.compare(GTIDSet.parse(f"{U1}:1-100")) == 0

    def test_incomparable_divergence_surfaced(self):
        # the case the reference's string compare silently misjudges:
        # divergent multi-source progress has NO correct order
        a = GTIDSet.parse(f"{U1}:1-10,{U2}:1-5")
        b = GTIDSet.parse(f"{U1}:1-5,{U2}:1-10")
        assert a.compare(b) is None

    def test_string_compare_would_be_wrong(self):
        # lexicographic says '1-9' > '1-10'; interval semantics disagree
        a = GTIDSet.parse(f"{U1}:1-9")
        b = GTIDSet.parse(f"{U1}:1-10")
        assert (a.as_string() > b.as_string()) is True  # the naive answer
        assert a.compare(b) == -1  # the correct answer

    def test_union(self):
        a = GTIDSet.parse(f"{U1}:1-5")
        b = GTIDSet.parse(f"{U1}:4-9,{U2}:1")
        assert a.union(b).as_string() == f"{U1}:1-9,{U2}:1"
