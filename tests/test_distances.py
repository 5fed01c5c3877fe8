"""Distance-measure conformance — example vectors ported from the
reference's plugin annotations and test specs
(silk-rules/src/test/.../rule/plugins/distance/)."""

import math

import pytest

from silk_ray.kernel.distances import (
    DISTANCE_MEASURES,
    get_distance,
    levenshtein,
    q_grams,
)


def test_registry_coverage():
    expected = {
        "equality", "inequality", "constantDistance", "relaxedEquality",
        "numericEquality", "lowerThan", "greaterThan",
        "levenshteinDistance", "levenshtein", "jaro", "jaroWinkler",
        "qGrams", "startsWith", "isSubstring", "substring",
        "jaccard", "dice", "softjaccard", "cosine",
        "num", "date", "dateTime", "insideNumericInterval", "wgs84",
    }
    assert expected <= set(DISTANCE_MEASURES)


# -- equality (EqualityMetric.scala:29-42 @DistanceMeasureExamples) ----------
def test_equality_examples():
    m = get_distance("equality")
    assert m.apply(["max", "helmut"], ["max"]) == 0.0
    assert m.apply(["max", "helmut"], ["john"]) == 1.0


def test_equality_index_blocks_equal_values():
    m = get_distance("equality")
    i1 = m.index(["max"], 0.0, True)
    i2 = m.index(["max", "other"], 0.0, False)
    assert i1.matches(i2)
    assert not i1.matches(m.index(["john"], 0.0, False))


def test_inequality():
    m = get_distance("inequality")
    assert m.apply(["a"], ["b"]) == 0.0
    assert m.apply(["a"], ["a"]) == 1.0


def test_relaxed_equality():
    m = get_distance("relaxedEquality")
    assert m.apply(["Müller"], ["muller"]) == 0.0
    assert m.apply(["ñino"], ["nino"]) == 0.0
    assert m.apply(["abc"], ["abd"]) == 1.0
    assert m.index(["Müller"], 0.0, True).matches(m.index(["MULLER"], 0.0, False))


def test_numeric_equality():
    # examples from NumericEqualityMetric.scala description (precision 0.1)
    m = get_distance("numericEquality", precision=0.1)
    assert m.evaluate("1.3", "1.35") == 0.0
    assert m.evaluate("0.0", "0.9999") == 1.0  # |0-0.9999| > 0.1
    assert m.evaluate("1.2", "1.30001") == 1.0
    exact = get_distance("numericEquality")
    assert exact.evaluate("1.0", "1.00") == 0.0
    assert exact.evaluate("1.0", "1.1") == 1.0
    assert exact.evaluate("abc", "1.0") == 1.0


def test_lower_greater_than():
    lt = get_distance("lowerThan")
    assert lt.evaluate("1", "2") == 0.0
    assert lt.evaluate("2", "1") == 1.0
    assert lt.evaluate("2", "2") == 1.0
    lte = get_distance("lowerThan", orEqual=True)
    assert lte.evaluate("2", "2") == 0.0
    # autodetect: falls back to lexicographic for non-numbers
    assert lt.evaluate("apple", "banana") == 0.0
    gt = get_distance("greaterThan")
    assert gt.evaluate("2", "1") == 0.0
    assert gt.evaluate("1", "2") == 1.0


# -- levenshtein (LevenshteinDistance.scala) --------------------------------
def test_levenshtein_core():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0


def test_levenshtein_distance_measure():
    m = get_distance("levenshteinDistance")
    assert m.apply(["kitten"], ["sitting"]) == 3.0
    # min over cross product
    assert m.apply(["kitten", "sitting"], ["sitting"]) == 0.0
    # length-diff early exit past limit
    assert m.evaluate("ab", "abcdef", 2) == math.inf


def test_levenshtein_index_within_threshold_shares_block():
    m = get_distance("levenshteinDistance")
    for a, b in [("john", "jhon"), ("smith", "smyth"), ("hello", "hallo")]:
        ia = m.index([a], 2.0, True)
        ib = m.index([b], 2.0, False)
        assert ia.matches(ib), (a, b)


def test_normalized_levenshtein():
    m = get_distance("levenshtein")
    assert m.evaluate("kitten", "sitting") == pytest.approx(3 / 7)
    assert m.evaluate("", "") == 0.0


# -- jaro / jaroWinkler ------------------------------------------------------
def test_jaro_standard_values():
    m = get_distance("jaro")
    assert m.evaluate("MARTHA", "MARHTA") == pytest.approx(1 - 0.944444, abs=1e-4)
    assert m.evaluate("DWAYNE", "DUANE") == pytest.approx(1 - 0.822222, abs=1e-4)
    assert m.evaluate("abc", "abc") == 0.0
    assert m.evaluate("", "abc") == 1.0


def test_jaro_winkler():
    m = get_distance("jaroWinkler")
    assert m.evaluate("MARTHA", "MARHTA") == pytest.approx(1 - 0.961111, abs=1e-4)
    assert m.evaluate("abc", "abc") == 0.0


# -- qGrams (QGramsMetric.scala + StringUtils.qGrams padding) ---------------
def test_q_grams_padding():
    assert q_grams("ab", 2) == ["#a", "ab", "b#"]
    # "" padded with '#' boundaries on both sides → one gram "##"
    assert q_grams("", 2) == ["##"]


def test_qgrams_metric():
    m = get_distance("qGrams")
    assert m.evaluate("abc", "abc") == 0.0
    d = m.evaluate("abcd", "abcx")
    # grams: {#a,ab,bc,cd,d#} vs {#a,ab,bc,cx,x#}: ∩=3, ∪=7
    assert d == pytest.approx(1 - 3 / 7)
    assert m.index(["abc"], 0.5, True).matches(m.index(["abcd"], 0.5, False))


# -- token-based -------------------------------------------------------------
def test_jaccard():
    m = get_distance("jaccard")
    assert m.apply(["a", "b"], ["b", "c"]) == pytest.approx(1 - 1 / 3)
    assert m.apply(["a"], ["a"]) == 0.0
    assert m.apply([], []) == 0.0
    # values within jaccard-threshold share an index key
    i1 = m.index(["a", "b", "c"], 0.5, True)
    i2 = m.index(["a", "x", "y"], 0.5, False)
    assert i1.matches(i2)


def test_dice():
    m = get_distance("dice")
    assert m.apply(["a", "b"], ["b", "c"]) == pytest.approx(1 - 2 / 4)


def test_softjaccard():
    m = get_distance("softjaccard", maxDistance=1)
    # "johns" ~ "john" within lev 1 → treated equivalent
    assert m.apply(["john", "smith"], ["johns", "smith"]) == pytest.approx(0.0)
    hard = get_distance("jaccard")
    assert hard.apply(["john", "smith"], ["johns", "smith"]) > 0


def test_cosine_weighted_items():
    m = get_distance("cosine")
    # pre-weighted '<token> <weight>' items, ';'-separated
    assert m.evaluate("a 0.6;b 0.8", "a 0.6;b 0.8") == pytest.approx(0.0)
    assert m.evaluate("a 1.0", "b 1.0") == pytest.approx(1.0)


def test_token_cosine():
    m = get_distance("tokenCosine")
    assert m.apply(["a", "b"], ["a", "b"]) == pytest.approx(0.0)
    assert m.apply(["a"], ["b"]) == pytest.approx(1.0)


# -- numeric / temporal ------------------------------------------------------
def test_num_metric():
    m = get_distance("num", minValue=0.0, maxValue=100.0)
    assert m.evaluate("10", "12") == 2.0
    assert m.evaluate("abc", "12") == math.inf
    assert m.index_value("10", 5.0, True).matches(m.index_value("12", 5.0, False))


def test_date_metric():
    m = get_distance("date")
    assert m.evaluate("2020-01-01", "2020-01-11") == pytest.approx(10.0)
    assert m.index_value("2020-01-01", 30.0, True).matches(
        m.index_value("2020-01-15", 30.0, False)
    )


def test_datetime_metric():
    m = get_distance("dateTime")
    assert m.evaluate("2020-01-01T00:00:00", "2020-01-01T00:01:00") == 60.0


def test_inside_numeric_interval():
    m = get_distance("insideNumericInterval")
    assert m.apply(["1-10"], ["5"]) == 0.0
    assert m.apply(["1-10"], ["15"]) == 1.0


def test_wgs84():
    m = get_distance("wgs84", unit="km")
    # Berlin (52.52, 13.405) to Potsdam (52.39, 13.06) ≈ 26-28 km
    d = m.evaluate("52.52 13.405", "52.39 13.06")
    assert 20 < d < 35
    assert m.evaluate("POINT(13.405 52.52)", "52.52 13.405") == pytest.approx(0.0, abs=1e-6)


def test_startswith_and_substring_predicates():
    sw = get_distance("startsWith")
    assert sw.evaluate("foobar", "foo") == 0.0
    assert sw.evaluate("barfoo", "foo") == 1.0
    assert sw.index_value("foobar", 0.0, True).matches(sw.index_value("foo", 0.0, False))
    sub = get_distance("isSubstring")
    assert sub.evaluate("oba", "foobar") == 0.0
    assert sub.evaluate("xyz", "foobar") == 1.0


def test_stoilos_substring():
    m = get_distance("substring")
    assert m.evaluate("abcdef", "abcdef") == pytest.approx(0.0)
    assert m.evaluate("abcdef", "uvwxyz") == pytest.approx(1.0)
    assert m.evaluate("project alpha", "alpha project") < 0.5


def test_tokenwise_distance():
    # reference vectors: TokenwiseStringDistanceTest.scala:21-116
    m = get_distance(
        "tokenwiseDistance",
        metricName="levenshtein",
        stopwords="and or in on the a from thy mr mrs who",
        nonStopwordWeight=0.1,
        stopwordWeight=0.001,
    )
    assert m.evaluate("several seditious scribes", "several seditious scribes", 1.0) == 0.0
    assert m.evaluate("several seditious scribes", "scribes seditious several", 1.0) == 0.0
    assert m.evaluate("several seditious scribes", "several seditious scribes from caesarea", 1.0) == pytest.approx(0.251, abs=0.001)
    assert m.evaluate("several seditious scribes from caesarea", "several seditious scribes", 1.0) == pytest.approx(0.251, abs=0.001)
    assert m.evaluate("several seditious scibes", "several seditious scribes", 1.0) == pytest.approx(0.091, abs=0.001)
    assert m.evaluate("", "", 1.0) == 1.0
    assert m.evaluate("Anything", "", 1.0) == 1.0
    assert m.evaluate("", "Anything", 1.0) == 1.0
    assert m.evaluate("Hotel Hilton in Manhattan", "hotel hilton manhattan", 1.0) == pytest.approx(0.001, abs=0.001)
    # stopword weighting quirks
    assert m.evaluate("the", "thy", 1.0) == pytest.approx(0.5, abs=0.001)
    assert m.evaluate("and", "any", 1.0) == pytest.approx(0.9804, abs=0.001)
    assert m.evaluate("war", "was", 1.0) == pytest.approx(0.5, abs=0.001)
    assert m.evaluate("Mr Doe", "Mrs Dow", 1.0) == pytest.approx(0.5, abs=0.001)
    assert m.evaluate("Mr John Doe", "Mrs John Doe", 1.0) == pytest.approx(0.0, abs=0.0001)
    assert m.evaluate("Mr John Doe", "Mr John Doe", 1.0) == 0.0
    assert m.evaluate("the who", "the who", 1.0) == 0.0
    assert m.evaluate("the the", "the who", 1.0) == 0.5
    # only one of two identical tokens is matched
    assert m.evaluate("Hotel Hotel", "Hotel", 1.0) == pytest.approx(0.5, abs=0.001)
    assert m.evaluate("several seditious scribes", "several sedated scribes", 1.0) == pytest.approx(0.313, abs=0.001)


def test_tokenwise_distance_params():
    base = dict(
        metricName="levenshtein",
        stopwords="and or in on the a from thy mr mrs",
        nonStopwordWeight=0.1,
        stopwordWeight=0.001,
    )
    by_len = get_distance("tokenwiseDistance", adjustByTokenLength=True, **base)
    assert by_len.evaluate("Hotel Hotel", "Hotel", 1.0) == pytest.approx(0.5, abs=0.001)
    assert by_len.evaluate("Hotel California", "Hotel", 1.0) == pytest.approx(0.667, abs=0.001)
    ordered = get_distance("tokenwiseDistance", orderingImpact=0.5, **base)
    assert ordered.evaluate("several seditious scribes", "scribes seditious several", 1.0) == 0.5
    thresh = get_distance("tokenwiseDistance", matchThreshold=0.85, **base)
    assert thresh.evaluate("several seditious scribes", "several sedated scribes", 1.0) == pytest.approx(0.5, abs=0.001)
    special = get_distance(
        "tokenwiseDistance", metricName="levenshtein", stopwords="and for ould",
        nonStopwordWeight=1.0, stopwordWeight=0.0,
    )
    assert special.evaluate("Sirenia + Niobeth", "ould Sirenia and for Niobeth", 1.0) == 0.0
    only_stop = get_distance(
        "tokenwiseDistance", metricName="levenshtein", stopwords="Hotel",
        nonStopwordWeight=1.0, stopwordWeight=0.0,
    )
    assert only_stop.evaluate("Hotel California", "California", 1.0) == 0.0
    # equals jaccard with unit weights + matchThreshold=1.0
    jacc_like = get_distance(
        "tokenwiseDistance", metricName="levenshtein", stopwords="",
        nonStopwordWeight=1.0, stopwordWeight=1.0, matchThreshold=1.0,
    )
    jd = get_distance("jaccard")
    assert jacc_like.evaluate(
        "several seditious scribes", "several seditious scribes from caesarea", 1.0
    ) == pytest.approx(jd.apply(["several", "seditious", "scribes"], ["several", "seditious", "scribes", "from", "caesarea"], 1.0))
    # the comparison limit must not reach the inner metric: a token pair
    # with normalized distance in (limit, 1] still contributes a partial
    # match (reference computes inner scores exactly,
    # TokenwiseStringDistance.scala:148); with a banded inner
    # Levenshtein inheriting limit=0.5 this returned 0.667
    tw = get_distance(
        "tokenwiseDistance", metricName="levenshtein",
        nonStopwordWeight=1.0, stopwordWeight=1.0,
    )
    assert tw.evaluate("alpha brick", "alpha brxxx", 0.5) == pytest.approx(
        tw.evaluate("alpha brick", "alpha brxxx")
    )
    # blocking: >=1 shared token required
    idx1 = m_idx = get_distance("tokenwiseDistance", **base)
    assert idx1.index(["Hotel Hilton Manhattan"], 0.1, True).matches(
        m_idx.index(["hilton hotel"], 0.1, False)
    )


def test_parse_date_gate_is_exact_subset():
    """The fast-rejection gate in _parse_date must reject exactly the
    strings that would fail every accepted format anyway — including
    boundary cases (26-char microsecond timestamps, short years, digit-
    leading non-dates, document-sized text)."""
    import datetime as dt
    import random

    from silk_ray.kernel.distances import _parse_date

    def reference(s):
        for fmt in ("%Y-%m-%d", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%d %H:%M:%S"):
            try:
                return dt.datetime.strptime(s, fmt)
            except ValueError:
                continue
        return None

    cases = [
        "2026-08-19", "2026-08-19T12:34:56", "2026-08-19T12:34:56.123456",
        "2026-08-19 12:34:56", "500-01-01", "0001-01-01", "1-2-3",
        "not a date", "x" * 1000, "2026-08-19T12:34:56.1234567",  # 27 chars
        "9999-12-31T23:59:59.999999",  # exactly 26
        "1234 widgets and more text that is long", "", "20260819",
        "2026-08", "-2026-08-19",
    ]
    rng = random.Random(0)
    alphabet = "0123456789-T:. abcdef"
    cases += ["".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 40))) for _ in range(500)]
    for s in cases:
        assert _parse_date(s) == reference(s), repr(s)
