"""Transformer conformance — example vectors ported from the reference's
@TransformExamples annotations (silk-rules/.../rule/plugins/transformer/)."""

import pytest

from silk_ray.kernel.transformers import TRANSFORMERS, get_transformer

# (id, params, inputs, expected)
VECTORS = [
    # ConcatTransformer.scala @TransformExamples
    ("concat", {}, [], []),
    ("concat", {}, [["a"]], ["a"]),
    ("concat", {}, [["a"], ["b"]], ["ab"]),
    ("concat", {"glue": "-"}, [["First"], ["Last"]], ["First-Last"]),
    ("concat", {"glue": "-"}, [["First"], ["Second", "Third"]], ["First-Second", "First-Third"]),
    ("concat", {"glue": "-"}, [["First"], [""], ["Second"]], ["First--Second"]),
    ("concat", {"glue": "-"}, [["First"], [], ["Second"]], []),
    ("concat", {"glue": "-", "missingValuesAsEmptyStrings": True}, [["First"], [], ["Second"]], ["First--Second"]),
    # ConcatMultipleValuesTransformer.scala
    ("concatMultiValues", {}, [], []),
    ("concatMultiValues", {}, [["a"]], ["a"]),
    ("concatMultiValues", {}, [["a", "b"]], ["ab"]),
    ("concatMultiValues", {"glue": "x"}, [["a", "b"]], ["axb"]),
    ("concatMultiValues", {}, [["a", "b"], ["1", "2"]], ["ab", "12"]),
    # Tokenizer.scala
    ("tokenize", {}, [["Hello World"]], ["Hello", "World"]),
    ("tokenize", {"regex": ","}, [[".175,.050"]], [".175", ".050"]),
    # NumOperationTransformer.scala
    ("numOperation", {"operator": "+"}, [["1"], ["1"]], ["2.0"]),
    ("numOperation", {"operator": "-"}, [["1"], ["1"]], ["0.0"]),
    ("numOperation", {"operator": "*"}, [["5"], ["6"]], ["30.0"]),
    ("numOperation", {"operator": "/"}, [["5"], ["2"]], ["2.5"]),
    ("numOperation", {"operator": "+"}, [["1"], ["no number"]], []),
    ("numOperation", {"operator": "*"}, [["1"], []], []),
    # normalize family
    ("lowerCase", {}, [["AbC"]], ["abc"]),
    ("upperCase", {}, [["AbC"]], ["ABC"]),
    ("capitalize", {}, [["abc"]], ["Abc"]),
    ("trim", {}, [["  a b  "]], ["a b"]),
    ("alphaReduce", {}, [["a1b2c3!"]], ["abc"]),
    ("removeBlanks", {}, [["a b c"]], ["abc"]),
    ("removeSpecialChars", {}, [["a.b,c!"]], ["abc"]),
    ("removeParentheses", {}, [["title (remark)"]], ["title"]),
    ("removeDuplicates", {}, [["a", "b", "a"]], ["a", "b"]),
    # filter family
    ("filterByLength", {"min": 2}, [["a", "ab", "abc"]], ["ab", "abc"]),
    ("filterByRegex", {"regex": "^a"}, [["apple", "banana"]], ["apple"]),
    ("removeEmptyValues", {}, [["a", "", "b"]], ["a", "b"]),
    ("removeValues", {"blacklist": "x,y"}, [["a", "x", "b", "y"]], ["a", "b"]),
    # replace / extraction / substring
    ("replace", {"search": "a", "replace": "o"}, [["banana"]], ["bonono"]),
    ("regexReplace", {"regex": "[0-9]+", "replace": "#"}, [["a1b22c"]], ["a#b#c"]),
    ("regexExtract", {"regex": "[0-9]+"}, [["a1b22c"]], ["1", "22"]),
    ("stripPrefix", {"prefix": "pre-"}, [["pre-x", "y"]], ["x", "y"]),
    ("stripPostfix", {"postfix": ".txt"}, [["a.txt"]], ["a"]),
    # StripUriPrefixTransformer.scala @TransformExamples
    ("stripUriPrefix", {}, [["http://example.org/some/path/to/value"]], ["value"]),
    ("stripUriPrefix", {}, [["urn:scheme:value"]], ["value"]),
    ("stripUriPrefix", {}, [["http://example.org/some/path/to/encoded%20v%C3%A4lue"]], ["encoded v\u00e4lue"]),
    ("stripUriPrefix", {}, [["value"]], ["value"]),
    ("stripUriPrefix", {}, [["http://ex.org/res#Name"]], ["Name"]),
    ("substring", {"beginIndex": 1, "endIndex": 3}, [["abcdef"]], ["bc"]),
    ("untilCharacter", {"untilCharacter": "-"}, [["abc-def"]], ["abc"]),
    # conditional
    ("ifExists", {}, [["x"], ["then"], ["else"]], ["then"]),
    ("ifExists", {}, [[], ["then"], ["else"]], ["else"]),
    ("containsAllOf", {}, [["a", "b", "c"], ["a", "b"]], ["true"]),
    ("containsAllOf", {}, [["a", "b"], ["a", "z"]], ["false"]),
    ("containsAnyOf", {}, [["a", "b"], ["z", "b"]], ["true"]),
    # CompareNumbersTransformer semantics (max/min set comparison, 1/0)
    ("compareNumbers", {"comparator": "<"}, [["1", "2"], ["3", "4"]], ["1"]),
    ("compareNumbers", {"comparator": "<"}, [["1", "2"], ["2", "3"]], ["0"]),
    ("compareNumbers", {"comparator": ">"}, [["5"], ["1", "2"]], ["1"]),
    ("compareNumbers", {"comparator": "="}, [["2", "2"], ["2"]], ["1"]),
    ("compareNumbers", {"comparator": "<"}, [["1"], ["not a number"]], ["0"]),
    # UriFixTransformer.scala @TransformExamples
    ("uriFix", {}, [["ab"]], ["urn:url-encoded-value:ab"]),
    ("uriFix", {}, [["a&b"]], ["urn:url-encoded-value:a%26b"]),
    ("uriFix", {}, [["http://example.org/some/path"]], ["http://example.org/some/path"]),
    ("uriFix", {}, [["urn:valid:uri"]], ["urn:valid:uri"]),
    ("uriFix", {}, [["http : invalid URI"]], ["urn:url-encoded-value:http+%3A+invalid+URI"]),
    ("negate", {}, [["0", "1", "false", "true", "False", "True"]], ["1", "0", "true", "false", "true", "false"]),
    # numeric extras
    ("count", {}, [["a", "b"], ["c"]], ["3"]),
    ("aggregateNumbers", {"operator": "sum"}, [["1", "2"], ["3"]], ["6.0"]),
    ("aggregateNumbers", {"operator": "min"}, [["4", "2"]], ["2.0"]),
    ("aggregateNumbers", {"operator": "average"}, [["1", "3"]], ["2.0"]),
    ("numReduce", {}, [["a1b2"]], ["12"]),
    ("formatNumber", {"format": "%.1f"}, [["3.14159"]], ["3.1"]),
    # map / selection / sequence / value
    ("map", {"mapping": "a:1,b:2"}, [["a", "b", "c"]], ["1", "2"]),
    ("mapWithDefault", {"mapping": "a:1", "default": "?"}, [["a", "z"]], ["1", "?"]),
    ("coalesce", {}, [[], ["x"], ["y"]], ["x"]),
    ("regexSelect", {"regex": "^a"}, [["apple", "banana"]], ["apple"]),
    ("getValueByIndex", {"index": 1}, [["a", "b", "c"]], ["b"]),
    ("valuesToIndexes", {}, [["x", "y"]], ["0", "1"]),
    ("constant", {"value": "k"}, [["whatever"]], ["k"]),
    ("defaultValue", {"value": "d"}, [[]], ["d"]),
    ("defaultValue", {"value": "d"}, [["x"]], ["x"]),
    ("emptyValue", {}, [["x"]], [""]),
    # tokenization
    ("camelCaseTokenizer", {}, [["camelCaseWord"]], ["camel", "Case", "Word"]),
    # dates
    ("parseDate", {"format": "dd-MM-yyyy"}, [["03-02-2019"]], ["2019-02-03"]),
    ("dateToTimestamp", {}, [["1970-01-02"]], ["86400"]),
    ("timestampToDate", {}, [["86400"]], ["1970-01-02"]),
    ("durationInDays", {}, [["2020-01-01"], ["2020-01-11"]], ["10"]),
    # CompareDatesTransformer.scala @TransformExamples
    ("compareDates", {"comparator": "<"}, [["2017-01-01"], ["2017-01-02"]], ["1"]),
    ("compareDates", {"comparator": "<"}, [["2017-01-02"], ["2017-01-01"]], ["0"]),
    ("compareDates", {"comparator": ">"}, [["2017-01-02"], ["2017-01-01"]], ["1"]),
    ("compareDates", {"comparator": "="}, [["2017-01-01"], ["2017-01-01"]], ["1"]),
    # linguistic
    ("soundex", {}, [["Robert"]], ["R163"]),
    ("soundex", {}, [["Rupert"]], ["R163"]),
    ("soundex", {}, [["Tymczak"]], ["T522"]),
    ("stem", {}, [["running"]], ["run"]),
    ("stem", {}, [["relational"]], ["relat"]),
    # MapTransformerWithDefaultInput.scala: misses take the positional
    # default from input 2; a short default list replicates its last value
    ("mapWithDefaultInput", {"mapping": "A:1,B:2"}, [["A", "X", "B"], ["d1", "d2", "d3"]], ["1", "d2", "2"]),
    ("mapWithDefaultInput", {"mapping": "A:1"}, [["X", "Y", "A"], ["d"]], ["d", "d", "1"]),
    # reference plugin-id aliases (annotation ids differ in spelling)
    ("NYSIIS", {}, [["Robert"]], ["RABAD"]),
    ("negateTransformer", {}, [["true"]], ["false"]),
    # CamelCaseTokenizer.scala @TransformExamples (exact reference rule)
    ("camelcasetokenizer", {}, [["camelCaseString"]], ["camel", "Case", "String"]),
    ("camelcasetokenizer", {}, [["nocamelcase"]], ["nocamelcase"]),
    # digits never open a boundary in the reference rule (isLower on a
    # digit is false); the regex variant camelCaseTokenizer does split
    ("camelcasetokenizer", {}, [["a9X"]], ["a9X"]),
    ("camelCaseTokenizer", {}, [["a9X"]], ["a9", "X"]),
    # DateToTimestampTransformer.scala @TransformExamples (id datetoTimestamp)
    ("datetoTimestamp", {}, [["2017-07-03T21:32:52Z"]], ["1499117572000"]),
    ("datetoTimestamp", {}, [["2017-07-03T21:32:52+01:00"]], ["1499113972000"]),
    ("datetoTimestamp", {"unit": "seconds"}, [["2017-07-03T21:32:52+01:00"]], ["1499113972"]),
    ("datetoTimestamp", {}, [["2017-07-03"]], ["1499040000000"]),
    # TimestampToDateTransformer.scala @TransformExamples (id timeToDate)
    ("timeToDate", {}, [["1499117572000"]], ["2017-07-03T21:32:52Z"]),
    ("timeToDate", {"format": "yyyy-MM-dd"}, [["1499040000000"]], ["2017-07-03"]),
    ("timeToDate", {"format": "yyyy-MM-dd", "unit": "seconds"}, [["1499040000"]], ["2017-07-03"]),
]


@pytest.mark.parametrize("tid,params,inputs,expected", VECTORS)
def test_transformer_vectors(tid, params, inputs, expected):
    t = get_transformer(tid, **params)
    assert t.apply([list(vs) for vs in inputs]) == expected


def test_map_with_default_input_raises():
    t = get_transformer("mapWithDefaultInput", mapping="A:1")
    with pytest.raises(ValueError):
        t.apply([["A"]])
    with pytest.raises(ValueError):
        t.apply([["A"], []])


def test_validation_raises():
    from silk_ray.kernel.transformers import ValidationError

    v = get_transformer("validateNumericRange", min=0, max=10)
    assert v.apply([["5"]]) == ["5"]
    with pytest.raises(ValidationError):
        v.apply([["50"]])
    r = get_transformer("validateRegex", regex="[0-9]+")
    assert r.apply([["123"]]) == ["123"]
    with pytest.raises(ValidationError):
        r.apply([["12a"]])


def test_uuid_deterministic():
    t = get_transformer("uuid")
    assert t.apply([["x"]]) == t.apply([["x"]])
    assert t.apply([["x"]]) != t.apply([["y"]])


def test_phonetic_same_sound_same_code():
    for tid in ("soundex", "metaphone"):
        t = get_transformer(tid)
        assert t.apply([["Smith"]]) == t.apply([["Smyth"]]), tid
    # strict NYSIIS keeps Y; canonical vector instead
    ny = get_transformer("nysiis")
    assert ny.apply([["MACINTOSH"]]) == ["MCANT"]


def test_registry_size():
    # broad coverage of the reference's transformer inventory (SURVEY.md §2.2)
    assert len(TRANSFORMERS) >= 55


def test_duration_family():
    # NumberToDurationTransformerTest.scala:24-26
    t = get_transformer("numberToDuration", unit="day")
    assert t.apply([["4"]]) == ["P4DT0H0M0.000S"]
    assert t.apply([["0"]]) == ["PT0.000S"]
    assert get_transformer("numberToDuration", unit="seconds").apply([["90"]]) == ["PT0H1M30.000S"]
    assert get_transformer("numberToDuration", unit="month").apply([["5"]]) == ["P0Y5M"]
    assert get_transformer("numberToDuration", unit="year").apply([["2"]]) == ["P2Y0M"]
    # duration between two dateTimes (DurationTransformer.scala)
    d = get_transformer("duration")
    assert d.apply([["2020-01-01"], ["2020-01-05"]]) == ["P4DT0H0M0.000S"]
    assert d.apply([["2020-01-05"], ["2020-01-01"]]) == ["-P4DT0H0M0.000S"]
    assert d.apply([["2020-01-01T00:00:00"], ["2020-01-01T01:30:00"]]) == ["PT1H30M0.000S"]
    # conversions (DurationInSeconds/YearsTransformer.scala)
    s = get_transformer("durationInSeconds")
    assert float(s.apply([["P1DT0H0M0.000S"]])[0]) == 86400.0
    assert float(s.apply([["PT1M30.000S"]])[0]) == 90.0
    y = get_transformer("durationInYears")
    assert float(y.apply([["P365DT6H0M0.000S"]])[0]) == pytest.approx(1.0)
    # currentDate emits an ISO timestamp
    cur = get_transformer("currentDate").apply([])
    assert len(cur) == 1 and cur[0][:2] == "20" and "T" in cur[0]


def test_validate_date_transformers():
    from silk_ray.kernel.transformers import ValidationError

    # ValidateDateAfter.scala @TransformExamples
    v = get_transformer("validateDateAfter")
    with pytest.raises(ValidationError):
        v.apply([["2015-04-02"], ["2015-04-03"]])
    assert v.apply([["2015-04-04"], ["2015-04-03"]]) == ["2015-04-04"]
    assert get_transformer("validateDateAfter", allowEqual=True).apply(
        [["2015-04-03"], ["2015-04-03"]]
    ) == ["2015-04-03"]
    with pytest.raises(ValidationError):
        get_transformer("validateDateAfter", allowEqual=False).apply(
            [["2015-04-03"], ["2015-04-03"]]
        )
    r = get_transformer("validateDateRange", minDate="1900-01-01", maxDate="2000-12-12")
    assert r.apply([["1950-06-15"]]) == ["1950-06-15"]
    with pytest.raises(ValidationError):
        r.apply([["2001-01-01"]])
    with pytest.raises(ValidationError):
        r.apply([["1899-12-31"]])


def test_convert_charset():
    t = get_transformer("convertCharset", sourceCharset="ISO-8859-1", targetCharset="UTF-8")
    # 'é' encoded latin-1 (0xE9) read back as UTF-8 is invalid → replacement
    assert t.apply([["abc"]]) == ["abc"]
    assert t.apply([["café"]]) == ["caf�"]
    rt = get_transformer("convertCharset", sourceCharset="UTF-8", targetCharset="ISO-8859-1")
    assert rt.apply([["café"]]) == ["cafÃ©"]
    with pytest.raises(ValueError):
        get_transformer("convertCharset", sourceCharset="no-such-charset")


def test_random_number():
    t = get_transformer("randomNumber", min=5.0, max=6.0, minCount=2, maxCount=4, seed=7)
    out = t.apply([])
    assert 2 <= len(out) <= 4
    assert all(5.0 <= float(v) <= 6.0 for v in out)
    # seeded → deterministic
    again = get_transformer("randomNumber", min=5.0, max=6.0, minCount=2, maxCount=4, seed=7)
    assert again.apply([]) == out


def test_physical_quantity_extractor():
    # PhysicalQuantityExtractorTest.scala:9-40
    def extract(value, symbol, fmt="en", index=0):
        t = get_transformer("extractPhysicalQuantity", symbol=symbol, numberFormat=fmt, index=index)
        out = t.apply([[value]])
        return float(out[0]) if out else None

    assert extract("0.1F", "F") == pytest.approx(0.1)
    assert extract("230V", "V") == 230
    assert extract("-100C", "C") == -100
    assert extract("50km", "m") == 50000
    assert extract("500mV", "V") == pytest.approx(0.5)
    assert extract("10.5m", "m") == 10.5
    assert extract("10,5m", "m", "de") == 10.5
    assert extract("10,000.5m", "m") == 10000.5
    assert extract("10.000,5m", "m", "de") == 10000.5
    assert extract("Capacitor 10000pF 10V ### durable", "F") == pytest.approx(1e-8)
    assert extract("Capacitor 10000pF 10V ### durable", "V") == 10
    assert extract("74LVC387xxx/f50_5.4V/3.45V_XXX", "V") == pytest.approx(5.4)
    assert extract("74LVC387xxx/f50_5.4V_3.45V_XXX", "V") == pytest.approx(5.4)
    assert extract("2.7V/5.5V", "V", index=0) == pytest.approx(2.7)
    assert extract("2.7V/5.5V", "V", index=1) == pytest.approx(5.5)
    assert extract("2.7V/5.5V", "V", index=2) is None
    # filter param: only extract when the regex matches
    t = get_transformer("extractPhysicalQuantity", symbol="V", filter="capacitor")
    assert t.apply([["resistor 10V"]]) == []
    assert t.apply([["Capacitor 10V"]]) == ["10.0"]


def test_regex_replace_python_only_syntax():
    # RE2 rejects lookarounds/backreferences; the vectorized Arrow path
    # must be disabled (not crash the task) and per-row Python used.
    import pyarrow as pa

    from silk_ray.kernel.rule import CompiledTransform, transform_rule_from_dict

    t = get_transformer("regexReplace", regex=r"(\w)\1", replace="X")
    assert t.evaluate_array is None
    assert t.apply([["aabb", "abc"]]) == ["XX", "abc"]
    simple = get_transformer("regexReplace", regex="b+", replace="B")
    assert simple.evaluate_array is not None
    rule = transform_rule_from_dict(
        {"target": "out", "input": {"transform": "regexReplace",
         "params": {"regex": r"(?<=a)b", "replace": "X"}, "inputs": [{"path": "s"}]}}
    )
    out = CompiledTransform([rule])(pa.table({"s": ["ab", "cb"]}))
    assert out["out"].to_pylist() == ["aX", "cb"]
    assert "error" not in out.column_names


def test_negate_transformer_exceptions():
    # conditional/Negate.scala @TransformExamples: unrecognized value
    # and empty input both throw
    t = get_transformer("negateTransformer")
    with pytest.raises(ValueError):
        t.apply([["falsee", "true"]])
    with pytest.raises(ValueError):
        t.apply([[]])


def test_nysiis_standard_and_refined():
    """No reference vectors exist (the reference delegates to the
    StringMetric library); standard vectors hand-traced from the Taft
    (1970) algorithm and cross-checked against widely published values;
    refined applies the documented Lynch-Arends deltas."""
    std = get_transformer("nysiis", refined=False)
    assert std.apply([["KNIGHT"]]) == ["NAGT"]
    assert std.apply([["MITCHELL"]]) == ["MATCAL"]
    assert std.apply([["MACINTOSH"]]) == ["MCANT"]
    ref = get_transformer("NYSIIS")  # reference default: refined=True
    # refined keeps the initial K (only MAC/PF initials transcode)
    assert ref.apply([["KNIGHT"]]) == ["KNAGT"]
    # trailing S/Z stripped before encoding
    assert ref.apply([["Joneses"]]) == ref.apply([["Jonese"]])
    # homophones collide under both variants (strict NYSIIS keeps Y,
    # so Smith/Smyth deliberately do NOT collide)
    for t in (std, ref):
        assert t.apply([["Green"]]) == t.apply([["Greene"]])


def test_read_parameter(tmp_path):
    # silk-workspace/.../value/ReadParameter.scala: java .properties
    p = tmp_path / "conf.properties"
    p.write_bytes(
        b"# comment\n"
        b"! also comment\n"
        b"greeting = hello\\u0021\n"
        b"path:C\\\\temp\n"
        b"multi = one \\\n    two\n"
        b"spaced value-with-space\n"
    )
    t = get_transformer("readParameter", resource=str(p), parameter="greeting")
    assert t.apply([["ignored", "inputs"]]) == ["hello!"]
    assert get_transformer("readParameter", resource=str(p), parameter="path").apply([]) == ["C\\temp"]
    assert get_transformer("readParameter", resource=str(p), parameter="multi").apply([]) == ["one two"]
    assert get_transformer("readParameter", resource=str(p), parameter="spaced").apply([]) == ["value-with-space"]
    with pytest.raises(ValueError, match="does not provide"):
        get_transformer("readParameter", resource=str(p), parameter="missing")
