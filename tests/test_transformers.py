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
]


@pytest.mark.parametrize("tid,params,inputs,expected", VECTORS)
def test_transformer_vectors(tid, params, inputs, expected):
    t = get_transformer(tid, **params)
    assert t.apply([list(vs) for vs in inputs]) == expected


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
