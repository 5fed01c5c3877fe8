"""ValueType system conformance.

Ports the reference's ``@ValueTypeAnnotation`` valid/invalid vectors
(silk-core ValueType.scala) and ValueTypeTest / DateTimeValueTypeTest
(silk-core src/test .../entity/), then exercises the MappingTarget
validation path through CompiledTransform (TransformRule.scala:67,
MappingTarget.scala:32-44) including the vectorized fast path and the
typed-Arrow-output extension.
"""

import pyarrow as pa
import pytest

from silk_ray.kernel import valuetypes as vt
from silk_ray.kernel.rule import (
    CompiledTransform,
    TransformRule,
    transform_rule_from_dict,
)


# (type, validValues, invalidValues) — verbatim from @ValueTypeAnnotation.
ANNOTATION_VECTORS = [
    (vt.INTEGER, ["1", "-1234567890123456789012345678901234567890"], ["1.0"]),
    (vt.INT, ["1"], ["1.0", "1234567890123456789012345678901234567890"]),
    (
        vt.LONG,
        ["1", "9223372036854775807"],
        ["1.0", "1234567890123456789012345678901234567890"],
    ),
    (vt.FLOAT, ["1.9"], ["1,9"]),
    (vt.DOUBLE, ["1.9"], ["1,9"]),
    (
        vt.DECIMAL,
        ["+1234.456", "1234567890123456789012345678901234567890.1234567890"],
        ["1,9", "1.7.2017", "1.0E+2"],
    ),
    (vt.BOOLEAN, ["true", "false"], ["1", "none", "TRUE"]),
    (
        vt.ANY_DATE_TIME,
        ["---31", "2020-01-01", "2002-05-30T09:30:10"],
        ["123"],
    ),
    (vt.ANY_DATE, ["---31", "2020-01", "2020-01-01"], ["2002-05-30T09:30:10"]),
    (vt.DATE_TIME, ["2002-05-30T09:30:10"], ["31", "2020-01-01"]),
    (vt.DATE, ["2020-01-01"], ["31", "2002-05-30T09:30:10"]),
    (vt.YEAR, ["2020"], ["2020-01-01"]),
    (vt.YEAR_MONTH, ["2020-01"], ["2020"]),
    (vt.MONTH_DAY, ["--12-01"], ["--14-01", "2020"]),
    (vt.DAY, ["---31"], ["31", "32", "2020-01-01"]),
    (vt.MONTH, ["--12"], ["14", "2020-01-01"]),
    (vt.TIME, ["13:20:00"], ["31", "2020-01-01"]),
    (vt.DURATION, ["P5Y2M10D"], ["1s", "5min"]),
    (vt.WKT, ["POINT (30 10)", "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))"], []),
]


@pytest.mark.parametrize("typ,good,bad", ANNOTATION_VECTORS, ids=lambda x: getattr(x, "id", None))
def test_annotation_vectors(typ, good, bad):
    for v in good:
        assert typ.validate(v), f"{typ.id} rejected valid {v!r}"
    for v in bad:
        assert not typ.validate(v), f"{typ.id} accepted invalid {v!r}"


@pytest.mark.parametrize("typ,good,bad", ANNOTATION_VECTORS, ids=lambda x: getattr(x, "id", None))
def test_validate_array_agrees_with_scalar(typ, good, bad):
    values = good + bad + [None]
    mask = typ.validate_array(pa.array(values, type=pa.string())).to_pylist()
    expected = [v is None or typ.validate(v) for v in values]
    assert mask == expected


def test_datetime_value_type_vectors():
    """DateTimeValueTypeTest.scala verbatim."""
    dt = vt.ANY_DATE_TIME
    for ok in ["2017-08-23", "2002-09-24-06:00", "09:30:10", "09:30:10.5",
               "2002-05-30T09:30:10"]:
        assert dt.validate(ok), ok
    for nok in ["2017-08-XX", "1.7.2017", "9:30"]:
        assert not dt.validate(nok), nok
    assert vt.xml_schema_type_uri("2017-08-23") == vt.XSD + "date"
    assert vt.xml_schema_type_uri("09:30:10") == vt.XSD + "time"
    assert vt.xml_schema_type_uri("2002-05-30T09:30:10") == vt.XSD + "dateTime"


def test_calendar_field_cross_validation():
    # XMLGregorianCalendar rejects impossible dates, not just bad lexicals
    assert not vt.DATE.validate("2021-02-29")  # non-leap year
    assert vt.DATE.validate("2020-02-29")
    assert not vt.DATE.validate("2020-04-31")
    assert not vt.MONTH_DAY.validate("--02-30")
    assert vt.MONTH_DAY.validate("--02-29")  # valid in leap years -> valid


def test_uri_value_types():
    for t in (vt.URI, vt.URI_LITERAL):
        assert t.validate("http://example.org/resource/A%20B")
        assert t.validate("urn:isbn:0451450523")
        assert not t.validate("not a uri")       # space
        assert not t.validate("relative/path")   # not absolute
        assert not t.validate("http://x.org/<a>")  # illegal chars
        assert not t.validate("http://x.org/%2")   # broken escape
    assert vt.URI.uri is None
    assert vt.URI_LITERAL.uri == vt.XSD + "anyURI"


def test_trivial_types_accept_everything():
    for t in (vt.UNTYPED, vt.STRING, vt.BLANK_NODE, vt.WKT,
              vt.custom_value_type("http://t"), vt.language_value_type("en")):
        assert t.validate("anything at all ~~ 123")


def test_registry_resolution():
    assert vt.value_type_by_id("LongValueType").id == "LongValueType"
    # legacy '$' suffix stripped (ValueType.scala:149)
    assert vt.value_type_by_id("LongValueType$") is vt.LONG
    # outdated AutoDetect id -> String (ValueType.scala:100-103)
    assert vt.value_type_by_id("AutoDetectValueType") is vt.STRING
    # the reference's shipped typo id resolves (ValueType.scala:630)
    assert vt.value_type_by_id("YeahMonthValueType") is vt.YEAR_MONTH
    cu = vt.value_type_by_id("CustomValueType", uri="http://my/type")
    assert cu.uri == "http://my/type" and cu.validate("x")
    lang = vt.value_type_by_id("LanguageValueType", lang="de")
    assert lang.label == "@de"
    with pytest.raises(vt.ValueTypeValidationError):
        vt.value_type_by_id("NoSuchType")
    with pytest.raises(vt.ValueTypeValidationError):
        vt.value_type_by_id("CustomValueType")  # uri attribute required
    with pytest.raises(vt.ValueTypeValidationError):
        vt.value_type_by_id("LanguageValueType")  # lang attribute required


def test_mapping_target_validate_messages():
    mt = vt.MappingTarget("p", vt.INT)
    mt.validate(["1", "2"])
    with pytest.raises(vt.ValueTypeValidationError, match="'1.5' is not a valid Int"):
        mt.validate(["1", "1.5"])
    single = vt.MappingTarget("p", vt.STRING, is_attribute=True)
    single.validate(["only"])
    with pytest.raises(vt.ValueTypeValidationError, match="only allowed to have one value"):
        single.validate(["a", "b"])


def test_sort_keys_order_like_reference():
    assert sorted(["10", "9", "-3"], key=vt.INTEGER.sort_key) == ["-3", "9", "10"]
    assert sorted(["10.5", "9.25"], key=vt.DOUBLE.sort_key) == ["9.25", "10.5"]
    assert sorted(["2020-02-01", "2019-12-31"], key=vt.DATE.sort_key)[0] == "2019-12-31"
    # duration: 1 day < 25 hours; 1 year > 11 months
    assert vt.DURATION.sort_key("P1D") < vt.DURATION.sort_key("PT25H")
    assert vt.DURATION.sort_key("P1Y") > vt.DURATION.sort_key("P11M")
    assert vt.DURATION.sort_key("-P1D") < vt.DURATION.sort_key("P0D")


# ------------------------------------------------------- transform wiring


def _transform(rules, table, **kw):
    return CompiledTransform(rules, **kw)(table)


def test_typed_target_errors_in_error_column_vectorized_path():
    # single string column + Int target -> vectorized path with validation
    rule = transform_rule_from_dict(
        {"target": "n", "input": {"path": "v"}, "value_type": "IntValueType"}
    )
    out = _transform([rule], pa.table({"v": ["1", "nope", "3"]}))
    assert out["n"].to_pylist() == ["1", None, "3"]
    errs = out["error"].to_pylist()
    assert errs[0] is None and errs[2] is None
    assert "not a valid Int" in errs[1]


def test_typed_target_errors_row_path_matches_vectorized():
    # multi-input rule (concat) forces the per-row path; same error shape
    spec = {
        "target": "n",
        "value_type": "IntValueType",
        "input": {
            "transform": "concat",
            "inputs": [{"path": "a"}, {"path": "b"}],
        },
    }
    rule = transform_rule_from_dict(spec)
    out = _transform([rule], pa.table({"a": [["1"], ["x"]], "b": [["2"], ["y"]]}))
    assert out["n"].to_pylist() == ["12", None]
    assert "not a valid Int" in out["error"].to_pylist()[1]


def test_typed_output_casts_arrow_schema():
    rules = [
        transform_rule_from_dict(
            {"target": "n", "input": {"path": "v"}, "value_type": "LongValueType"}
        ),
        transform_rule_from_dict(
            {"target": "f", "input": {"path": "w"}, "value_type": "DoubleValueType"}
        ),
        transform_rule_from_dict(
            {"target": "b", "input": {"path": "x"}, "value_type": "BooleanValueType"}
        ),
        transform_rule_from_dict(
            {"target": "d", "input": {"path": "y"}, "value_type": "DateValueType"}
        ),
    ]
    out = _transform(
        rules,
        pa.table(
            {
                "v": ["7", "-9"],
                "w": ["1.5", "2.5"],
                "x": ["true", "false"],
                "y": ["2020-01-02", "1999-12-31"],
            }
        ),
        typed_output=True,
    )
    assert out.schema.field("n").type == pa.int64()
    assert out.schema.field("f").type == pa.float64()
    assert out.schema.field("b").type == pa.bool_()
    assert out.schema.field("d").type == pa.date32()
    assert out["n"].to_pylist() == [7, -9]
    assert out["b"].to_pylist() == [True, False]
    assert str(out["d"].to_pylist()[0]) == "2020-01-02"


def test_typed_output_invalid_rows_null_after_cast():
    rule = transform_rule_from_dict(
        {"target": "n", "input": {"path": "v"}, "value_type": "IntValueType"}
    )
    out = _transform([rule], pa.table({"v": ["5", "oops"]}), typed_output=True)
    assert out.schema.field("n").type == pa.int32()
    assert out["n"].to_pylist() == [5, None]
    assert "not a valid Int" in out["error"].to_pylist()[1]


def test_is_attribute_cardinality_error():
    # multi-valued transformer output against a single-value attribute
    spec = {
        "target": "t",
        "is_attribute": True,
        "input": {"transform": "tokenize", "inputs": [{"path": "s"}]},
    }
    rule = transform_rule_from_dict(spec)
    out = _transform([rule], pa.table({"s": [["one two"], ["single"]]}))
    assert "only allowed to have one value" in out["error"].to_pylist()[0]
    assert out["t"].to_pylist()[1] == "single"


def test_untyped_rules_unchanged():
    # default STRING target: no validation, no error column, plain strings
    rule = transform_rule_from_dict({"target": "u", "input": {"path": "v"}})
    out = _transform([rule], pa.table({"v": ["a", "b"]}))
    assert out.column_names == ["u"]
    assert out["u"].to_pylist() == ["a", "b"]


def test_transform_rule_apply_validates():
    rule = TransformRule(target="n", input=transform_rule_from_dict(
        {"target": "n", "input": {"path": "v"}}).input, value_type=vt.BOOLEAN)
    assert rule.apply({"v": ["true"]}) == ["true"]
    with pytest.raises(vt.ValueTypeValidationError):
        rule.apply({"v": ["yes"]})
