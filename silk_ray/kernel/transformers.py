"""Transformers — per-record value functions composing into trees.

Contract mirrors the reference
(``silk-rules/.../rule/input/Transformer.scala:23-38``):
``apply(values: list[list[str]]) -> list[str]`` where each element of
``values`` is the multi-valued output of one input operator.
``SimpleTransformer`` reduces it to a per-value ``evaluate(str) -> str``
mapped over the concatenation of all inputs
(``input/SimpleTransformer.scala:65-81``).

Each class documents the reference plugin it matches (112 transformer
classes live under ``silk-rules/.../rule/plugins/transformer/``; we
implement the subset relevant for code/text payloads plus the numeric
and date families).

Vectorization: transformers may additionally define
``evaluate_array(pa.Array) -> pa.Array`` operating on an Arrow string
array; the transform compiler (silk_ray.kernel.rule) uses it for
single-valued columns inside ``map_batches`` hot paths.
"""

from __future__ import annotations

import math
import re
import urllib.parse
import uuid as _uuid
from itertools import product as _product

TRANSFORMERS: dict[str, type] = {}


def register_transformer(cls):
    TRANSFORMERS[cls.id] = cls
    return cls


def get_transformer(plugin_id: str, **params) -> "Transformer":
    return TRANSFORMERS[plugin_id](**params)


def parse_double(s: str) -> float | None:
    try:
        return float(s)
    except (TypeError, ValueError):
        return None


class Transformer:
    id: str = ""

    def apply(self, values: list[list[str]]) -> list[str]:
        raise NotImplementedError

    def __call__(self, values):
        return self.apply(values)


class SimpleTransformer(Transformer):
    def evaluate(self, value: str) -> str:
        raise NotImplementedError

    def apply(self, values):
        return [self.evaluate(v) for vs in values for v in vs]

    # optional Arrow fast path; subclasses override when a pyarrow.compute
    # kernel exists (used by the compiled transform stage)
    evaluate_array = None


# ---------------------------------------------------------------------------
# combine (transformer/combine/)
# ---------------------------------------------------------------------------


@register_transformer
class ConcatTransformer(Transformer):
    """Pairwise cross-concat of the inputs (ConcatTransformer.scala)."""

    id = "concat"

    def __init__(self, glue: str = "", missingValuesAsEmptyStrings: bool = False):
        self.glue = glue
        self.missing_as_empty = missingValuesAsEmptyStrings

    def apply(self, values):
        if not values:
            return []
        if len(values) == 1:
            return list(values[0])
        if self.missing_as_empty:
            values = [vs if vs else [""] for vs in values]
        return [self.glue.join(combo) for combo in _product(*values)]


@register_transformer
class ConcatMultipleValuesTransformer(Transformer):
    """Concatenate the values of each input (ConcatMultipleValuesTransformer.scala)."""

    id = "concatMultiValues"

    def __init__(self, glue: str = "", removeDuplicates: bool = False):
        self.glue = glue
        self.remove_duplicates = removeDuplicates

    def apply(self, values):
        out = []
        for vs in values:
            if not vs:
                continue
            joined = self.glue.join(vs)
            if self.remove_duplicates and self.glue:
                parts = joined.split(self.glue)
                seen, uniq = set(), []
                for p in parts:
                    if p not in seen:
                        seen.add(p)
                        uniq.append(p)
                joined = self.glue.join(uniq)
            out.append(joined)
        return out


@register_transformer
class MergeTransformer(Transformer):
    """Union of all input value lists (MergeTransformer.scala)."""

    id = "merge"

    def apply(self, values):
        return [v for vs in values for v in vs]


# ---------------------------------------------------------------------------
# conditional (transformer/conditional/)
# ---------------------------------------------------------------------------


@register_transformer
class ContainsAllOf(Transformer):
    """'true' iff input1 contains all values of input2 (ContainsAllOfTransformer.scala)."""

    id = "containsAllOf"

    def apply(self, values):
        first = set(values[0]) if values else set()
        rest = values[1] if len(values) > 1 else []
        return [str(all(v in first for v in rest)).lower()]


@register_transformer
class ContainsAnyOf(Transformer):
    id = "containsAnyOf"

    def apply(self, values):
        first = set(values[0]) if values else set()
        rest = values[1] if len(values) > 1 else []
        return [str(any(v in first for v in rest)).lower()]


@register_transformer
class IfContains(Transformer):
    """inputs: (values, search, then, else) (IfContains.scala)."""

    id = "ifContains"

    def __init__(self, search: str = ""):
        self.search = search

    def apply(self, values):
        base = values[0] if values else []
        then_v = values[1] if len(values) > 1 else []
        else_v = values[2] if len(values) > 2 else []
        return then_v if any(self.search in v for v in base) else else_v


@register_transformer
class IfExists(Transformer):
    """inputs: (test, then, else) (IfExists.scala)."""

    id = "ifExists"

    def apply(self, values):
        test = values[0] if values else []
        then_v = values[1] if len(values) > 1 else []
        else_v = values[2] if len(values) > 2 else []
        return then_v if test else else_v


@register_transformer
class IfMatchesRegex(Transformer):
    id = "ifMatchesRegex"

    def __init__(self, regex: str = "", negate: bool = False):
        self.pattern = re.compile(regex)
        self.negate = negate

    def apply(self, values):
        test = values[0] if values else []
        then_v = values[1] if len(values) > 1 else []
        else_v = values[2] if len(values) > 2 else []
        matches = any(self.pattern.search(v) for v in test)
        if self.negate:
            matches = not matches
        return then_v if matches else else_v


@register_transformer
class NegateTransformer(Transformer):
    """Binary NOT over 'true'/'false'/'1'/'0' (conditional/Negate.scala:
    case-insensitive input, canonical lowercase output, invalid values
    raise)."""

    id = "negate"
    _MAP = {"true": "false", "false": "true", "1": "0", "0": "1"}

    def apply(self, values):
        flat = [v for vs in values for v in vs]
        if not flat:
            raise ValueError("negate requires at least one input value")
        out = []
        for v in flat:
            key = v.strip().lower()
            if key not in self._MAP:
                raise ValueError(f"cannot negate {v!r}")
            out.append(self._MAP[key])
        return out


# ---------------------------------------------------------------------------
# normalize (transformer/normalize/)
# ---------------------------------------------------------------------------


@register_transformer
class LowerCaseTransformer(SimpleTransformer):
    id = "lowerCase"

    def evaluate(self, value):
        return value.lower()

    @staticmethod
    def evaluate_array(arr):
        import pyarrow.compute as pc

        return pc.utf8_lower(arr)


@register_transformer
class UpperCaseTransformer(SimpleTransformer):
    id = "upperCase"

    def evaluate(self, value):
        return value.upper()

    @staticmethod
    def evaluate_array(arr):
        import pyarrow.compute as pc

        return pc.utf8_upper(arr)


@register_transformer
class CapitalizeTransformer(SimpleTransformer):
    id = "capitalize"

    def evaluate(self, value):
        return value[:1].upper() + value[1:] if value else value


@register_transformer
class TrimTransformer(SimpleTransformer):
    id = "trim"

    def evaluate(self, value):
        return value.strip()

    @staticmethod
    def evaluate_array(arr):
        import pyarrow.compute as pc

        return pc.utf8_trim_whitespace(arr)


@register_transformer
class AlphaReduceTransformer(SimpleTransformer):
    """Strip all non-letter characters (AlphaReduceTransformer.scala)."""

    id = "alphaReduce"
    _pattern = re.compile(r"[^a-zA-Z]+")

    def evaluate(self, value):
        return self._pattern.sub("", value)


@register_transformer
class RemoveBlanksTransformer(SimpleTransformer):
    id = "removeBlanks"

    def evaluate(self, value):
        return value.replace(" ", "")

    @staticmethod
    def evaluate_array(arr):
        import pyarrow.compute as pc

        return pc.replace_substring(arr, " ", "")


@register_transformer
class RemoveSpecialCharsTransformer(SimpleTransformer):
    """Strip non-alphanumeric, non-space chars (RemoveSpecialCharsTransformer.scala)."""

    id = "removeSpecialChars"
    _pattern = re.compile(r"[^\w\s]", re.UNICODE)

    def evaluate(self, value):
        return self._pattern.sub("", value)


@register_transformer
class RemoveParenthesesTransformer(SimpleTransformer):
    """Remove any parenthesized fragments (RemoveParentheses.scala)."""

    id = "removeParentheses"
    _pattern = re.compile(r"\s*\([^)]*\)")

    def evaluate(self, value):
        return self._pattern.sub("", value).strip()


@register_transformer
class RemoveDuplicatesTransformer(Transformer):
    """Distinct values preserving first occurrence (DuplicateValuesRemover)."""

    id = "removeDuplicates"

    def apply(self, values):
        seen, out = set(), []
        for vs in values:
            for v in vs:
                if v not in seen:
                    seen.add(v)
                    out.append(v)
        return out


@register_transformer
class UrlEncodeTransformer(SimpleTransformer):
    id = "urlEncode"

    def __init__(self, encoding: str = "UTF-8"):
        self.encoding = encoding

    def evaluate(self, value):
        return urllib.parse.quote_plus(value, encoding=self.encoding)


@register_transformer
class UriFixTransformer(SimpleTransformer):
    """Make a value usable as a URI path segment (UriFixTransformer.scala)."""

    id = "uriFix"

    def __init__(self, uriPrefix: str = "urn:url-encoded-value:"):
        self.uri_prefix = uriPrefix

    def evaluate(self, value):
        parsed = urllib.parse.urlparse(value)
        if parsed.scheme and (parsed.netloc or parsed.path) and " " not in value:
            return value
        return self.uri_prefix + urllib.parse.quote_plus(value)


@register_transformer
class NormalizeCharsTransformer(SimpleTransformer):
    """Replace accented/special letters with ASCII (NormalizeChars.scala)."""

    id = "normalizeChars"

    def evaluate(self, value):
        import unicodedata

        nfkd = unicodedata.normalize("NFKD", value)
        return "".join(c for c in nfkd if not unicodedata.combining(c))


# ---------------------------------------------------------------------------
# tokenization (transformer/tokenization/)
# ---------------------------------------------------------------------------


@register_transformer
class Tokenizer(Transformer):
    """Regex split of all values (Tokenizer.scala)."""

    id = "tokenize"

    def __init__(self, regex: str = r"\s"):
        self.pattern = re.compile(regex)

    def apply(self, values):
        return [tok for vs in values for v in vs for tok in self.pattern.split(v)]


@register_transformer
class CamelCaseTokenizer(Transformer):
    """Split on camelCase boundaries (CamelCaseTokenizer.scala),
    regex variant: also opens a boundary after a digit (``a9X`` →
    ``a9``/``X``). The exact reference rule is ``camelcasetokenizer``
    below."""

    id = "camelCaseTokenizer"
    _pattern = re.compile(r"(?<=[a-z0-9])(?=[A-Z])")

    def apply(self, values):
        return [tok for vs in values for v in vs for tok in self._pattern.split(v)]


@register_transformer
class CamelCaseRefTokenizer(Transformer):
    """Exact reference split rule (CamelCaseTokenizer.scala:39-62):
    split strictly between a lowercase letter and an uppercase letter
    (unicode-aware ``isLower``/``isUpper``; digits never open a
    boundary). Reference @TransformExamples ported."""

    id = "camelcasetokenizer"

    @staticmethod
    def _split(value: str) -> list[str]:
        toks: list[str] = []
        sb: list[str] = []
        last_lower = False
        for c in value:
            if c.isupper() and last_lower:
                toks.append("".join(sb))
                sb = []
            sb.append(c)
            last_lower = c.islower()
        if sb:
            toks.append("".join(sb))
        return toks

    def apply(self, values):
        return [tok for vs in values for v in vs for tok in self._split(v)]


# ---------------------------------------------------------------------------
# filter (transformer/filter/)
# ---------------------------------------------------------------------------


@register_transformer
class FilterByLength(Transformer):
    id = "filterByLength"

    def __init__(self, min: int = 0, max: int = 2**31 - 1):
        self.min = min
        self.max = max

    def apply(self, values):
        return [v for vs in values for v in vs if self.min <= len(v) <= self.max]


@register_transformer
class FilterByRegex(Transformer):
    id = "filterByRegex"

    def __init__(self, regex: str = "", negate: bool = False):
        self.pattern = re.compile(regex)
        self.negate = negate

    def apply(self, values):
        out = []
        for vs in values:
            for v in vs:
                m = bool(self.pattern.search(v))
                if m != self.negate:
                    out.append(v)
        return out


@register_transformer
class RemoveEmptyValues(Transformer):
    id = "removeEmptyValues"

    def apply(self, values):
        return [v for vs in values for v in vs if v]


@register_transformer
class RemoveValues(Transformer):
    """Remove blacklisted values (RemoveValuesTransformer.scala)."""

    id = "removeValues"

    def __init__(self, blacklist: str = ""):
        self.blacklist = {v.strip() for v in blacklist.split(",") if v.strip()}

    def apply(self, values):
        return [v for vs in values for v in vs if v not in self.blacklist]


@register_transformer
class RemoveStopwords(Transformer):
    """Remove stopword tokens; the reference loads the list from a remote
    resource (RemoveRemoteStopwords.scala) — ours takes it as a parameter."""

    id = "removeStopwords"

    def __init__(self, stopwords: str = "the,a,an,and,or,of,to,in,is"):
        self.stopwords = {w.strip().lower() for w in stopwords.split(",") if w.strip()}

    def apply(self, values):
        return [v for vs in values for v in vs if v.lower() not in self.stopwords]


# ---------------------------------------------------------------------------
# replace / extraction / selection / substring
# ---------------------------------------------------------------------------


@register_transformer
class ReplaceTransformer(SimpleTransformer):
    id = "replace"

    def __init__(self, search: str = "", replace: str = ""):
        self.search = search
        self.replace = replace

    def evaluate(self, value):
        return value.replace(self.search, self.replace)

    def evaluate_array(self, arr):
        import pyarrow.compute as pc

        return pc.replace_substring(arr, self.search, self.replace)


@register_transformer
class RegexReplaceTransformer(SimpleTransformer):
    id = "regexReplace"

    def __init__(self, regex: str = "", replace: str = ""):
        self.pattern = re.compile(regex)
        self.replace = replace
        # The vectorized path runs on Arrow's RE2 engine, which rejects
        # Python-only syntax (lookarounds, backreferences) and can
        # diverge on some constructs. Probe RE2 with the pattern once at
        # construction; on rejection, disable the fast path so rows flow
        # through the per-row Python engine instead of failing the task.
        self._vectorizable = self._re2_accepts(regex, replace)

    @staticmethod
    def _re2_accepts(regex: str, replace: str) -> bool:
        if re.search(r"\(\?<?[=!]|\\[1-9]", regex):
            return False  # lookaround / backreference: Python-only
        try:
            import pyarrow as pa
            import pyarrow.compute as pc

            pc.replace_substring_regex(pa.array(["probe"]), pattern=regex, replacement=replace)
            return True
        except Exception:
            return False

    def evaluate(self, value):
        return self.pattern.sub(self.replace, value)

    @property
    def evaluate_array(self):
        if not self._vectorizable:
            return None

        def fn(arr):
            import pyarrow.compute as pc

            return pc.replace_substring_regex(arr, self.pattern.pattern, self.replace)

        return fn


@register_transformer
class MapTransformer(Transformer):
    """Dictionary lookup; the reference reads the map from a resource file
    (MapTransformer.scala:47) — ours takes 'key1:val1,key2:val2'."""

    id = "map"

    def __init__(self, mapping: str = "", default: str | None = None):
        self.mapping = dict(
            item.split(":", 1) for item in mapping.split(",") if ":" in item
        )
        self.default = default

    def apply(self, values):
        out = []
        for vs in values:
            for v in vs:
                if v in self.mapping:
                    out.append(self.mapping[v])
                elif self.default is not None:
                    out.append(self.default)
        return out


@register_transformer
class MapWithDefaultTransformer(MapTransformer):
    """MapTransformerWithDefault.scala — unmapped values map to default."""

    id = "mapWithDefault"

    def __init__(self, mapping: str = "", default: str = ""):
        super().__init__(mapping, default)


@register_transformer
class MapWithDefaultInputTransformer(Transformer):
    """Two-input map: values of input 1 are looked up in the map; misses
    take the positionally-matching value of input 2, whose last value is
    replicated when it is shorter (MapTransformerWithDefaultInput.scala:
    27-52, including the exactly-two-inputs and non-empty-default
    errors)."""

    id = "mapWithDefaultInput"

    def __init__(self, mapping: str = ""):
        self.mapping = dict(
            item.split(":", 1) for item in mapping.split(",") if ":" in item
        )

    def apply(self, values):
        if len(values) != 2:
            raise ValueError(
                f"mapWithDefaultInput takes exactly two inputs, found {len(values)}"
            )
        to_map, defaults = values[0], values[1]
        if not defaults:
            raise ValueError("mapWithDefaultInput default input contains no value")
        if len(defaults) < len(to_map):
            defaults = list(defaults) + [defaults[-1]] * (len(to_map) - len(defaults))
        return [self.mapping.get(v, d) for v, d in zip(to_map, defaults)]


@register_transformer
class RegexExtractionTransformer(Transformer):
    """Emit all regex matches (group 1 if present) (RegexExtractionTransformer.scala)."""

    id = "regexExtract"

    def __init__(self, regex: str = ""):
        self.pattern = re.compile(regex)

    def apply(self, values):
        out = []
        for vs in values:
            for v in vs:
                for m in self.pattern.finditer(v):
                    out.append(m.group(1) if m.groups() else m.group(0))
        return out


@register_transformer
class CoalesceTransformer(Transformer):
    """First non-empty input's values (CoalesceTransformer.scala)."""

    id = "coalesce"

    def apply(self, values):
        for vs in values:
            if vs:
                return list(vs)
        return []


@register_transformer
class RegexSelectTransformer(Transformer):
    """Keep values matching the regex (RegexSelectTransformer.scala)."""

    id = "regexSelect"

    def __init__(self, regex: str = "", fullMatch: bool = False):
        self.pattern = re.compile(regex)
        self.full_match = fullMatch

    def apply(self, values):
        out = []
        for vs in values:
            for v in vs:
                m = self.pattern.fullmatch(v) if self.full_match else self.pattern.search(v)
                if m:
                    out.append(v)
        return out


@register_transformer
class StripPrefixTransformer(SimpleTransformer):
    id = "stripPrefix"

    def __init__(self, prefix: str = ""):
        self.prefix = prefix

    def evaluate(self, value):
        return value[len(self.prefix):] if value.startswith(self.prefix) else value


@register_transformer
class StripPostfixTransformer(SimpleTransformer):
    id = "stripPostfix"

    def __init__(self, postfix: str = ""):
        self.postfix = postfix

    def evaluate(self, value):
        if self.postfix and value.endswith(self.postfix):
            return value[: -len(self.postfix)]
        return value


@register_transformer
class StripUriPrefixTransformer(SimpleTransformer):
    """Strip the URI prefix (after the last '/', '#' or ':') and decode
    the remainder ('_' → ' ', percent-decoding); non-URIs pass through
    (StripUriPrefixTransformer.scala examples)."""

    id = "stripUriPrefix"

    def evaluate(self, value):
        parsed = urllib.parse.urlparse(value)
        if not parsed.scheme:
            return value
        idx = max(value.rfind("#"), value.rfind("/"), value.rfind(":"))
        remainder = value[idx + 1 :]
        try:
            return urllib.parse.unquote(remainder.replace("_", " "))
        except Exception:
            return remainder


@register_transformer
class SubstringTransformer(SimpleTransformer):
    id = "substring"

    def __init__(self, beginIndex: int = 0, endIndex: int = 0):
        self.begin = beginIndex
        self.end = endIndex

    def evaluate(self, value):
        end = self.end if self.end != 0 else len(value)
        if end < 0:
            end = len(value) + end
        return value[self.begin : end]


@register_transformer
class UntilCharacterTransformer(SimpleTransformer):
    """Prefix up to the first occurrence of a char (UntilCharacterTransformer.scala)."""

    id = "untilCharacter"

    def __init__(self, untilCharacter: str = " "):
        self.char = untilCharacter

    def evaluate(self, value):
        idx = value.find(self.char)
        return value[:idx] if idx >= 0 else value


# ---------------------------------------------------------------------------
# numeric (transformer/numeric/)
# ---------------------------------------------------------------------------


def _fmt_double(x: float) -> str:
    """Scala Double.toString-ish: integral doubles print as 'n.0'."""
    if x == int(x) and abs(x) < 1e16:
        return f"{x:.1f}"
    return repr(x)


@register_transformer
class NumOperationTransformer(Transformer):
    """+,-,*,/ across inputs, pairwise-reduced over value lists
    (NumOperationTransformer.scala). Non-numbers drop the result."""

    id = "numOperation"

    _OPS = {
        "+": lambda a, b: a + b,
        "-": lambda a, b: a - b,
        "*": lambda a, b: a * b,
        "/": lambda a, b: a / b,
    }

    def __init__(self, operator: str = "+"):
        if operator not in self._OPS:
            raise ValueError(f"unknown operator {operator!r}")
        self.op = self._OPS[operator]

    def apply(self, values):
        if not values or any(not vs for vs in values):
            return []
        parsed = []
        for vs in values:
            nums = [parse_double(v) for v in vs]
            if any(n is None for n in nums):
                return []
            parsed.append(nums)
        result = parsed[0]
        for nums in parsed[1:]:
            result = [self.op(a, b) for a in result for b in nums]
        return [_fmt_double(r) for r in result]


@register_transformer
class AggregateNumbersTransformer(Transformer):
    """sum/min/max/average over all values (AggregateNumbersTransformer.scala)."""

    id = "aggregateNumbers"

    def __init__(self, operator: str = "sum"):
        self.operator = operator

    def apply(self, values):
        nums = [parse_double(v) for vs in values for v in vs]
        nums = [n for n in nums if n is not None]
        if not nums:
            return []
        if self.operator == "sum":
            r = sum(nums)
        elif self.operator == "min":
            r = min(nums)
        elif self.operator == "max":
            r = max(nums)
        elif self.operator in ("average", "avg"):
            r = sum(nums) / len(nums)
        else:
            raise ValueError(f"unknown operator {self.operator!r}")
        return [_fmt_double(r)]


@register_transformer
class CountTransformer(Transformer):
    """Number of values across all inputs (CountTransformer.scala)."""

    id = "count"

    def apply(self, values):
        return [str(sum(len(vs) for vs in values))]


@register_transformer
class LogTransformer(SimpleTransformer):
    id = "log"

    def __init__(self, base: float = 10.0):
        self.base = base

    def evaluate(self, value):
        d = parse_double(value)
        if d is None or d <= 0:
            return value
        return _fmt_double(math.log(d, self.base))


@register_transformer
class FormatNumberTransformer(SimpleTransformer):
    """Printf-style number formatting (FormatNumberTransformer.scala)."""

    id = "formatNumber"

    def __init__(self, format: str = "%.2f"):
        self.format = format

    def evaluate(self, value):
        d = parse_double(value)
        return value if d is None else self.format % d


@register_transformer
class CompareNumbersTransformer(Transformer):
    """'1' iff the comparator holds for ALL numbers of both sets, '0'
    otherwise; non-numbers skipped (CompareNumbersTransformer.scala)."""

    id = "compareNumbers"

    def __init__(self, comparator: str = "<"):
        self.comparator = comparator

    def apply(self, values):
        n1 = [d for d in (parse_double(v) for v in (values[0] if values else [])) if d is not None]
        n2 = [d for d in (parse_double(v) for v in (values[1] if len(values) > 1 else [])) if d is not None]
        if not n1 or not n2:
            return ["0"]
        c = self.comparator
        if c in ("<", "less"):
            result = max(n1) < min(n2)
        elif c in ("<=", "lessEqual"):
            result = max(n1) <= min(n2)
        elif c in (">", "greater"):
            result = min(n1) > max(n2)
        elif c in (">=", "greaterEqual"):
            result = min(n1) >= max(n2)
        elif c in ("=", "equal"):
            result = min(n1) == max(n1) and min(n2) == max(n2) and n1[0] == n2[0]
        else:
            raise ValueError(f"unknown comparator {c!r}")
        return ["1" if result else "0"]


@register_transformer
class NumReduceTransformer(SimpleTransformer):
    """Strip all non-digit characters (NumReduceTransformer.scala)."""

    id = "numReduce"
    _pattern = re.compile(r"[^0-9]+")

    def evaluate(self, value):
        return self._pattern.sub("", value)


# ---------------------------------------------------------------------------
# date (transformer/date/)
# ---------------------------------------------------------------------------


@register_transformer
class ParseDateTransformer(SimpleTransformer):
    """Parse a date with a given java-style pattern → xsd date
    (ParseDateTransformer.scala)."""

    id = "parseDate"

    _JAVA_TO_PY = [("yyyy", "%Y"), ("MM", "%m"), ("dd", "%d"), ("HH", "%H"), ("mm", "%M"), ("ss", "%S")]

    def __init__(self, format: str = "dd-MM-yyyy"):
        py = format
        for j, p in self._JAVA_TO_PY:
            py = py.replace(j, p)
        self.py_format = py

    def evaluate(self, value):
        import datetime as dt

        try:
            d = dt.datetime.strptime(value, self.py_format)
        except ValueError:
            return ""
        return d.strftime("%Y-%m-%d")

    def apply(self, values):
        return [r for r in (self.evaluate(v) for vs in values for v in vs) if r]


@register_transformer
class DateToTimestampTransformer(SimpleTransformer):
    """xsd date → unix seconds (DateToTimestampTransformer.scala)."""

    id = "dateToTimestamp"

    def evaluate(self, value):
        import datetime as dt

        try:
            d = dt.datetime.strptime(value[:10], "%Y-%m-%d").replace(tzinfo=dt.timezone.utc)
        except ValueError:
            return ""
        return str(int(d.timestamp()))


@register_transformer
class TimestampToDateTransformer(SimpleTransformer):
    """unix seconds → xsd date (TimestampToDateTransformer.scala)."""

    id = "timestampToDate"

    def evaluate(self, value):
        import datetime as dt

        d = parse_double(value)
        if d is None:
            return ""
        return dt.datetime.fromtimestamp(d, tz=dt.timezone.utc).strftime("%Y-%m-%d")


def _epoch_delta_int(delta, unit: str) -> int:
    """Exact-integer time since epoch in ``unit``, truncated toward zero
    (java.time ``Temporal.until`` semantics). Unit names are the
    reference's DateUnit values; month/year are rejected exactly as
    ``Instant.until(_, MONTHS/YEARS)`` throws in the reference."""
    us = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
    div = {"milliseconds": 1_000, "seconds": 1_000_000, "day": 86_400_000_000}.get(unit)
    if div is None:
        raise ValueError(
            f"unsupported DateUnit {unit!r} on an epoch timeline "
            "(reference Instant.until supports up to days)"
        )
    return us // div if us >= 0 else -((-us) // div)


@register_transformer
class XsdDateTimeToTimestampTransformer(SimpleTransformer):
    """The reference's ``datetoTimestamp``
    (date/DateToTimestampTransformer.scala:44-66): full xsd:dateTime
    WITH timezone — or, backward-compat, a bare xsd:date assumed UTC
    midnight — to integer time since the Unix epoch in ``unit``
    (default milliseconds). Reference @TransformExamples ported in
    tests/test_transformers.py; invalid values raise (the reference's
    ValidationException)."""

    id = "datetoTimestamp"

    def __init__(self, unit: str = "milliseconds"):
        if unit not in ("milliseconds", "seconds", "day"):
            raise ValueError(f"unsupported DateUnit {unit!r} for datetoTimestamp")
        self.unit = unit

    def evaluate(self, value):
        import datetime as dt

        d = None
        try:
            d = dt.datetime.fromisoformat(value)
        except ValueError:
            d = None
        if d is None or d.tzinfo is None:
            # ZonedDateTime.parse failed / zone missing: the documented
            # fallback accepts a pure date, assumed UTC
            try:
                d = dt.datetime.strptime(value, "%Y-%m-%d").replace(tzinfo=dt.timezone.utc)
            except ValueError:
                raise ValueError(
                    f"invalid date {value!r}: expects an xsd:dateTime including "
                    "a timezone (e.g. 2017-07-03T21:32:52+01:00) or an xsd:date"
                )
        epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
        return str(_epoch_delta_int(d - epoch, self.unit))


@register_transformer
class TimestampToXsdDateTransformer(SimpleTransformer):
    """The reference's ``timeToDate``
    (date/TimestampToDateTransformer.scala:31-62): integer time since
    the Unix epoch in ``unit`` (default milliseconds) to a date string —
    a java-pattern ``format`` when given, else the full ISO instant
    (UTC, ``Instant.toString`` shape: seconds precision, fractional part
    only when nonzero). Reference @TransformExamples ported."""

    id = "timeToDate"

    _MULT_US = {"milliseconds": 1_000, "seconds": 1_000_000, "day": 86_400_000_000}

    def __init__(self, format: str = "", unit: str = "milliseconds"):
        if unit not in self._MULT_US:
            raise ValueError(f"unsupported DateUnit {unit!r} for timeToDate")
        self.unit = unit
        py = format.strip()
        for j, p in ParseDateTransformer._JAVA_TO_PY:
            py = py.replace(j, p)
        self.py_format = py or None

    def evaluate(self, value):
        import datetime as dt

        n = int(value.strip())
        d = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
            microseconds=n * self._MULT_US[self.unit]
        )
        if self.py_format:
            return d.strftime(self.py_format)
        s = d.strftime("%Y-%m-%dT%H:%M:%S")
        if d.microsecond:
            frac = (
                f".{d.microsecond // 1000:03d}"
                if d.microsecond % 1000 == 0
                else f".{d.microsecond:06d}"
            )
            s += frac
        return s + "Z"


@register_transformer
class DurationInDaysTransformer(Transformer):
    """Days between two date inputs (DurationInDaysTransformer.scala)."""

    id = "durationInDays"

    def apply(self, values):
        import datetime as dt

        if len(values) < 2 or not values[0] or not values[1]:
            return []
        try:
            d1 = dt.datetime.strptime(values[0][0][:10], "%Y-%m-%d")
            d2 = dt.datetime.strptime(values[1][0][:10], "%Y-%m-%d")
        except ValueError:
            return []
        return [str(abs((d2 - d1).days))]


@register_transformer
class CompareDatesTransformer(Transformer):
    """'1' iff the comparator holds for ALL dates of both sets, '0'
    otherwise (CompareDatesTransformer.scala examples)."""

    id = "compareDates"

    def __init__(self, comparator: str = "<"):
        self.comparator = comparator

    def apply(self, values):
        import datetime as dt

        def parse_all(vs):
            out = []
            for v in vs:
                try:
                    out.append(dt.datetime.strptime(v[:10], "%Y-%m-%d"))
                except ValueError:
                    pass
            return out

        a = parse_all(values[0] if values else [])
        b = parse_all(values[1] if len(values) > 1 else [])
        if not a or not b:
            return ["0"]
        if self.comparator in ("<", "less"):
            result = max(a) < min(b)
        elif self.comparator in (">", "greater"):
            result = min(a) > max(b)
        elif self.comparator in ("=", "equal"):
            result = min(a) == max(a) and min(b) == max(b) and a[0] == b[0]
        else:
            raise ValueError(f"unknown comparator {self.comparator!r}")
        return ["1" if result else "0"]


_DURATION_RE = re.compile(
    r"^(-)?P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)D)?"
    r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$"
)


def _parse_xsd_datetime(value: str):
    """xsd:date / xsd:dateTime lexical value → datetime (UTC when naive),
    the subset of DatatypeConverter.parseDateTime the engine needs."""
    import datetime as dt

    v = value.strip()
    try:
        if len(v) == 10:
            d = dt.datetime.strptime(v, "%Y-%m-%d")
        else:
            d = dt.datetime.fromisoformat(v)
    except ValueError:
        return None
    if d.tzinfo is None:
        d = d.replace(tzinfo=dt.timezone.utc)
    return d


def _millis_to_xsd_duration(ms: float) -> str:
    """Millisecond span → xsd:duration in the day/time canonical form
    Java's DatatypeFactory.newDuration(long) produces (no year/month
    fields — months are not a fixed span)."""
    sign = "-" if ms < 0 else ""
    ms = abs(int(round(ms)))
    if ms == 0:
        return "PT0.000S"
    days, rem = divmod(ms, 86_400_000)
    h, rem = divmod(rem, 3_600_000)
    m, rem = divmod(rem, 60_000)
    sec = rem / 1000.0
    day_part = f"{days}D" if days else ""
    return f"{sign}P{day_part}T{h}H{m}M{sec:.3f}S"


def _xsd_duration_to_millis(value: str, ref=None) -> float:
    """xsd:duration → milliseconds (Duration.getTimeInMillis(new Date())):
    year/month fields are resolved by calendar addition at ``ref``
    (now, by default) — like the reference, month lengths depend on the
    anchor date."""
    m = _DURATION_RE.match(value.strip())
    if not m or (m.group(0) in ("P", "-P")):
        raise ValueError(f"invalid xsd:duration {value!r}")
    sign = -1.0 if m.group(1) else 1.0
    y, mo, d, h, mi = (int(g or 0) for g in m.groups()[1:6])
    s = float(m.group(7) or 0.0)
    ms = (((d * 24 + h) * 60 + mi) * 60 + s) * 1000.0
    months = y * 12 + mo
    if months:
        import datetime as dt

        ref = ref or dt.datetime.now(dt.timezone.utc)
        total = ref.year * 12 + (ref.month - 1) + months
        year, month = divmod(total, 12)
        try:
            shifted = ref.replace(year=year, month=month + 1)
        except ValueError:  # day clamping (e.g. Jan 31 + 1 month)
            last_day = [31, 29 if (year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)) else 28,
                        31, 30, 31, 30, 31, 31, 30, 31, 30, 31][month]
            shifted = ref.replace(year=year, month=month + 1, day=min(ref.day, last_day))
        ms += (shifted - ref).total_seconds() * 1000.0
    return sign * ms


@register_transformer
class DurationTransformer(Transformer):
    """xsd:duration between two dateTime inputs
    (date/DurationTransformer.scala:18-39); cross product of the two
    input sets, duration = date2 − date1."""

    id = "duration"

    def apply(self, values):
        if len(values) < 2:
            return list(values[0]) if values else []
        out = []
        for v1 in values[0]:
            for v2 in values[1]:
                d1 = _parse_xsd_datetime(v1)
                d2 = _parse_xsd_datetime(v2)
                if d1 is None or d2 is None:
                    continue
                out.append(_millis_to_xsd_duration((d2 - d1).total_seconds() * 1000.0))
        return out


@register_transformer
class DurationInSecondsTransformer(SimpleTransformer):
    """xsd:duration → seconds (date/DurationInSecondsTransformer.scala)."""

    id = "durationInSeconds"

    def evaluate(self, value):
        return str(_xsd_duration_to_millis(value) / 1000.0)


@register_transformer
class DurationInYearsTransformer(SimpleTransformer):
    """xsd:duration → years, 365.25-day years
    (date/DurationInYearsTransformer.scala)."""

    id = "durationInYears"

    def evaluate(self, value):
        days = _xsd_duration_to_millis(value) / 1000.0 / 60.0 / 60.0 / 24.0
        return str(days / 365.25)


@register_transformer
class NumberToDurationTransformer(SimpleTransformer):
    """number + unit → xsd:duration (date/NumberToDurationTransformer.scala;
    vectors NumberToDurationTransformerTest.scala:24-26)."""

    id = "numberToDuration"
    _UNITS = ("milliseconds", "seconds", "day", "month", "year")

    def __init__(self, unit: str = "day"):
        if unit not in self._UNITS:
            raise ValueError(f"unit must be one of {self._UNITS}")
        self.unit = unit

    def evaluate(self, value):
        number = float(value)
        if self.unit == "milliseconds":
            return _millis_to_xsd_duration(number)
        if self.unit == "seconds":
            return _millis_to_xsd_duration(number * 1000)
        if self.unit == "day":
            return _millis_to_xsd_duration(number * 86_400_000)
        if self.unit == "month":
            return f"P0Y{int(number)}M"
        return f"P{int(number)}Y0M"


@register_transformer
class CurrentDateTransformer(Transformer):
    """Current date-time in XML format (date/CurrentDateTransformer.scala)."""

    id = "currentDate"

    def apply(self, values):
        import datetime as dt

        return [dt.datetime.now().astimezone().isoformat(timespec="milliseconds")]


# ---------------------------------------------------------------------------
# linguistic (transformer/linguistic/)
# ---------------------------------------------------------------------------


@register_transformer
class SoundexTransformer(SimpleTransformer):
    """American Soundex (SoundexTransformer.scala; used as the default
    blocking function, methods/Blocking.scala:19-31)."""

    id = "soundex"

    _CODES = {
        **dict.fromkeys("bfpv", "1"),
        **dict.fromkeys("cgjkqsxz", "2"),
        **dict.fromkeys("dt", "3"),
        "l": "4",
        **dict.fromkeys("mn", "5"),
        "r": "6",
    }

    def __init__(self, refined: bool = False):
        self.refined = refined

    def evaluate(self, value):
        s = [c for c in value.lower() if c.isalpha()]
        if not s:
            return ""
        first = s[0].upper()
        codes = []
        prev = self._CODES.get(s[0], "")
        for c in s[1:]:
            code = self._CODES.get(c, "")
            if code and code != prev:
                codes.append(code)
            if c not in "hw":
                prev = code
        return (first + "".join(codes) + "000")[:4]


@register_transformer
class NysiisTransformer(SimpleTransformer):
    """NYSIIS phonetic encoding (NysiisTransformer.scala — the reference
    delegates to the StringMetric library's Nysiis/RefinedNysiis, not in
    this environment). ``refined=False`` is the canonical Taft (1970)
    algorithm (hand-traced vectors match the widely published ones:
    KNIGHT→NAGT, MITCHELL→MATCAL, MACINTOSH→MCANT). ``refined=True``
    (the reference default) applies the published Lynch–Arends
    modified-NYSIIS deltas: trailing S/Z stripped up front, initial
    MAC→MC and PF→F (other initials untouched), extra IX→IC / EX→EC /
    YE→Y endings, EV→EF in the scan. Exact edge-case behavior of the
    third-party library may differ; there are no reference vectors."""

    id = "nysiis"

    _INIT_STD = (("MAC", "MCC"), ("KN", "NN"), ("K", "C"), ("PH", "FF"), ("PF", "FF"), ("SCH", "SSS"))
    _INIT_REF = (("MAC", "MC"), ("PF", "F"))
    _END_STD = (("EE", "Y"), ("IE", "Y"), ("DT", "D"), ("RT", "D"), ("RD", "D"), ("NT", "D"), ("ND", "D"))
    _END_REF = (("IX", "IC"), ("EX", "EC"), ("YE", "Y")) + _END_STD

    def __init__(self, refined: bool = True):
        self.refined = refined

    def evaluate(self, value):
        w = "".join(c for c in value.upper() if c.isalpha())
        if self.refined:
            while len(w) > 1 and w[-1] in "SZ":
                w = w[:-1]
        if not w:
            return ""
        for old, new in (self._INIT_REF if self.refined else self._INIT_STD):
            if w.startswith(old):
                w = new + w[len(old):]
                break
        for old, new in (self._END_REF if self.refined else self._END_STD):
            if w.endswith(old):
                w = w[: -len(old)] + new
                break
        key = w[0]
        prev = w[0]
        i = 1
        while i < len(w):
            c = w[i]
            seg = c
            if w[i : i + 2] == "EV":
                seg, step = ("EF", 2) if self.refined else ("AF", 2)
            elif c in "AEIOU":
                seg, step = "A", 1
            elif c == "Q":
                seg, step = "G", 1
            elif c == "Z":
                seg, step = "S", 1
            elif c == "M":
                seg, step = "N", 1
            elif w[i : i + 2] == "KN":
                seg, step = "N", 2
            elif c == "K":
                seg, step = "C", 1
            elif w[i : i + 3] == "SCH":
                seg, step = "SSS", 3
            elif w[i : i + 2] == "PH":
                seg, step = "FF", 2
            elif c == "H" and (w[i - 1] not in "AEIOU" or (i + 1 < len(w) and w[i + 1] not in "AEIOU")):
                seg, step = w[i - 1], 1
            elif c == "W" and w[i - 1] in "AEIOU":
                seg, step = w[i - 1], 1
            else:
                step = 1
            for ch in seg:
                if ch != prev:
                    key += ch
                prev = ch
            i += step
        if key.endswith("S") and len(key) > 1:
            key = key[:-1]
        if key.endswith("AY"):
            key = key[:-2] + "Y"
        if key.endswith("A") and len(key) > 1:
            key = key[:-1]
        return key


@register_transformer
class MetaphoneTransformer(SimpleTransformer):
    """Simplified Metaphone encoding (MetaphoneTransformer.scala wraps
    commons-codec; this is a compact re-implementation of the common
    rule set, adequate for blocking keys)."""

    id = "metaphone"

    def evaluate(self, value):
        w = "".join(c for c in value.upper() if c.isalpha())
        if not w:
            return ""
        out = []
        i = 0
        n = len(w)
        vowels = "AEIOU"
        while i < n:
            c = w[i]
            if i > 0 and c == w[i - 1] and c != "C":
                i += 1
                continue
            nxt = w[i + 1] if i + 1 < n else ""
            if c in vowels:
                if i == 0:
                    out.append(c)
            elif c == "B":
                if not (i == n - 1 and i > 0 and w[i - 1] == "M"):
                    out.append("B")
            elif c == "C":
                if nxt == "H":
                    out.append("X")
                    i += 1
                elif nxt in "IEY":
                    out.append("S")
                else:
                    out.append("K")
            elif c == "D":
                if nxt == "G" and i + 2 < n and w[i + 2] in "IEY":
                    out.append("J")
                    i += 2
                else:
                    out.append("T")
            elif c == "G":
                if nxt == "H" and i + 2 < n and w[i + 2] not in vowels:
                    pass
                elif nxt in "IEY":
                    out.append("J")
                else:
                    out.append("K")
            elif c == "H":
                if i > 0 and w[i - 1] in vowels and nxt not in vowels:
                    pass
                else:
                    out.append("H")
            elif c == "K":
                if not (i > 0 and w[i - 1] == "C"):
                    out.append("K")
            elif c == "P":
                out.append("F" if nxt == "H" else "P")
                if nxt == "H":
                    i += 1
            elif c == "Q":
                out.append("K")
            elif c == "S":
                if nxt == "H":
                    out.append("X")
                    i += 1
                elif w[i : i + 3] in ("SIO", "SIA"):
                    out.append("X")
                else:
                    out.append("S")
            elif c == "T":
                if nxt == "H":
                    out.append("0")
                    i += 1
                elif w[i : i + 3] in ("TIO", "TIA"):
                    out.append("X")
                else:
                    out.append("T")
            elif c == "V":
                out.append("F")
            elif c == "W" or c == "Y":
                if nxt in vowels:
                    out.append(c)
            elif c == "X":
                out.append("KS")
            elif c == "Z":
                out.append("S")
            else:
                out.append(c)
            i += 1
        return "".join(out)


@register_transformer
class StemmerTransformer(SimpleTransformer):
    """Porter stemmer (StemmerTransformer.scala, 287 LoC Porter impl)."""

    id = "stem"

    def evaluate(self, value):
        return porter_stem(value.lower())


def porter_stem(w: str) -> str:
    """Compact Porter stemmer (Porter 1980), standard algorithm."""
    if len(w) <= 2:
        return w

    def cons(word, i):
        c = word[i]
        if c in "aeiou":
            return False
        if c == "y":
            return i == 0 or not cons(word, i - 1)
        return True

    def measure(stem):
        form = "".join("c" if cons(stem, i) else "v" for i in range(len(stem)))
        import re as _re

        return len(_re.findall("vc", form))

    def has_vowel(stem):
        return any(not cons(stem, i) for i in range(len(stem)))

    def ends_double_cons(word):
        return len(word) >= 2 and word[-1] == word[-2] and cons(word, len(word) - 1)

    def cvc(word):
        if len(word) < 3:
            return False
        return (
            cons(word, len(word) - 3)
            and not cons(word, len(word) - 2)
            and cons(word, len(word) - 1)
            and word[-1] not in "wxy"
        )

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    flag = False
    if w.endswith("eed"):
        if measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and has_vowel(w[:-2]):
        w = w[:-2]
        flag = True
    elif w.endswith("ing") and has_vowel(w[:-3]):
        w = w[:-3]
        flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif measure(w) == 1 and cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    step2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            if measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    step3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            if measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    step4 = [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]
    for suf in step4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st" and measure(w[:-3]) > 1:
            w = w[:-3]
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = measure(stem)
        if m > 1 or (m == 1 and not cvc(stem)):
            w = stem
    # step 5b
    if ends_double_cons(w) and w.endswith("l") and measure(w) > 1:
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# sequence / value generators / validation
# ---------------------------------------------------------------------------


@register_transformer
class GetValueByIndex(Transformer):
    """n-th value of the first input (GetValueByIndexTransformer.scala)."""

    id = "getValueByIndex"

    def __init__(self, index: int = 0, emptyStringToEmptyResult: bool = False):
        self.index = index
        self.empty_to_empty = emptyStringToEmptyResult

    def apply(self, values):
        flat = [v for vs in values for v in vs]
        if self.index >= len(flat):
            return []
        v = flat[self.index]
        if self.empty_to_empty and v == "":
            return []
        return [v]


@register_transformer
class ValuesToIndexes(Transformer):
    id = "valuesToIndexes"

    def apply(self, values):
        flat = [v for vs in values for v in vs]
        return [str(i) for i in range(len(flat))]


@register_transformer
class ConstantTransformer(Transformer):
    id = "constant"

    def __init__(self, value: str = ""):
        self.value = value

    def apply(self, values):
        return [self.value]


def _load_java_properties(path: str) -> dict[str, str]:
    """Minimal java.util.Properties reader (ISO-8859-1, ``#``/``!``
    comments, ``=``/``:``/whitespace separators, backslash line
    continuation, ``\\uXXXX`` and single-char escapes)."""
    props: dict[str, str] = {}
    with open(path, encoding="iso-8859-1") as f:
        logical: list[str] = []
        for raw in f:
            line = raw.rstrip("\n").rstrip("\r")
            stripped = line.lstrip()
            if not logical:
                if not stripped or stripped[0] in "#!":
                    continue
            # java.util.Properties discards leading whitespace on every
            # physical line, including continuations
            line = stripped
            # odd number of trailing backslashes → continuation
            n_bs = len(line) - len(line.rstrip("\\"))
            if n_bs % 2 == 1:
                logical.append(line[:-1])
                continue
            logical.append(line)
            full = "".join(logical)
            logical = []
            # find the first unescaped separator
            key_end, sep_end = len(full), len(full)
            i = 0
            while i < len(full):
                c = full[i]
                if c == "\\":
                    i += 2
                    continue
                if c in "=:" or c.isspace():
                    key_end = i
                    j = i
                    while j < len(full) and full[j].isspace():
                        j += 1
                    if j < len(full) and full[j] in "=:":
                        j += 1
                        while j < len(full) and full[j].isspace():
                            j += 1
                    sep_end = j
                    break
                i += 1
            key = _unescape_java(full[:key_end])
            props[key] = _unescape_java(full[sep_end:])
    return props


def _unescape_java(s: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt == "u" and i + 5 < len(s):
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            out.append({"t": "\t", "n": "\n", "r": "\r", "f": "\f"}.get(nxt, nxt))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


@register_transformer
class ReadParameterTransformer(Transformer):
    """Read a named parameter from a local Java ``.properties`` file
    (silk-workspace/.../plugins/transformer/value/ReadParameter.scala:
    ignores its inputs, emits the parameter's value; a missing
    parameter raises, mirroring the reference's ValidationException).
    The reference re-reads the resource when its modification time
    advances; batch stages construct transformers once per actor in
    ``__init__``, so a bounded run observes one consistent value —
    the same guarantee the reference gives within one execution."""

    id = "readParameter"

    def __init__(self, resource: str = "", parameter: str = ""):
        props = _load_java_properties(resource)
        if parameter not in props:
            raise ValueError(
                f"resource {resource!r} does not provide a parameter {parameter!r}"
            )
        self.value = props[parameter]

    def apply(self, values):
        return [self.value]


@register_transformer
class ConstantUriTransformer(Transformer):
    id = "constantUri"

    def __init__(self, value: str = ""):
        self.value = value

    def apply(self, values):
        return [self.value]


@register_transformer
class DefaultValueTransformer(Transformer):
    """Emit default if no input values exist (DefaultValueTransformer.scala)."""

    id = "defaultValue"

    def __init__(self, value: str = "default"):
        self.value = value

    def apply(self, values):
        flat = [v for vs in values for v in vs]
        return flat if flat else [self.value]


@register_transformer
class EmptyValueTransformer(Transformer):
    id = "emptyValue"

    def apply(self, values):
        return [""]


@register_transformer
class UuidTransformer(Transformer):
    """Deterministic UUID5 of the input values — the reference emits
    random UUIDs (UuidTransformer.scala), which would break replay
    determinism; ours hashes the inputs instead."""

    id = "uuid"

    def apply(self, values):
        flat = [v for vs in values for v in vs]
        if not flat:
            return [str(_uuid.uuid5(_uuid.NAMESPACE_URL, ""))]
        return [str(_uuid.uuid5(_uuid.NAMESPACE_URL, v)) for v in flat]


@register_transformer
class ShingleTransformer(Transformer):
    """Word k-shingles over the input token sequence (w-shingling,
    Broder 1997). Not in the reference; the standard near-dup
    representation — unigram sketches of natural text degenerate
    (globally common tokens land in every sketch), shingles don't."""

    id = "shingle"

    def __init__(self, k: int = 3):
        self.k = k

    def apply(self, values):
        toks = [v for vs in values for v in vs]
        if len(toks) < self.k:
            return [" ".join(toks)] if toks else []
        return [" ".join(toks[i : i + self.k]) for i in range(len(toks) - self.k + 1)]


@register_transformer
class KmvTokensTransformer(Transformer):
    """k-min-values token sketch: keep the k distinct values with the
    smallest stable hashes. Not in the reference — our scale addition
    (SURVEY.md §7.3): Jaccard over the KMV sketch approximates token
    Jaccard while bounding blocking-index size and shuffle payload to
    O(k) per row. The hash is md5-lower-64 (== DuckDB
    ``md5_number_lower``) so a SQL oracle can reproduce the sketch
    exactly (``list_sort`` by ``(md5_number_lower(s), s)``, take k)."""

    id = "kmvTokens"

    def __init__(self, k: int = 32):
        self.k = k

    def apply(self, values):
        from silk_ray.kernel.index import md5_lower64

        distinct = {v for vs in values for v in vs}
        return sorted(distinct, key=lambda v: (md5_lower64(v), v))[: self.k]


class ValidationError(ValueError):
    """Raised by validation transformers; caught per-row by the transform
    executor and routed to the error column (mirror of
    TransformedEntities.scala:87-128)."""


@register_transformer
class ValidateRegex(Transformer):
    id = "validateRegex"

    def __init__(self, regex: str = ""):
        self.pattern = re.compile(regex)

    def apply(self, values):
        for vs in values:
            for v in vs:
                if not self.pattern.fullmatch(v):
                    raise ValidationError(f"value {v!r} does not match {self.pattern.pattern!r}")
        return [v for vs in values for v in vs]


@register_transformer
class ValidateNumericRange(Transformer):
    id = "validateNumericRange"

    def __init__(self, min: float = -math.inf, max: float = math.inf):
        self.min = min
        self.max = max

    def apply(self, values):
        for vs in values:
            for v in vs:
                d = parse_double(v)
                if d is None or not (self.min <= d <= self.max):
                    raise ValidationError(f"value {v!r} outside [{self.min}, {self.max}]")
        return [v for vs in values for v in vs]


@register_transformer
class ValidateNumberOfValues(Transformer):
    id = "validateNumberOfValues"

    def __init__(self, min: int = 0, max: int = 2**31 - 1):
        self.min = min
        self.max = max

    def apply(self, values):
        flat = [v for vs in values for v in vs]
        if not (self.min <= len(flat) <= self.max):
            raise ValidationError(f"{len(flat)} values outside [{self.min}, {self.max}]")
        return flat


@register_transformer
class ValidateDateAfter(Transformer):
    """First input date must be after the second; outputs the first
    input on success (validation/ValidateDateAfter.scala:54-76 incl.
    its @TransformExamples)."""

    id = "validateDateAfter"

    def __init__(self, allowEqual: bool = False):
        self.allow_equal = allowEqual

    def apply(self, values):
        if len(values) != 2:
            raise ValueError("validateDateAfter accepts exactly two inputs")
        d1 = _parse_xsd_datetime(values[0][0])
        d2 = _parse_xsd_datetime(values[1][0])
        if d1 is None or d2 is None:
            raise ValidationError("unparseable date input")
        if d1 == d2:
            if self.allow_equal:
                return list(values[0])
            raise ValidationError(f"Date {values[0][0]} is not after date {values[1][0]}, but equal")
        if d1 > d2:
            return list(values[0])
        raise ValidationError(f"Date {values[0][0]} is not after date {values[1][0]}.")


@register_transformer
class ValidateDateRange(SimpleTransformer):
    """Dates must fall inside [minDate, maxDate]
    (validation/ValidateDateRange.scala:30-55)."""

    id = "validateDateRange"

    def __init__(self, minDate: str = "1900-01-01", maxDate: str = "2100-12-31"):
        self.min_date = _parse_xsd_datetime(minDate)
        self.max_date = _parse_xsd_datetime(maxDate)
        if self.min_date is None or self.max_date is None:
            raise ValueError("minDate/maxDate must be YYYY-MM-DD")

    def evaluate(self, value):
        d = _parse_xsd_datetime(value)
        if d is None:
            raise ValidationError(f"unparseable date {value!r}")
        if d < self.min_date:
            raise ValidationError(f"Date {value} is earlier than allowed minimum {self.min_date.date()}")
        if d > self.max_date:
            raise ValidationError(f"Date {value} is later than allowed maximum {self.max_date.date()}")
        return value


# ---------------------------------------------------------------------------
# conversion / value / numeric stragglers
# ---------------------------------------------------------------------------


@register_transformer
class ConvertCharsetTransformer(SimpleTransformer):
    """Reinterpret the string's bytes from sourceCharset as
    targetCharset (conversion/ConvertCharsetTransformer.scala:22-35)."""

    id = "convertCharset"

    def __init__(self, sourceCharset: str = "ISO-8859-1", targetCharset: str = "UTF-8"):
        import codecs

        for cs in (sourceCharset, targetCharset):
            try:
                codecs.lookup(cs)
            except LookupError:
                raise ValueError(f"charset {cs} is unsupported")
        self.source = sourceCharset
        self.target = targetCharset

    def evaluate(self, value):
        # java.lang.String semantics: unmappable bytes/chars become
        # replacement characters rather than raising
        return value.encode(self.source, errors="replace").decode(self.target, errors="replace")


@register_transformer
class RandomNumberTransformer(Transformer):
    """Generates a set of uniform random numbers
    (value/RandomNumberTransformer.scala:15-29). A ``seed`` parameter is
    added beyond the reference so distributed runs can be made
    deterministic per task."""

    id = "randomNumber"

    def __init__(self, min: float = 0.0, max: float = 100.0, minCount: int = 1, maxCount: int = 1, seed: int | None = None):
        import random

        self.min = min
        self.max = max
        self.min_count = minCount
        self.max_count = maxCount
        self.rng = random.Random(seed)

    def apply(self, values):
        count = self.min_count + self.rng.randrange(1 + self.max_count - self.min_count)
        return [str(self.min + (self.max - self.min) * self.rng.random()) for _ in range(count)]


@register_transformer
class PhysicalQuantityExtractor(Transformer):
    """Extract '{Number}{UnitPrefix}{Symbol}' physical quantities,
    converted to the base unit (numeric/PhysicalQuantityExtractor.scala:29-93;
    vectors PhysicalQuantityExtractorTest.scala:9-40)."""

    id = "extractPhysicalQuantity"

    _PREFIXES = {
        "p": 1e-12, "n": 1e-9, "μ": 1e-6, "U": 1e-6, "u": 1e-6,
        "m": 1e-3, "c": 1e-2, "d": 1e-1, "da": 10.0, "h": 100.0,
        "k": 1e3, "K": 1e3, "M": 1e6, "G": 1e9,
    }

    def __init__(self, symbol: str = "m", numberFormat: str = "en", filter: str = "", index: int = 0):
        self.symbol = symbol
        # decimal separator by locale: en-style dot vs continental comma
        self.comma_decimal = numberFormat.split("-")[0] not in ("en", "us")
        self.filter = re.compile(filter, re.IGNORECASE) if filter else None
        self.index = index
        prefixes = "|".join(sorted(self._PREFIXES, key=len, reverse=True))
        self.pattern = re.compile(
            rf"(-?[\d.,]+)\s*({prefixes})?{re.escape(symbol)}(?:$|[^a-zA-Zμ])"
        )

    def _parse_number(self, s: str) -> float:
        if self.comma_decimal:
            s = s.replace(".", "").replace(",", ".")
        else:
            s = s.replace(",", "")
        return float(s)

    def evaluate(self, value: str) -> str | None:
        if self.filter is not None and not self.filter.search(value):
            return None
        matches = list(self.pattern.finditer(value))
        if self.index >= len(matches):
            return None
        m = matches[self.index]
        number = self._parse_number(m.group(1))
        factor = self._PREFIXES.get(m.group(2) or "", 1.0)
        return str(number * factor)

    def apply(self, values):
        out = []
        for v in values[0] if values else []:
            r = self.evaluate(v)
            if r is not None:
                out.append(r)
        return out


# ---------------------------------------------------------------------------
# reference plugin-id aliases: specs written against the reference use
# the annotation ids verbatim, which differ in spelling from the
# camelCase ids above for a handful of plugins
# ---------------------------------------------------------------------------

for _ref_id, _cls in {
    "NYSIIS": NysiisTransformer,                # NysiisTransformer.scala
    "negateTransformer": NegateTransformer,     # conditional/Negate.scala
    "toSequenceIndex": ValuesToIndexes,         # ValuesToIndexesTransformer.scala
    # camelcasetokenizer / datetoTimestamp / timeToDate are exact
    # reference-semantics classes registered above, not aliases
}.items():
    TRANSFORMERS[_ref_id] = _cls
