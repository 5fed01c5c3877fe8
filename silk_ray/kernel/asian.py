"""Asian language distance pack — CJK readings, Korean phonemes and
transliteration.

Mirrors ``silk-plugins/silk-plugins-asian/.../distance/asian/``
(AsianPlugins.scala:7-12): three metrics over CJK / Hangul strings.

- ``cjkReadingDistance`` compares characters via their Unihan reading
  properties (hangul, korean, mandarin, japaneseKun, japaneseOn);
  the reference ships the full Unicode Unihan-derived table as a
  resource (unihanProperties.tsv, ~27k rows). This module embeds only
  a small excerpt of that PUBLIC Unicode Unihan data (the characters
  exercised by the reference's test vectors) and accepts a
  ``dictionaryPath`` parameter pointing at a full TSV of the same
  shape (codepoint, codepoint, hangul, korean, mandarin, japaneseKun,
  japaneseOn) for real corpora.
- ``koreanPhonemeDistance`` decomposes Hangul syllables into jamo
  (choseong/joongseong/jongseong via Unicode arithmetic,
  KoreanPhonemeDistance.scala:181-214) and aligns the shorter string
  against the longer via blank-insertion enumeration. Deviation: the
  reference's equal-length branch stringifies a char array with Java's
  default ``toString`` (KoreanPhonemeDistance.scala:74), which is why
  its own tests are @ignore'd; we join the characters properly, which
  makes the intended vectors (달/돌 → 1, 국수/국시 → 1) pass.
- ``koreanTranslitDistance`` = Levenshtein over a romanization-folding
  soundex (g→k, d→t, b→p, l→r; KoreanTranslitDistance.scala:108-122).
"""

from __future__ import annotations

from itertools import combinations
from math import inf

from silk_ray.kernel.distances import SimpleDistanceMeasure, levenshtein, register_distance

# Excerpt of the Unicode Unihan database (public data; same row shape
# as the reference's unihanProperties.tsv): codepoint → (hangul,
# korean, mandarin, japaneseKun, japaneseOn), "null" = absent.
_UNIHAN_BUILTIN = {
    "U+8D3E": ("null", "null", "jiǎ", "null", "null"),          # 贾
    "U+9035": ("규", "KYU", "kuí", "OUJI", "KI"),               # 逵
    "U+5DDD": ("천", "CHEN", "chuān", "KAWA", "SEN"),           # 川
    "U+5CF6": ("도", "TO", "dǎo", "SHIMA", "TOU"),              # 島
    "U+82B3": ("방", "PANG", "fāng", "KANBASHII KAORI", "HOU"),  # 芳
    "U+5B50": ("자", "CA", "zi", "KO MI OTOKO", "SHI SU"),      # 子
    "U+795A": ("조", "CO", "zuò", "SAIWAI", "SO"),              # 祚
    "U+80D9": ("조", "CO", "zuò", "HIMOROGI", "SO SAKU"),       # 胙
    "U+8CC8": ("가 고", "KA KO", "jiǎ", "AKINAU AKINAI URU", "KO"),  # 賈
    "U+5C9B": ("null", "null", "dǎo", "null", "null"),          # 岛
    "U+7BC4": ("범", "PEM", "fàn", "NORI", "HAN"),              # 範
    "U+4F3C": ("사", "SA", "shì", "NIRU", "JI"),                # 似
    "U+9053": ("도", "TO", "dào", "MICHI IU MICHIBIKU", "DOU TOU"),  # 道
    "U+5357": ("남", "NAM", "nán", "MINAMI", "NAN DAN"),        # 南
    "U+98A8": ("풍", "PHWUNG", "fēng", "KAZE", "FUU FU"),       # 風
}


def _codepoint_key(ch: str) -> str:
    return f"U+{ord(ch):X}"


@register_distance
class CJKReadingDistance(SimpleDistanceMeasure):
    """Per-character Unihan reading mismatch count, aligned from the
    string ends (CJKReadingDistance.scala:30-180: reversed comparison,
    +1 per differing/absent reading field for dictionary characters)."""

    id = "cjkReadingDistance"

    def __init__(self, minChar: str = "0", maxChar: str = "z", dictionaryPath: str | None = None):
        self.dict = dict(_UNIHAN_BUILTIN)
        if dictionaryPath:
            with open(dictionaryPath, encoding="utf-8") as f:
                for line in f:
                    parts = line.rstrip("\n").split("\t")
                    if len(parts) >= 7:
                        self.dict[parts[0]] = tuple(parts[2:7])

    def evaluate(self, v1, v2, limit=inf):
        lo, sh = (v1, v2) if len(v1) > len(v2) else (v2, v1)
        left = [_codepoint_key(c) for c in reversed(lo.replace(" ", ""))]
        right = [_codepoint_key(c) for c in reversed(sh.replace(" ", ""))]
        if left == right:
            return 0.0
        distance = 0
        for i, lk in enumerate(left):
            lrow = self.dict.get(lk)
            if lrow is None:
                continue
            if i >= len(right):
                distance += 5
                continue
            rrow = self.dict.get(right[i])
            if rrow is None:
                continue
            if lk == right[i]:
                continue
            for field in range(5):
                lval = lrow[field]
                if lval != "null" and rrow[field] == lval:
                    continue
                distance += 1
        return float(distance)


_CHOSEONG = "ㄱㄲㄴㄷㄸㄹㅁㅂㅃㅅㅆㅇㅈㅉㅊㅋㅌㅍㅎ"
_JOONGSEONG = "ㅏㅐㅑㅒㅓㅔㅕㅖㅗㅘㅙㅚㅛㅜㅝㅞㅟㅠㅡㅢㅣ"
_JONGSEONG = " ㄱㄲㄳㄴㄵㄶㄷㄹㄺㄻㄼㄽㄾㄿㅀㅁㅂㅄㅅㅆㅇㅈㅊㅋㅌㅍㅎ"


def korean_phonemes(s: str) -> str:
    """Hangul syllables → jamo sequence (Unicode arithmetic,
    KoreanPhonemeDistance.scala:181-214); other characters pass through."""
    out = []
    for ch in s:
        code = ord(ch)
        if 0xAC00 <= code <= 0xD7A3:
            uni = code - 0xAC00
            jong = uni % 28
            jung = ((uni - jong) // 28) % 21
            cho = (uni - jong) // 28 // 21
            out.append(_CHOSEONG[cho] + _JOONGSEONG[jung] + _JONGSEONG[jong])
        else:
            out.append(ch)
    return "".join(out).replace(" ", "")


@register_distance
class KoreanPhonemeDistance(SimpleDistanceMeasure):
    """Jamo-level alignment distance (KoreanPhonemeDistance.scala:28-178):
    the shorter string is padded with blanks in every possible position
    combination; per aligned character pair the jamo Levenshtein is
    computed; score = (non-zero-positions − 1)·3 + min non-zero pair
    distance, minimized over paddings."""

    id = "koreanPhonemeDistance"

    def __init__(self, minChar: str = "0", maxChar: str = "z"):
        pass

    def evaluate(self, v1, v2, limit=inf):
        qu = int(limit / 3) if limit != inf else None
        if qu is not None:
            th = qu if limit % 3 == 0 else qu + 1
            if abs(len(v1) - len(v2)) > th:
                return inf
        src = v1.replace(" ", "")
        tgt = v2.replace(" ", "")
        lo, sh = (src, tgt) if len(src) > len(tgt) else (tgt, src)
        level = len(lo) - len(sh)
        if level == 0:
            rows = [sh]
        else:
            rows = []
            for blanks in combinations(range(1, len(lo) + 1), level):
                chars = []
                j = 0
                for i in range(1, len(lo) + 1):
                    if i in blanks:
                        chars.append("\x00")
                    else:
                        chars.append(sh[j])
                        j += 1
                rows.append("".join(chars))
        best = inf
        for row in rows:
            zcnt = 0
            min_pd = inf
            for lo_ch, row_ch in zip(lo, row):
                d = levenshtein(korean_phonemes(lo_ch), korean_phonemes(row_ch))
                if d == 0:
                    zcnt += 1
                elif d < min_pd:
                    min_pd = d
            sd = len(lo) - zcnt
            kpd = 0.0 if sd == 0 else (sd - 1) * 3 + (min_pd if min_pd != inf else 0)
            if kpd < best:
                best = kpd
        return float(best)


@register_distance
class KoreanTranslitDistance(SimpleDistanceMeasure):
    """Levenshtein over romanization-folded strings
    (KoreanTranslitDistance.scala:28-122: g→k, d→t, b→p, l→r)."""

    id = "koreanTranslitDistance"

    _FOLD = str.maketrans({"g": "k", "d": "t", "b": "p", "l": "r"})

    def __init__(self, minChar: str = "0", maxChar: str = "z"):
        pass

    def evaluate(self, v1, v2, limit=inf):
        if abs(len(v1) - len(v2)) > limit:
            return inf
        a = v1.lower().translate(self._FOLD).replace(" ", "")
        b = v2.lower().translate(self._FOLD).replace(" ", "")
        return float(levenshtein(a, b))
