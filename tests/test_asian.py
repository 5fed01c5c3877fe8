"""Asian pack vectors, ported from silk-plugins-asian test sources.

The Korean vectors are @ignore'd in the reference because its
equal-length branch stringifies a char array with Java's default
toString (KoreanPhonemeDistance.scala:74); with that fixed, the
intended values pass here.
"""

import math

from silk_ray.kernel.distances import get_distance

INF = math.inf


def test_cjk_reading_distance():
    m = get_distance("cjkReadingDistance")
    # CJKReadingDistanceTest.scala
    assert m.evaluate("贾逵", "贾逵") == 0
    assert m.evaluate("川島芳子", "川島芳子", 0.0) == 0
    assert m.evaluate("祚", "胙") == 2
    assert m.evaluate("賈逵", "贾岛") == 9
    assert m.evaluate("賈逵", "賈範", 5) == 5
    assert m.evaluate("賈似道", "賈南風", 10) == 10


def test_korean_phoneme_distance():
    m = get_distance("koreanPhonemeDistance")
    assert m.evaluate("한글", "한글") == 0
    assert m.evaluate("세종대왕", "세종대왕", 0.0) == 0
    assert m.evaluate("달", "돌") == 1
    assert m.evaluate("국수", "국시") == 1
    assert m.evaluate("도토리묵", "도토리묵무침", 5) == 5
    assert m.evaluate("송편", "절편", 3) == 3
    # limit → length-difference early exit
    assert m.evaluate("가", "가나다라마바사", 3) == INF


def test_korean_translit_distance():
    m = get_distance("koreanTranslitDistance")
    # KoreanTranslitDistanceTest.scala
    assert m.evaluate("haneul", "ganeul") == 1
    assert m.evaluate("dotorimook", "dotorimoog", 0.0) == 0
    assert m.evaluate("abc", "abcdefgh", 2) == INF


def test_cjk_dictionary_path(tmp_path):
    p = tmp_path / "unihan.tsv"
    p.write_text("U+4E00\tU+4E00\t일\tIL\tyī\tHITOTSU\tICHI\n", encoding="utf-8")
    m = get_distance("cjkReadingDistance", dictionaryPath=str(p))
    assert m.evaluate("一", "一") == 0
    # 一 vs 贾 (builtin): all five reading fields differ/absent → 5
    assert m.evaluate("一", "贾") == 5
