"""Text analysis operators over a documents table.

All stages are vectorized ``map_batches`` bodies (pyarrow / pandas
kernels, compiled regexes held in actor state) suitable for 100 TB
streaming; none materializes the dataset.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc

_WS = re.compile(r"\s+")


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc token/char counts (whitespace tokenization).

    Fully vectorized: token count = number of ``\\S+`` runs via
    Arrow's RE2 kernel (the same regex family the DuckDB oracle's
    ``string_split_regex(trim(text), '\\s+')`` uses), no Python loop
    over docs."""
    n_tokens = pc.fill_null(pc.count_substring_regex(batch[text_col], r"\S+"), 0)
    n_chars = pc.fill_null(pc.utf8_length(batch[text_col]), 0)
    out = batch.select([c for c in batch.column_names if c != text_col])
    out = out.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
    out = out.append_column("n_chars_computed", pc.cast(n_chars, pa.int64()))
    return out


def sha256_fingerprint(batch: pa.Table, text_col: str = "text", out_col: str = "fingerprint") -> pa.Table:
    """sha256 hexdigest per document (document identity fingerprint)."""
    fps = [hashlib.sha256((x or "").encode()).hexdigest() for x in batch[text_col].to_pylist()]
    return batch.append_column(out_col, pa.array(fps, pa.string()))


class RollingFingerprint:
    """Rolling (Rabin-Karp-style) document fingerprint — windows of w
    tokens hashed with a rolling polynomial; emits the k smallest window
    hashes as the doc fingerprint (winnowing-lite)."""

    def __init__(self, w: int = 8, k: int = 4, text_col: str = "text"):
        self.w = w
        self.k = k
        self.text_col = text_col
        self.base = 1_000_003
        self.mod = (1 << 61) - 1

    def _doc(self, text: str) -> list[int]:
        import zlib

        toks = [zlib.crc32(t.encode()) for t in _WS.split(text or "") if t]
        if len(toks) < self.w:
            h = 0
            for t in toks:
                h = (h * self.base + t) % self.mod
            return [h]
        hashes = []
        h = 0
        power = pow(self.base, self.w - 1, self.mod)
        for i, t in enumerate(toks):
            h = (h * self.base + t) % self.mod
            if i >= self.w:
                h = (h - toks[i - self.w] * power * self.base) % self.mod
            if i >= self.w - 1:
                hashes.append(h)
        hashes.sort()
        return hashes[: self.k]

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [self._doc(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column("rolling_fp", pa.array(fps, pa.list_(pa.int64())))


class QualityScorer:
    """Heuristic quality signals: length, punctuation ratio, stopword
    ratio, mean word length, uppercase ratio.

    Fully vectorized (round-4: no per-char/per-word Python loops):
    every signal is an Arrow RE2 count-kernel expression. Character
    classes are therefore RE2's (ASCII ``\\w``; uppercase =
    ``\\p{Lu}``) — the same family the engine's DuckDB SQL oracles
    use, so the definitions stay SQL-expressible. The stopword count
    uses a boundary-padding trick instead of per-word membership:
    non-letter runs become DOUBLE spaces (so adjacent words both keep
    a boundary character), the text is lowercased and space-padded,
    and each stopword is counted as a plain `` word `` substring —
    exactly the whole-word semantics of splitting on ``[A-Za-z]+``
    runs. Mean word length = letters / letter-runs (a word's length
    sums to its letter count because words ARE maximal letter runs)."""

    STOPWORDS = frozenset(
        "the a an and or of to in is are was were be been has have had it its "
        "this that for on with as at by from not but".split()
    )

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self._stop_needles = [f" {w} " for w in sorted(self.STOPWORDS)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch[self.text_col]
        f64 = pa.float64()
        n_chars = pc.cast(pc.utf8_length(txt), f64)
        punct = pc.cast(pc.count_substring_regex(txt, r"[^\w\s]"), f64)
        upper = pc.cast(pc.count_substring_regex(txt, r"\p{Lu}"), f64)
        n_words = pc.cast(pc.count_substring_regex(txt, r"[A-Za-z]+"), f64)
        alpha = pc.cast(pc.count_substring_regex(txt, r"[A-Za-z]"), f64)
        padded = pc.binary_join_element_wise(
            " ",
            pc.utf8_lower(pc.replace_substring_regex(txt, "[^A-Za-z]+", "  ")),
            " ",
            "",
        )
        stops = None
        for needle in self._stop_needles:
            c = pc.count_substring(padded, needle)
            stops = c if stops is None else pc.add(stops, c)
        stops = pc.cast(stops, f64)

        def ratio(num, den):
            return pc.fill_null(
                pc.if_else(pc.greater(den, 0.0), pc.divide(num, den), pa.scalar(0.0)),
                0.0,
            )

        out = batch.select([c for c in batch.column_names if c != self.text_col])
        for name, vals in (
            ("punct_ratio", ratio(punct, n_chars)),
            ("stop_ratio", ratio(stops, n_words)),
            ("mean_word_len", ratio(alpha, n_words)),
            ("upper_ratio", ratio(upper, n_chars)),
        ):
            out = out.append_column(name, pc.cast(vals, f64))
        return out


class LangId:
    """Character-n-gram language identification heuristic.

    Profiles are small per-language trigram frequency sets built from
    seed phrases (no external models in this container); classifies by
    profile overlap. Loaded once per actor."""

    SEED = {
        "en": "the quick brown fox jumps over the lazy dog and this is a test of the english language with many common words that are used",
        "de": "der schnelle braune fuchs springt über den faulen hund und dies ist ein test der deutschen sprache mit vielen häufigen wörtern die",
        "fr": "le renard brun rapide saute par dessus le chien paresseux et ceci est un test de la langue française avec beaucoup de mots courants",
        "es": "el rápido zorro marrón salta sobre el perro perezoso y esta es una prueba del idioma español con muchas palabras comunes que se usan",
        "it": "la volpe marrone veloce salta sopra il cane pigro e questo è un test della lingua italiana con molte parole comuni che vengono usate",
    }

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.profiles = {lang: self._trigrams(seed) for lang, seed in self.SEED.items()}

    @staticmethod
    def _trigrams(text: str) -> set[str]:
        t = f"  {text.lower()}  "
        return {t[i : i + 3] for i in range(len(t) - 2)}

    def classify(self, text: str) -> str:
        grams = self._trigrams(text or "")
        if not grams:
            return "unknown"
        best, best_score = "unknown", 0.0
        for lang, prof in self.profiles.items():
            score = len(grams & prof) / len(grams)
            if score > best_score:
                best, best_score = lang, score
        return best if best_score > 0.05 else "unknown"

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column(self.out_col, pa.array(preds, pa.string()))


class BpeishTokenCounter:
    """Approximate subword token counting: whitespace pre-split + a
    BPE-ish regex (GPT-2-style pattern) counting word pieces."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.pattern = re.compile(
            r"""'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"""
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = [len(self.pattern.findall(t or "")) for t in batch[self.text_col].to_pylist()]
        return batch.append_column("n_bpe_tokens", pa.array(counts, pa.int64()))
