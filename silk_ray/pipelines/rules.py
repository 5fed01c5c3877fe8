"""Flagship linkage rules (FIXTURES.md F3).

The conformance rule mirrors the reference's names-corpus setup
(GenerateLinksTest.scala:38-68: single comparison, levenshtein θ=2)
widened to cover the operator classes: weighted-average aggregation
over {equality on lang, Levenshtein θ=2 on filename, Jaccard θ=0.4 on
content token sets}, link filter top-1 per source.

The bench variant replaces raw content tokens with a k-min-values
token sketch (`kmvTokens`) so the blocking index and the carried
compare payload stay O(k) per row instead of O(|content|) — the
100 TB-scale path (SURVEY.md §7.3 "keep content out of the linking
shuffle").
"""

# basename extraction: paths are not URIs (no scheme), so stripUriPrefix
# passes them through; strip the directory prefix explicitly — otherwise
# every file shares the leading-directory q-grams and the Levenshtein
# index degenerates into whole-corpus blocks
FILENAME_INPUT = {
    "transform": "regexReplace",
    "params": {"regex": "^.*/", "replace": ""},
    "inputs": [{"path": "path"}],
}

CONFORMANCE_RULE = {
    "operator": {
        "aggregator": "average",
        "operators": [
            {
                # indexing=False: a 6-value categorical would dilute the
                # disjunctive MultiBlock index (Comparison.indexing flag,
                # Aggregation.scala:59-61 skips non-indexing operators)
                "metric": "equality",
                "threshold": 0.0,
                "weight": 1,
                "indexing": False,
                "source": {"path": "lang"},
                "target": {"path": "lang"},
            },
            {
                "metric": "levenshteinDistance",
                "threshold": 2.0,
                "weight": 2,
                "source": FILENAME_INPUT,
                "target": FILENAME_INPUT,
            },
            {
                "metric": "jaccard",
                "threshold": 0.4,
                "weight": 2,
                "source": {"transform": "tokenize", "inputs": [{"path": "content"}]},
                "target": {"transform": "tokenize", "inputs": [{"path": "content"}]},
            },
        ],
    },
    "filter_limit": 1,
}

KMV_TOKENS = {
    # tokenize → 3-word shingles → 32-min-hash sketch: shingles keep the
    # Jaccard blocking selective on natural text (a unigram sketch would
    # put every doc containing a globally-low-hash common word into one
    # giant block)
    "transform": "kmvTokens",
    "params": {"k": 32},
    "inputs": [
        {
            "transform": "shingle",
            "params": {"k": 3},
            "inputs": [{"transform": "tokenize", "inputs": [{"path": "content"}]}],
        }
    ],
}

BENCH_RULE = {
    "operator": {
        "aggregator": "average",
        "operators": [
            {
                # indexing=False: a 6-value categorical would dilute the
                # disjunctive MultiBlock index (Comparison.indexing flag,
                # Aggregation.scala:59-61 skips non-indexing operators)
                "metric": "equality",
                "threshold": 0.0,
                "weight": 1,
                "indexing": False,
                "source": {"path": "lang"},
                "target": {"path": "lang"},
            },
            {
                "metric": "levenshteinDistance",
                "threshold": 2.0,
                "weight": 2,
                "source": FILENAME_INPUT,
                "target": FILENAME_INPUT,
            },
            {
                # identical jaccard scoring; banded MinHash-LSH blocking
                # (single-shingle blocks degenerate on stopword-heavy or
                # tiny-vocabulary corpora — see JaccardMinhashLSH)
                "metric": "jaccardMinhashLSH",
                "params": {"bands": 6, "rows": 6},
                "threshold": 0.4,
                "weight": 2,
                "source": KMV_TOKENS,
                "target": KMV_TOKENS,
            },
        ],
    },
    "filter_limit": 1,
}


# Rule for the maintained-clusters query (cdc_clusters): lang equality
# (non-indexing) + KMV-token Jaccard — the link_documents shape over
# lake state, so the only blocking is the LSH band join and the whole
# pipeline (LWW merge → banded linkage → connected components) has an
# exact SQL oracle. Tuned to the flagship corpus: U events EDIT content
# (Zipf-hot keys drift their planted near-dups apart), so banding is
# widened to 18×2 (same 36 md5-derived permutations) and θ=1.0 — links
# require same-lang + sketch-sim ≥ 0.25 or sketch-sim ≥ 0.5 outright,
# which yields multi-member clusters at the test tiers instead of a
# vacuous empty table (BENCH_RULE's strict θ keeps the flagship's link
# set near-empty on this corpus by design — links_recomputed is a
# delta metric there, not a clustering corpus).
CDC_CLUSTER_RULE = {
    "operator": {
        "aggregator": "average",
        "operators": [
            {
                "metric": "equality",
                "threshold": 0.0,
                "weight": 1,
                "indexing": False,
                "source": {"path": "lang"},
                "target": {"path": "lang"},
            },
            {
                "metric": "jaccardMinhashLSH",
                "params": {"bands": 18, "rows": 2},
                "threshold": 1.0,
                "weight": 2,
                "source": KMV_TOKENS,
                "target": KMV_TOKENS,
            },
        ],
    },
}
