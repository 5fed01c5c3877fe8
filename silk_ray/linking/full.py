"""Brute-force O(n²) link generation — the `Full` execution method
(reference: silk-rules/.../rule/execution/methods/Full.scala:10-12).

Plain Python, no Ray: the independent oracle the blocked pipeline is
verified against (pairs completeness of MultiBlock vs Full must be 1.0
on test fixtures, mirroring GenerateLinksTest.scala:104-125).
"""

from __future__ import annotations

from silk_ray.kernel.rule import Entity, LinkageRule


def full_links(
    source_entities: list[tuple[str, Entity]],
    target_entities: list[tuple[str, Entity]],
    rule: LinkageRule,
    limit: float = 0.0,
    source_equals_target: bool = False,
) -> list[tuple[str, str, float]]:
    """Evaluate the rule over the full cross product.

    Pairs are kept iff confidence >= limit (Matcher.scala:273-281).
    With ``source_equals_target``, only the triangular half with
    source_uri < target_uri is compared (Matcher.scala:36,263-265).
    """
    out = []
    for s_uri, s_ent in source_entities:
        for t_uri, t_ent in target_entities:
            if source_equals_target and s_uri >= t_uri:
                continue
            score = rule.apply(s_ent, t_ent, limit)
            if score is not None and score >= limit:
                out.append((s_uri, t_uri, score))
    return out


def full_candidate_pairs(
    source_entities: list[tuple[str, Entity]],
    target_entities: list[tuple[str, Entity]],
    rule: LinkageRule,
    limit: float = 0.0,
    source_equals_target: bool = False,
) -> set[tuple[str, str]]:
    """Candidate pairs the MultiBlock index would generate: pairs whose
    flattened blocking keys intersect (Index.matches, Index.scala:38)."""
    tgt_keys = [(t_uri, rule.index_keys(t_ent, False, limit)) for t_uri, t_ent in target_entities]
    out = set()
    for s_uri, s_ent in source_entities:
        s_keys = rule.index_keys(s_ent, True, limit)
        for t_uri, t_keys in tgt_keys:
            if source_equals_target and s_uri >= t_uri:
                continue
            if s_keys & t_keys:
                out.add((s_uri, t_uri))
    return out
