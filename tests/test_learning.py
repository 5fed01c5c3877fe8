"""GenLink supervised learning (silk-learning core: GenLink.scala,
Reproduction.scala, MCCFitnessFunction.scala, CompatiblePathsGenerator.scala,
CleanPopulationTask.scala)."""

import random

import pytest

from silk_ray.kernel.rule import rule_from_dict
from silk_ray.learning import (
    LearningConfig,
    ReferenceEntities,
    RuleGenerator,
    evaluate_rule,
    learn,
)
from silk_ray.learning.genlink import _crossover, _structure_key


def _noisy(rng, s):
    i = rng.randrange(len(s))
    return s[:i] + s[i + 1 :]


@pytest.fixture(scope="module")
def name_ref():
    rng = random.Random(7)
    names = [
        "John Smith", "Mary Jones", "Pat Doe", "Chris Ray", "Alex Poe",
        "Sam Lee", "Jo King", "Dana West", "Kim Cole", "Lou Hart",
    ]
    pos = [
        ({"label": [n], "junk": [str(rng.random())]}, {"name": [_noisy(rng, n)], "noise": [str(rng.random())]})
        for n in names
    ]
    neg = [
        ({"label": [a], "junk": ["x"]}, {"name": [b], "noise": ["y"]})
        for a in names
        for b in names
        if a != b
    ][:40]
    return ReferenceEntities(positive=pos, negative=neg)


def test_compatible_paths_exclude_random_columns(name_ref):
    # CompatiblePathsGenerator: only path pairs whose (tokenized,
    # lowercased) values overlap on >1% of positives yield generators —
    # label<->name survives, junk/noise columns do not.
    gen = RuleGenerator(name_ref)
    path_pairs = {(sp, tp) for sp, tp, _, _ in gen.comparison_gens}
    assert ("label", "name") in path_pairs
    assert all(sp != "junk" and tp != "noise" for sp, tp in path_pairs)


def test_evaluate_rule_counts(name_ref):
    spec = {
        "operator": {
            "metric": "levenshteinDistance",
            "source": {"path": "label"},
            "target": {"path": "name"},
            "threshold": 1.5,
        }
    }
    res = evaluate_rule(spec, name_ref)
    # one deleted character => distance 1 <= threshold => every positive links
    assert res.true_positives == 10 and res.false_negatives == 0
    assert res.true_negatives + res.false_positives == 40
    assert res.f_measure > 0.85


def test_learn_simple_rule(name_ref):
    res = learn(name_ref, LearningConfig(population_size=60, max_iterations=20, seed=1))
    assert res.status in ("success", "maximum_iterations")
    assert res.evaluation.f_measure == 1.0
    # the learned rule compiles and uses the compatible pair
    rule = rule_from_dict({"operator": res.best_rule["operator"]})
    assert "label" in rule.source_paths()


def test_learn_conjunction_rule(ray_session):
    # positives match on BOTH name and city; each negative matches on
    # exactly one => a single comparison cannot separate, the learner
    # must build a boolean (min) aggregation. population >= 32 with an
    # active Ray session exercises the Ray-parallel fitness path.
    rng = random.Random(3)
    names = [f"Person {chr(65 + i)}{i}" for i in range(12)]
    cities = [f"City {chr(77 + i)}{i * 7}" for i in range(12)]
    pos = [
        ({"name": [n], "city": [c]}, {"name2": [_noisy(rng, n)], "city2": [_noisy(rng, c)]})
        for n, c in zip(names, cities)
    ]
    neg = [
        ({"name": [n], "city": [cities[i]]}, {"name2": [_noisy(rng, n)], "city2": [cities[(i + 3) % 12]]})
        for i, n in enumerate(names)
    ] + [
        ({"name": [names[i]], "city": [c]}, {"name2": [names[(i + 4) % 12]], "city2": [_noisy(rng, c)]})
        for i, c in enumerate(cities)
    ]
    ref = ReferenceEntities(positive=pos, negative=neg)
    res = learn(ref, LearningConfig(population_size=150, max_iterations=30, seed=11))
    assert res.evaluation.f_measure == 1.0
    # a single-comparison rule cannot reach f1 1.0 here
    best_op = res.best_rule["operator"]
    if "operators" in best_op:
        assert len(best_op["operators"]) >= 2


def test_iterations_improve_tiny_population():
    # a 8-rule population rarely starts perfect; reproduction must
    # raise fitness over iterations (Reproduction.scala semantics).
    rng = random.Random(5)
    names = [f"Alpha Beta {i}{chr(70 + i)}" for i in range(10)]
    pos = [({"a": [n]}, {"b": [_noisy(rng, n)]}) for n in names]
    neg = [({"a": [x]}, {"b": [y]}) for x in names for y in names if x != y][:30]
    ref = ReferenceEntities(positive=pos, negative=neg)
    cfg = LearningConfig(population_size=8, max_iterations=40, seed=4)
    res = learn(ref, cfg)
    assert res.best_fitness > 0.5
    assert res.evaluation.f_measure > 0.9


def test_crossover_produces_valid_specs(name_ref):
    gen = RuleGenerator(name_ref)
    rng = random.Random(2)
    for _ in range(200):
        a, b = gen.rule(rng), gen.rule(rng)
        child = _crossover(a, b, rng)
        rule_from_dict({"operator": child["operator"]})  # must compile
        # parents unmodified by the crossover (deep copies only)
        rule_from_dict({"operator": a["operator"]})


def test_structure_key_ignores_learned_numbers():
    base = {
        "aggregator": "average",
        "operators": [
            {"metric": "jaccard", "source": {"path": "x"}, "target": {"path": "y"},
             "threshold": 0.3, "weight": 5}
        ],
    }
    import copy

    other = copy.deepcopy(base)
    other["operators"][0]["threshold"] = 0.9
    other["operators"][0]["weight"] = 1
    assert _structure_key(base) == _structure_key(other)
    diff = copy.deepcopy(base)
    diff["operators"][0]["metric"] = "levenshteinDistance"
    assert _structure_key(base) != _structure_key(diff)


def test_seeded_rules_and_determinism(name_ref):
    seed_spec = {
        "operator": {
            "metric": "levenshteinDistance",
            "source": {"path": "label"},
            "target": {"path": "name"},
            "threshold": 1.5,
        }
    }
    cfg = LearningConfig(population_size=20, max_iterations=5, seed=9)
    r1 = learn(name_ref, cfg, seed_rules=[seed_spec])
    r2 = learn(name_ref, cfg, seed_rules=[seed_spec])
    assert r1.best_fitness == r2.best_fitness
    assert r1.best_rule == r2.best_rule
    assert r1.evaluation.f_measure == 1.0


# -- active learning (silk-learning/active/: pool generator + selectors) ----


def _active_fixture():
    rng = random.Random(2)
    names = [f"Item {chr(65 + i)} number {i * 13}" for i in range(20)]
    source = [(f"s{i}", {"label": [n], "sku": [f"sku-{i}", f"grp-{i % 5}"]}) for i, n in enumerate(names)]
    target = [
        (f"t{i}", {"name": [_noisy(rng, n)], "sku": [f"sku-{i}", f"grp-{(i + 2) % 5}"]})
        for i, n in enumerate(names)
    ]
    truth = {(f"s{i}", f"t{i}") for i in range(20)}
    return source, target, truth


def test_trimmed_values_sorted_not_set_order():
    """Pool construction iterates these values: they must come back in a
    hash-seed-independent order (a set here made the seeded active-
    learning trajectory irreproducible across interpreter processes)."""
    from silk_ray.learning.active import _trimmed_values

    vals = _trimmed_values({"p": [" b ", "a", "b", "c ", "", "  "]}, "p")
    assert vals == ["a", "b", "c"]


def test_pool_from_entities_and_selectors():
    from silk_ray.learning.active import (
        pool_from_entities,
        select_entropy,
        select_jensen_shannon,
        select_uniform,
    )

    source, target, truth = _active_fixture()
    pool = pool_from_entities(source, target, [("label", "name"), ("sku", "sku")], max_links=500, seed=0)
    assert 0 < len(pool) <= 500
    # every truth pair shares an exact sku value => all reach the pool
    in_pool = {(c.source_uri, c.target_uri) for c in pool}
    assert truth <= in_pool
    # capped pool
    small = pool_from_entities(source, target, [("sku", "sku")], max_links=10, seed=0)
    assert len(small) == 10

    # selectors return from the pool, right counts, no crash on a committee
    spec = {"operator": {"metric": "levenshteinDistance", "source": {"path": "label"},
                         "target": {"path": "name"}, "threshold": 1.5}}
    rules = [rule_from_dict(spec)]
    ref = ReferenceEntities(
        positive=[(dict(source[0][1]), dict(target[0][1]))],
        negative=[(dict(source[1][1]), dict(target[2][1]))],
    )
    assert len(select_uniform(rules, pool, ref, count=3)) == 3
    ent = select_entropy(rules, pool, ref, count=1)
    assert len(ent) == 1
    js = select_jensen_shannon(rules, pool, ref, count=3)
    assert len(js) == 3 and js[0].confidence is not None


def test_active_learning_loop_converges():
    from silk_ray.learning.active import ActiveLearner

    source, target, truth = _active_fixture()
    from silk_ray.learning.active import pool_from_entities

    pool = pool_from_entities(source, target, [("label", "name"), ("sku", "sku")], max_links=500, seed=0)
    learner = ActiveLearner(config=LearningConfig(population_size=60, max_iterations=8, seed=3))
    for _ in range(8):
        picks = learner.step(pool, count=3)
        if not picks:
            break
        for c in picks:
            learner.label(c, (c.source_uri, c.target_uri) in truth)
    assert learner.best_rule is not None
    rule = rule_from_dict({"operator": learner.best_rule["operator"]})
    tp = fp = fn = 0
    for su, se in source:
        for tu, te in target:
            conf = rule.apply(se, te, limit=0.0)
            link = conf is not None and conf >= 0
            if (su, tu) in truth:
                tp += link
                fn += not link
            else:
                fp += link
    # ~24 labels out of a 400-pair grid: near-perfect rule
    assert tp >= 18 and fp <= 2


def test_pool_from_datasets(ray_session):
    import ray.data as rd

    from silk_ray.learning.active import pool_from_datasets

    source, target, truth = _active_fixture()
    sds = rd.from_items([{"uri": u, "label": e["label"], "sku": e["sku"]} for u, e in source])
    tds = rd.from_items([{"uri": u, "name": e["name"], "sku": e["sku"]} for u, e in target])
    pool = pool_from_datasets(sds, tds, [("label", "name"), ("sku", "sku")], max_links=200, seed=0)
    assert 0 < len(pool) <= 200
    pairs = {(c.source_uri, c.target_uri) for c in pool}
    assert len(pairs & truth) >= 10
    # payload entities survive the distributed round-trip
    c = next(iter(pool))
    assert isinstance(c.source, dict) and isinstance(c.target, dict)


def test_memoized_evaluation_equals_compiled(name_ref):
    """The comparison-level score memo (_eval_op_memo) must be
    bit-identical to the direct compiled-rule path on random generated
    rules — including crossover offspring, which share subtrees and so
    exercise memo hits."""
    from silk_ray.learning.genlink import _eval_op_memo

    gen = RuleGenerator(name_ref)
    rng = random.Random(99)
    specs = [gen.rule(rng) for _ in range(20)]
    specs += [_crossover(rng.choice(specs), rng.choice(specs), rng) for _ in range(20)]
    fprint = name_ref.fingerprint
    pairs = [("p", i, s, t) for i, (s, t) in enumerate(name_ref.positive)]
    pairs += [("n", i, s, t) for i, (s, t) in enumerate(name_ref.negative)]
    for spec in specs:
        rule = rule_from_dict({"operator": spec["operator"]})
        for kind, i, s, t in pairs:
            direct = rule.apply(s, t, limit=0.0)
            memo = _eval_op_memo(spec["operator"], s, t, (fprint, kind, i))
            assert memo == direct, (spec, kind, i, memo, direct)


def test_fixed_seed_end_to_end_fingerprint():
    """Pinned GA fingerprint (VERDICT r3 #8): learn_linkage_rule is the
    one driver query without a SQL oracle, so a silent behavior change
    in the genetic algorithm would only trip invariant tests. This pins
    the EXACT learned rule (sha256 of its sorted-JSON spec), fitness
    and iteration count for a fixed seed on a run that exercises 25
    real evolution iterations — verified identical under varied
    PYTHONHASHSEED. If you INTENTIONALLY change GA semantics
    (operators, fitness, reproduction schedule), re-pin these values
    and say so in the commit message; any other failure here is a
    silent-behavior-change bug."""
    import hashlib
    import json

    rng = random.Random(3)
    names = [f"Person {chr(65 + i)}{i}" for i in range(12)]
    cities = [f"City {chr(77 + i)}{i * 7}" for i in range(12)]
    pos = [
        ({"name": [n], "city": [c]}, {"name2": [_noisy(rng, n)], "city2": [_noisy(rng, c)]})
        for n, c in zip(names, cities)
    ]
    neg = [
        ({"name": [n], "city": [cities[i]]}, {"name2": [_noisy(rng, n)], "city2": [cities[(i + 3) % 12]]})
        for i, n in enumerate(names)
    ] + [
        ({"name": [names[i]], "city": [c]}, {"name2": [names[(i + 4) % 12]], "city2": [_noisy(rng, c)]})
        for i, c in enumerate(cities)
    ]
    ref = ReferenceEntities(positive=pos, negative=neg)
    res = learn(ref, LearningConfig(population_size=24, max_iterations=25, seed=7))
    fp = hashlib.sha256(json.dumps(res.best_rule, sort_keys=True).encode()).hexdigest()
    assert fp == "c44926874d983284314a91459650c969381dfddddfb85805188368cbc1077445"
    assert res.iterations == 25
    assert round(res.best_fitness, 9) == 0.495
    assert round(res.evaluation.f_measure, 9) == 0.666666667
    assert res.status == "maximum_iterations"
