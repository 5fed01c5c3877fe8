"""Index semantics (reference: silk-core/.../entity/Index.scala and
silk-core/src/test/.../entity/IndexTest.scala behaviours)."""

from silk_ray.kernel.index import Index


def test_matches_shared_vector():
    a = Index.one_dim({1, 2, 3})
    b = Index.one_dim({3, 4})
    assert a.matches(b)
    assert not a.matches(Index.one_dim({5}))


def test_empty_never_matches():
    assert not Index.empty().matches(Index.default())
    assert Index.default().matches(Index.default())


def test_disjunction_preserves_matches():
    # index1 matches index3 || index2 matches index4
    # <=> (1 disj 2) matches (3 disj 4)   (Index.scala:64-78)
    i1, i2 = Index.one_dim({1}), Index.one_dim({7})
    i3, i4 = Index.one_dim({1}), Index.one_dim({9})
    assert i1.disjunction(i2).matches(i3.disjunction(i4))  # via i1~i3
    i3b = Index.one_dim({2})
    assert not i1.disjunction(i2).matches(i3b.disjunction(i4))


def test_disjunction_no_cross_side_collision():
    # left side value k must not collide with right side value k
    left_only = Index.one_dim({5}).disjunction(Index.one_dim(set()))
    right_only = Index.one_dim(set()).disjunction(Index.one_dim({5}))
    assert not left_only.matches(right_only)


def test_conjunction_requires_both():
    i1, i2 = Index.one_dim({1}), Index.one_dim({7})
    j_match = Index.one_dim({1}).conjunction(Index.one_dim({7}))
    j_half = Index.one_dim({1}).conjunction(Index.one_dim({8}))
    c = i1.conjunction(i2)
    assert c.matches(j_match)
    assert not c.matches(j_half)


def test_merge_union():
    m = Index.one_dim({1}).merge(Index.one_dim({2}))
    assert m.matches(Index.one_dim({1}))
    assert m.matches(Index.one_dim({2}))


def test_flatten_same_vector_same_key():
    a = Index.one_dim({1, 2})
    b = Index.one_dim({2, 9})
    ka, kb = a.flatten(), b.flatten()
    assert len(ka & kb) == 1  # the shared vector (2,)
    assert all(0 <= k < 2**63 for k in ka | kb)


def test_flatten_respects_disjunction_offsets():
    d1 = Index.one_dim({5}).disjunction(Index.one_dim(set()))
    d2 = Index.one_dim(set()).disjunction(Index.one_dim({5}))
    assert not (d1.flatten() & d2.flatten())


def test_continuous_blocks_overlap():
    # values within `limit` of each other share a block
    a = Index.continuous(10.0, 0.0, 100.0, limit=5.0)
    b = Index.continuous(11.0, 0.0, 100.0, limit=5.0)
    assert a.matches(b)


def test_continuous_boundaries():
    lo = Index.continuous(0.0, 0.0, 100.0, limit=5.0)
    hi = Index.continuous(100.0, 0.0, 100.0, limit=5.0)
    assert lo.indices == frozenset({(0,)})
    (hi_vec,) = hi.indices
    assert hi_vec[0] == len(range(int(100 / 5 * 0.5))) - 1


def test_crop_caps_size():
    idx = Index.one_dim(set(range(100)))
    assert idx.crop(10).size == 10
    assert idx.crop(200).size == 100
