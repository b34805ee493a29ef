"""URL-seen set: bloom/cuckoo fast paths, exactness, re-crawl invalidation.

The cuckoo filter is the deletable fallback required by the design (north_star:
bloom for append-only membership, cuckoo once deletions happen — a bloom can
never unlearn an invalidated URL). Exactness always comes from the per-shard
exact set; the filters are negative-path accelerators only.
"""

import numpy as np

from upton_ray.seen import Bloom, Cuckoo, _hash2


def _h(urls):
    return _hash2(np.asarray(urls, dtype=object))


def test_bloom_no_false_negatives():
    b = Bloom(capacity=10_000)
    added = [f"http://h{i}.example/p{i}" for i in range(5_000)]
    h1, h2 = _h(added)
    b.add_and_test(h1, h2)
    assert b.test(h1, h2).all()


def test_bloom_false_positive_rate_bounded():
    b = Bloom(capacity=10_000, fp_rate=0.01)
    h1, h2 = _h([f"a{i}" for i in range(10_000)])
    b.add_and_test(h1, h2)
    g1, g2 = _h([f"b{i}" for i in range(10_000)])
    assert b.test(g1, g2).mean() < 0.05


def test_cuckoo_membership_and_delete():
    c = Cuckoo(capacity=10_000)
    ins = [f"http://host{i % 64}.test/doc/{i}" for i in range(5_000)]
    h1, h2 = _h(ins)
    c.add(h1, h2)
    assert c.contains(h1, h2).all(), "cuckoo must have no false negatives"

    # delete every third item -> those (and only those, modulo fp collisions)
    # stop matching; the rest still match exactly
    mask = np.arange(len(ins)) % 3 == 0
    deleted = c.delete(h1[mask], h2[mask])
    assert deleted.all()
    after = c.contains(h1, h2)
    assert after[~mask].all(), "deletion must not disturb other members"
    assert after[mask].mean() < 0.05, "deleted items must be forgotten"


def test_cuckoo_false_positive_rate_bounded():
    c = Cuckoo(capacity=20_000)
    h1, h2 = _h([f"x{i}" for i in range(10_000)])
    c.add(h1, h2)
    g1, g2 = _h([f"y{i}" for i in range(10_000)])
    assert c.contains(g1, g2).mean() < 0.05


def test_seen_set_invalidate_forces_refetch(ray_session):
    from upton_ray.seen import SeenSet

    s = SeenSet(num_shards=2, capacity_per_shard=10_000)
    urls = [f"http://h{i % 8}.test/a/{i}" for i in range(1_000)]
    assert s.check_and_add(urls).all()
    assert (~s.check_and_add(urls)).all()
    assert s.contains(urls).all()

    stale = urls[::5]
    assert s.invalidate(stale) == len(stale)
    cont = s.contains(urls)
    assert not cont[::5].any(), "invalidated URLs must read as unseen"
    kept = np.ones(len(urls), dtype=bool)
    kept[::5] = False
    assert cont[kept].all(), "other URLs stay seen"

    # the next crawl fetches exactly the invalidated set again
    new = s.check_and_add(urls)
    assert new[::5].all() and not new[kept].any()
    assert s.size() == len(urls)
    s.kill()


def test_seen_set_invalidate_clears_bad(ray_session):
    from upton_ray.seen import SeenSet

    s = SeenSet(num_shards=2)
    s.check_and_add(["http://a.test/1", "http://a.test/2"])
    s.record_bad(["http://a.test/2"])
    assert s.bad_mask(["http://a.test/2"]).all()
    s.invalidate(["http://a.test/2"])
    assert not s.bad_mask(["http://a.test/2"]).any()
    s.kill()


def test_approximate_mode_filters_only(ray_session):
    """Filters-only membership (the 10^10-URL memory config): dedup still
    works end-to-end with a bounded false-positive rate and no exact tier."""
    from upton_ray.seen import SeenSet

    s = SeenSet(num_shards=2, capacity_per_shard=100_000, approximate=True)
    urls = [f"http://h{i % 32}.test/doc/{i}" for i in range(20_000)]
    new1 = s.check_and_add(urls)
    assert new1.mean() > 0.99, "first pass: nearly all new (FP rate bounded)"
    new2 = s.check_and_add(urls)
    assert not new2.any(), "second pass: no false negatives, none refetch"
    assert s.contains(urls).all()
    assert s.size() == int(new1.sum())

    # deletions work from day one (cuckoo IS the store in this mode)
    victims = urls[::100]
    assert s.invalidate(victims) == len(victims)
    again = s.check_and_add(victims)
    assert again.mean() > 0.9, "invalidated URLs read as new again"
    s.kill()


def test_approximate_mode_intra_batch_duplicates(ray_session):
    from upton_ray.seen import SeenSet

    s = SeenSet(num_shards=1, capacity_per_shard=10_000, approximate=True)
    new = s.check_and_add(["http://a.test/x", "http://a.test/x",
                           "http://a.test/y"])
    assert new.tolist() == [True, False, True]
    s.kill()


def test_cuckoo_overfull_spills_never_false_negative():
    """Inserts past table capacity land in the spill set: membership stays
    complete (no permanent-refetch false negatives), saturation is visible
    via n_spilled, and spilled entries delete correctly."""
    from upton_ray.seen import Cuckoo, _hash2

    c = Cuckoo(capacity=64)   # tiny: 32 buckets hold at most 128 slots
    urls = np.array([f"http://h.test/{i}" for i in range(400)], dtype=object)
    h1, h2 = _hash2(urls)
    spilled = c.add(h1, h2)
    assert spilled > 0, "a 4x-overfull table must spill"
    assert c.n_spilled == spilled
    assert c.contains(h1, h2).all(), \
        "every added key must still test positive (spill set backs the table)"
    # deleting a spilled key forgets it
    deleted = c.delete(h1, h2)
    assert deleted.all()
    assert c.n_spilled == 0
