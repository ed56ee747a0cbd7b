from reffy_ray.state.cuckoo import CuckooFilter


def test_add_contains():
    f = CuckooFilter(capacity=1024)
    urls = [f"https://example.org/spec-{i}/" for i in range(500)]
    for u in urls:
        assert f.add_if_absent(u)
    for u in urls:
        assert f.contains(u)
        assert not f.add_if_absent(u)


def test_no_false_positives_with_exact_backup():
    # north_rule: zero false positives at test scale (SURVEY.md §2.5)
    f = CuckooFilter(capacity=4096, exact_backup=True)
    for i in range(1000):
        f.add(f"u{i}")
    for i in range(1000, 3000):
        assert not f.contains(f"u{i}")


def test_filter_only_mode_low_fp():
    f = CuckooFilter(capacity=8192, exact_backup=False)
    for i in range(2000):
        f.add(f"u{i}")
    fp = sum(f.contains(f"v{i}") for i in range(10000))
    assert fp < 50  # 16-bit fingerprints → ~0.1% expected


def test_roundtrip_serialization():
    f = CuckooFilter(capacity=512)
    for i in range(200):
        f.add(f"u{i}")
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert g.count == f.count
    for i in range(200):
        assert g.contains(f"u{i}")
    assert not g.contains("nope")


def test_roundtrip_without_exact():
    f = CuckooFilter(capacity=512, exact_backup=False)
    for i in range(100):
        f.add(f"u{i}")
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert g.exact is None
    for i in range(100):
        assert g.contains(f"u{i}")
