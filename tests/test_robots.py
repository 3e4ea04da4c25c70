"""P5 robots gating: Protego-subset longest-prefix semantics (SURVEY §2.2)."""

from crawlspark.kernels.robots import robots_allowed


def test_no_rules_allows():
    assert robots_allowed("/anything", None, None)
    assert robots_allowed("/anything", [], [])


def test_disallow_prefix():
    assert not robots_allowed("/private/x", [], ["/private"])
    assert robots_allowed("/public/x", [], ["/private"])


def test_longest_match_wins():
    # Allow /private/open is longer than Disallow /private → allowed
    assert robots_allowed("/private/open/1", ["/private/open"], ["/private"])
    assert not robots_allowed("/private/closed/1", ["/private/open"], ["/private"])
    # longer Disallow beats shorter Allow
    assert not robots_allowed("/a/b/c", ["/a"], ["/a/b"])


def test_tie_goes_to_allow():
    assert robots_allowed("/dir/x", ["/dir"], ["/dir"])


def test_root_disallow_all():
    assert not robots_allowed("/x", [], ["/"])
    assert robots_allowed("/x", ["/"], ["/"])  # tie at length 1 → allow


def test_empty_prefix_ignored():
    assert robots_allowed("/x", [""], [""])
