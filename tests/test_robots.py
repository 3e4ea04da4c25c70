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


def test_wildcard_star():
    assert not robots_allowed("/a/secret/x", [], ["/a/*/x"])
    assert robots_allowed("/a/secret/y", [], ["/a/*/x"])
    assert not robots_allowed("/anything7", [], ["/*7$"])


def test_dollar_anchor():
    assert not robots_allowed("/page/17", [], ["/*7$"])
    assert robots_allowed("/page/17/sub", [], ["/*7$"])  # not at end
    assert not robots_allowed("/x.pdf", [], ["/*.pdf$"])
    assert robots_allowed("/x.pdf/view", [], ["/*.pdf$"])


def test_wildcard_longest_pattern_wins():
    # Allow "/hotel/*7$" (len 10) beats Disallow "/*7$" (len 4)
    assert robots_allowed("/hotel/127", ["/hotel/*7$"], ["/*7$"])
    assert not robots_allowed("/review/127", ["/hotel/*7$"], ["/*7$"])


def test_star_mid_pattern_prefix_behavior():
    # pattern without $ matches like a prefix after the wildcard
    assert not robots_allowed("/a/bXc/d", [], ["/a/b*c"])
    assert robots_allowed("/a/bX/d", [], ["/a/b*c"])
