"""robots.txt parser + HTTP robots discovery (live-fetch seam)."""

from siren_ray.stages.politeness import host_quota, is_disallowed
from siren_ray.stages.robotstxt import parse_robots_txt, robots_from_http

SAMPLE = """
# example robots file
User-agent: *
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 2

User-agent: siren-ray
Disallow: /siren-only/
Crawl-delay: 0.5

User-agent: greedybot
Disallow: /
"""


def test_specific_group_beats_wildcard():
    dis, delay = parse_robots_txt(SAMPLE, agent="siren-ray")
    assert dis == ["/siren-only/"]
    assert delay == 500


def test_wildcard_group_for_unknown_agent():
    dis, delay = parse_robots_txt(SAMPLE, agent="otherbot")
    assert dis == ["/private/", "/tmp/"]
    assert delay == 2000


def test_longest_agent_match_and_case_insensitive_fields():
    text = ("USER-AGENT: bot\nDISALLOW: /a/\n\n"
            "User-Agent: mybot\nDisallow: /b/\nCRAWL-DELAY: 3\n")
    # agent "mybot-fetcher/1.0" contains both "bot" and "mybot";
    # the longer token wins
    dis, delay = parse_robots_txt(text, agent="mybot-fetcher/1.0")
    assert dis == ["/b/"] and delay == 3000


def test_consecutive_agent_lines_share_one_group():
    text = ("User-agent: a\nUser-agent: b\nDisallow: /x/\n\n"
            "User-agent: *\nDisallow: /y/\n")
    assert parse_robots_txt(text, agent="a")[0] == ["/x/"]
    assert parse_robots_txt(text, agent="b")[0] == ["/x/"]
    assert parse_robots_txt(text, agent="zzz")[0] == ["/y/"]


def test_empty_disallow_comments_and_garbage():
    text = ("User-agent: *\nDisallow:\n# all allowed\nnonsense line\n"
            "Crawl-delay: notanumber\n")
    dis, delay = parse_robots_txt(text)
    assert dis == [] and delay == 0
    assert parse_robots_txt("") == ([], 0)
    assert parse_robots_txt(None) == ([], 0)


def test_parsed_rules_drive_politeness_model():
    robots = {"news.example.org": parse_robots_txt(SAMPLE, "siren-ray")}
    assert is_disallowed(robots, "news.example.org", "/siren-only/x")
    assert not is_disallowed(robots, "news.example.org", "/public/x")
    # 1000 ms round / 500 ms delay -> 2 fetches per round
    assert host_quota(robots, "news.example.org", 1000) == 2
    assert host_quota(robots, "unknown.example.org", 1000) > 1 << 60


def test_robots_over_http_end_to_end():
    """robots discovery through the same transport + localhost server
    the page fetchers use: present file parsed, missing file =
    unrestricted."""
    from siren_ray.sources.localhttp import CorpusHttpServer
    from siren_ray.stages.transport import HttpTransport

    pages = {
        "https://a.example.org/robots.txt": SAMPLE.encode(),
        "https://a.example.org/page": b"<html>x</html>",
    }
    with CorpusHttpServer(pages) as srv:
        tr = HttpTransport(srv.base_url)
        robots = robots_from_http(
            ["a.example.org", "b.example.org"], tr, agent="siren-ray")
    assert robots["a.example.org"] == (["/siren-only/"], 500)
    assert "b.example.org" not in robots  # 404 -> unrestricted
    assert is_disallowed(robots, "a.example.org", "/siren-only/p")


def test_robots_sitemaps_global_directives():
    from siren_ray.stages.robotstxt import robots_sitemaps

    body = """
# comment
User-agent: *
Disallow: /private
Sitemap: https://h.example.org/sitemap.xml
User-agent: otherbot
Sitemap: https://h.example.org/news-sitemap.xml  # trailing comment
Sitemap: https://h.example.org/sitemap.xml
sitemap: https://h.example.org/lower.xml
"""
    assert robots_sitemaps(body) == [
        "https://h.example.org/sitemap.xml",
        "https://h.example.org/news-sitemap.xml",
        "https://h.example.org/lower.xml",
    ]
    assert robots_sitemaps("") == []
    assert robots_sitemaps(None) == []


def test_parse_robots_rules_retains_allow_and_groups():
    from siren_ray.stages.robotstxt import parse_robots_rules

    txt = ("User-agent: megabot\nDisallow: /mega/\n\n"
           "User-agent: *\nDisallow: /private/\n"
           "Allow: /private/public/\nCrawl-delay: 1.5\n")
    rules, delay = parse_robots_rules(txt, agent="siren-ray")
    assert rules == [("/private/", False), ("/private/public/", True)]
    assert delay == 1500
    # specific group beats *
    rules, _ = parse_robots_rules(txt, agent="megabot/2.0")
    assert rules == [("/mega/", False)]
    assert parse_robots_rules("", agent="x") == ([], 0)


def test_robots_matcher_rfc9309_semantics():
    import numpy as np

    from siren_ray.stages.robotstxt import RobotsMatcher

    m = RobotsMatcher([
        ("/private/", False),
        ("/private/public/", True),   # longer Allow overrides
        ("/files/*.pdf$", False),     # wildcard + end anchor
        ("/tmp*", False),
    ])
    got = m.allowed([
        "/",                       # no rule matches -> allowed
        "/private/a",              # disallowed by prefix
        "/private/public/a",       # longer allow wins
        "/files/x.pdf",            # $-anchored wildcard hits
        "/files/x.pdf.html",       # anchor miss -> allowed
        "/files/sub/deep.pdf",     # * spans path segments
        "/tmpfoo",                 # open-ended wildcard prefix hits
    ])
    assert list(got) == [True, False, True, False, True, False, False]

    # exact length tie between Allow and Disallow: Allow wins (RFC
    # 9309 least-restrictive tiebreak)
    tie = RobotsMatcher([("/page", False), ("/page", True)])
    assert list(tie.allowed(["/page1"])) == [True]
    # regex metachars in patterns are escaped, not interpreted
    esc = RobotsMatcher([("/a.b/", False)])
    assert list(esc.allowed(["/a.b/x", "/aXb/x"])) == [False, True]
    # empty rule set: everything allowed
    assert list(RobotsMatcher([]).allowed(["/x"])) == [True]
    assert RobotsMatcher([]).allowed([]).dtype == np.bool_


def test_robots_unreachable_semantics_rfc9309(ray_session):
    """RFC 9309 §2.3.1: 404 robots -> unrestricted; 5xx robots ->
    complete disallow; a served body -> parsed rules — over live
    sockets through the real transport."""
    from siren_ray.sources.localhttp import CorpusHttpServer
    from siren_ray.stages.robotstxt import robots_from_http
    from siren_ray.stages.transport import HttpTransport

    body = b"User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"
    pages = {"https://served.org/robots.txt": body}
    errors = {"https://broken.org/robots.txt": 503}
    with CorpusHttpServer(pages, error_urls=errors) as srv:
        tr = HttpTransport(srv.base_url, timeout_s=1.0, retries=0)
        got = robots_from_http(
            ["served.org", "broken.org", "missing.org"], tr)
    # served: parsed rules
    assert got["served.org"] == (["/private/"], 2000)
    # 5xx: complete disallow
    assert got["broken.org"] == (["/"], 0)
    # 404: unrestricted (no entry)
    assert "missing.org" not in got

    # legacy lenient mode: 5xx also unrestricted
    with CorpusHttpServer(pages, error_urls=errors) as srv:
        tr = HttpTransport(srv.base_url, timeout_s=1.0, retries=0)
        lenient = robots_from_http(["broken.org"], tr,
                                   unreachable="allow")
    assert "broken.org" not in lenient


def test_robots_timeout_is_unreachable(ray_session):
    """A robots.txt that times out counts as unreachable (disallow),
    not as missing (allow)."""
    from siren_ray.sources.localhttp import CorpusHttpServer
    from siren_ray.stages.robotstxt import robots_from_http
    from siren_ray.stages.transport import HttpTransport

    url = "https://slow.org/robots.txt"
    with CorpusHttpServer({url: b"User-agent: *\n"},
                          slow_urls={url: 2.0}) as srv:
        tr = HttpTransport(srv.base_url, timeout_s=0.3, retries=0)
        got = robots_from_http(["slow.org"], tr)
    assert got["slow.org"] == (["/"], 0)
