"""robots.txt parsing for the live-fetch seam.

The engine's politeness spec (stages/politeness.py) consumes
``{host: (disallow_prefixes, crawl_delay_ms)}``; in corpus mode that
dict comes pre-built from robots.parquet. This module is the
live-deployment path: fetch ``https://host/robots.txt`` through the
same :class:`..transport.HttpTransport` the page fetchers use, and
parse the REAL file format into the engine's model.

Parser semantics (the public Robots Exclusion Protocol subset that maps
onto the engine's prefix-disallow model):

- lines are ``field: value``; ``#`` starts a comment; fields are
  case-insensitive, values are not (paths are case-sensitive).
- consecutive ``User-agent`` lines open ONE group; a group's rules are
  the ``Disallow``/``Crawl-delay`` lines until the next user-agent run.
- the applicable group is the one whose agent token is the LONGEST
  substring-match for our agent name; ``*`` matches anything with
  length 0 (specific groups always beat it).
- empty ``Disallow:`` means "allow all" (contributes no prefix).
- ``Crawl-delay`` is seconds (int or float) -> milliseconds.
- ``Allow`` lines are recorded but NOT applied: the engine's politeness
  model is prefix-disallow only, so we stay CONSERVATIVE (a path both
  allowed and disallowed stays disallowed). Documented limitation.
"""

from __future__ import annotations


def parse_robots_txt(text: str, agent: str = "siren-ray"
                     ) -> tuple[list[str], int]:
    """robots.txt body -> (disallow_prefixes, crawl_delay_ms) for
    ``agent``. Unknown fields are ignored; a missing/empty file means
    no restrictions (``([], 0)``)."""
    agent_l = agent.lower()
    groups: list[tuple[list[str], list[str], float | None]] = []
    cur_agents: list[str] = []
    cur_dis: list[str] = []
    cur_delay: float | None = None
    in_agent_run = False

    def _close():
        nonlocal cur_agents, cur_dis, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_dis, cur_delay))
        cur_agents, cur_dis, cur_delay = [], [], None

    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                _close()
                in_agent_run = True
            cur_agents.append(value.lower())
            continue
        in_agent_run = False
        if field == "disallow":
            if value:
                cur_dis.append(value)
        elif field == "crawl-delay":
            try:
                cur_delay = float(value)
            except ValueError:
                pass
        # "allow" and anything else: ignored (see module docstring)
    _close()

    best_len = -1
    best: tuple[list[str], float | None] | None = None
    for agents, dis, delay in groups:
        for a in agents:
            if a == "*":
                match_len = 0
            elif a and a in agent_l:
                match_len = len(a)
            else:
                continue
            if match_len > best_len:
                best_len = match_len
                best = (dis, delay)
    if best is None:
        return [], 0
    dis, delay = best
    return list(dis), int(round((delay or 0.0) * 1000))


def render_robots_txt(disallow_prefixes, crawl_delay_ms: int = 0,
                      *, agent: str = "*") -> str:
    """Politeness-model entry -> a robots.txt body that
    :func:`parse_robots_txt` round-trips exactly (used by the local
    test server and corpus tooling; render∘parse == identity on the
    engine's (prefixes, delay_ms) model). An empty prefix list renders
    the conventional bare ``Disallow:`` (allow all)."""
    lines = [f"User-agent: {agent}"]
    prefixes = list(disallow_prefixes or [])
    for p in prefixes:
        lines.append(f"Disallow: {p}")
    if not prefixes:
        lines.append("Disallow:")
    if crawl_delay_ms:
        lines.append(f"Crawl-delay: {crawl_delay_ms / 1000:g}")
    return "\n".join(lines) + "\n"


def robots_from_http(hosts, transport, *, scheme: str = "https",
                     agent: str = "siren-ray",
                     unreachable: str = "disallow"
                     ) -> dict[str, tuple[list[str], int]]:
    """Fetch + parse robots.txt for each host through the fetch
    transport (batched, error-swallowing). Status handling follows
    RFC 9309 §2.3.1:

    - 2xx body -> parsed rules.
    - "Unavailable" (4xx incl. 404) -> NO entry = unrestricted.
    - "Unreachable" (5xx, timeout, connection failure) -> complete
      disallow (``(["/"], 0)``) per §2.3.1.4 — a host whose policy
      cannot be read MUST NOT be crawled. Pass ``unreachable="allow"``
      for the legacy lenient behavior.

    Returns the politeness dict consumed by ``load_robots`` users."""
    hosts = list(hosts)
    urls = [f"{scheme}://{h}/robots.txt" for h in hosts]
    bodies, errs = transport.fetch_many(urls)
    out: dict[str, tuple[list[str], int]] = {}
    for h, body, err in zip(hosts, bodies, errs):
        if body is None:
            if (unreachable == "disallow" and err is not None
                    and not err.startswith("http_4")):
                # 5xx / timeout / conn error: policy unreadable
                out[h] = (["/"], 0)
            continue
        try:
            text = body.decode("utf-8", errors="replace")
        except Exception:
            continue
        out[h] = parse_robots_txt(text, agent=agent)
    return out


def robots_sitemaps(text: str) -> list[str]:
    """Extract ``Sitemap:`` directive URLs from a robots.txt body — the
    standard discovery hook for the sitemap source
    (``sources/sitemap.py``). Per the REP, Sitemap lines are GLOBAL
    (not scoped to a user-agent group), so this scan is independent of
    the group selection in :func:`parse_robots_txt`. The single
    ``partition(":")`` split keeps the ``https://`` colon intact;
    duplicates are removed first-wins, order preserved."""
    out: list[str] = []
    seen: set[str] = set()
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap":
            v = value.strip()
            if v and v not in seen:
                seen.add(v)
                out.append(v)
    return out


# --- RFC 9309 longest-match rule matcher ------------------------------------

def parse_robots_rules(text: str, agent: str = "siren-ray"
                       ) -> tuple[list[tuple[str, bool]], int]:
    """robots.txt body -> (rules, crawl_delay_ms) for ``agent``, where
    rules are ``(path_pattern, is_allow)`` pairs from the applicable
    group (same longest-substring group selection as
    :func:`parse_robots_txt`). Patterns keep their raw ``*``/``$``
    syntax; feed them to :class:`RobotsMatcher`. Unlike the
    prefix-only engine model, Allow lines are RETAINED — this is the
    full Robots Exclusion Protocol (RFC 9309 §2.2.2)."""
    agent_l = agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]],
                       float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    cur_delay: float | None = None
    in_agent_run = False

    def _close():
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                _close()
                in_agent_run = True
            cur_agents.append(value.lower())
            continue
        in_agent_run = False
        if field == "disallow":
            if value:
                cur_rules.append((value, False))
        elif field == "allow":
            if value:
                cur_rules.append((value, True))
        elif field == "crawl-delay":
            try:
                cur_delay = float(value)
            except ValueError:
                pass
    _close()

    best_len = -1
    best: tuple[list[tuple[str, bool]], float | None] | None = None
    for agents, rules, delay in groups:
        for a in agents:
            if a == "*":
                match_len = 0
            elif a and a in agent_l:
                match_len = len(a)
            else:
                continue
            if match_len > best_len:
                best_len = match_len
                best = (rules, delay)
    if best is None:
        return [], 0
    rules, delay = best
    return list(rules), int(round((delay or 0.0) * 1000))


class RobotsMatcher:
    """RFC 9309 §2.2.2 path matcher for one host's applicable group.

    Decision per path: among the rules whose pattern matches, the one
    with the LONGEST pattern (octet length) wins; on an exact length
    tie between an Allow and a Disallow, Allow wins (the RFC's
    least-restrictive tiebreak). No matching rule => allowed.

    Pattern syntax: anchored at path start; ``*`` matches any char run;
    a trailing ``$`` anchors the end. Compiled ONCE to RE2-safe regexes
    (re.escape + the two metachar substitutions) — matching a batch of
    paths is one vectorized ``pyarrow.compute.match_substring_regex``
    pass per rule, O(rules) passes total, no per-path Python."""

    def __init__(self, rules: list[tuple[str, bool]]):
        import re as _re

        self._allow: list[bool] = []
        self._len: list[int] = []
        self._regex: list[str] = []
        for pattern, is_allow in rules:
            anchored_end = pattern.endswith("$")
            body = pattern[:-1] if anchored_end else pattern
            rx = ".*".join(_re.escape(part) for part in body.split("*"))
            rx = "^" + rx + ("$" if anchored_end else "")
            self._regex.append(rx)
            self._allow.append(bool(is_allow))
            self._len.append(len(pattern.encode("utf-8")))

    def allowed(self, paths) -> "np.ndarray":
        """Vectorized decision for a path batch -> bool ndarray."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = paths if isinstance(paths, (pa.Array, pa.ChunkedArray)) \
            else pa.array(list(paths), pa.string())
        n = len(arr)
        best_len = np.full(n, -1, dtype=np.int64)
        best_allow = np.ones(n, dtype=bool)
        for rx, is_allow, plen in zip(self._regex, self._allow, self._len):
            hit = pc.match_substring_regex(arr, rx)
            hit = pc.fill_null(hit, False).to_numpy(zero_copy_only=False)
            # longest pattern wins; equal length: allow beats disallow
            better = hit & ((plen > best_len)
                            | ((plen == best_len) & is_allow))
            best_len[better] = plen
            best_allow[better] = is_allow
        return np.where(best_len >= 0, best_allow, True)
