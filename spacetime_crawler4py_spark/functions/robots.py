"""robots.txt parsing into the rules-dict shape the crawl gate consumes.

The reference crawler delegates robots handling to its course cache server
and ships no parser (SURVEY §2; the north_star adds the gate). Here:

* ``parse_robots_txt``   — one robots.txt body -> disallow path prefixes
  for a given agent, RFC 9309 group selection (most-specific matching
  user-agent group wins; ``*`` is the fallback), comment stripping, and
  the same %-unquoting normalization ``urllib.robotparser`` applies, so
  the resulting gate is differential-testable against the stdlib.
* ``build_robots_rules`` — DataFrame of fetched ``/robots.txt`` payloads
  -> ``{host: [prefix, ...]}``, the broadcast dim the engine's link gate
  probes (oracle/pycrawler.robots_allows, plans/parse_stage.py).

Scope note: the gate models Disallow prefixes only (no Allow overrides,
no wildcards) — matching ``urllib.robotparser``'s prefix semantics for
rule sets without Allow lines, which the differential test enforces.
"""

from __future__ import annotations

from urllib.parse import quote, unquote

from pyspark.sql import DataFrame

__all__ = ["parse_robots_txt", "build_robots_rules"]


def _norm_path(path: str) -> str:
    """robotparser's normalization: unquote then re-quote, preserving the
    path/query split character."""
    return quote(unquote(path))


def parse_robots_txt(content: str, agent: str = "*") -> list[str]:
    """Disallow prefixes applying to ``agent``.

    Group selection per RFC 9309: every user-agent line (product token,
    case-insensitive) opens/extends a group; the group whose agent token
    is the longest one contained in ``agent`` wins, with ``*`` as the
    fallback. Empty Disallow values (allow-all) contribute nothing."""
    agent = agent.lower()
    groups: dict[str, list[str]] = {}
    # groups where an empty Disallow appeared: robotparser turns it into an
    # allow-all rule, and rule evaluation is first-match-wins, so any later
    # Disallow in that group is unreachable
    sealed: set[str] = set()
    current_agents: list[str] = []
    last_was_agent = False
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            token = val.lower()
            if not last_was_agent:
                current_agents = []
            current_agents.append(token)
            groups.setdefault(token, [])
            last_was_agent = True
        elif key == "disallow":
            last_was_agent = False
            if not current_agents:
                continue
            if not val:
                sealed.update(current_agents)
                continue
            prefix = _norm_path(val)
            for tok in current_agents:
                if tok not in sealed:
                    groups.setdefault(tok, []).append(prefix)
        else:
            last_was_agent = False

    if not groups:
        return []
    # most specific matching token: longest token that is a substring of
    # the agent product name (robotparser's applies_to rule), else '*'
    best = None
    for tok in groups:
        if tok != "*" and tok in agent:
            if best is None or len(tok) > len(best):
                best = tok
    if best is None and "*" in groups:
        best = "*"
    return list(groups.get(best, []))


def build_robots_rules(
    robots_pages: DataFrame,
    host_col: str = "host",
    payload_col: str = "payload",
    agent: str = "*",
) -> dict[str, list[str]]:
    """Fetched ``/robots.txt`` payloads -> the gate's rules dict.

    Parsing runs as an Arrow stage on the executors; only the (host,
    prefixes) pairs — one narrow row per host, the natural broadcast dim —
    come back to build the dict the per-link gate probes."""
    import pandas as pd

    def stage(batches):
        for pdf in batches:
            hosts, prefixes = [], []
            for row in pdf.itertuples(index=False):
                payload = getattr(row, payload_col)
                if payload is None:
                    continue
                if isinstance(payload, (bytes, bytearray)):
                    text = bytes(payload).decode("utf-8", errors="replace")
                else:
                    text = str(payload)
                rules = parse_robots_txt(text, agent=agent)
                if rules:
                    hosts.append(getattr(row, host_col))
                    prefixes.append(rules)
            yield pd.DataFrame(
                {
                    # object dtype keeps empty batches Arrow-convertible to
                    # list<string> (a bare empty list infers float64)
                    "host": pd.Series(hosts, dtype=object),
                    "prefixes": pd.Series(prefixes, dtype=object),
                }
            )

    parsed = robots_pages.select(host_col, payload_col).mapInPandas(
        stage, schema="host string, prefixes array<string>"
    )
    return {r.host: list(r.prefixes) for r in parsed.collect()}
