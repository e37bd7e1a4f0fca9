"""robots.txt (RFC 9309) — pure-stdlib parser + longest-match evaluator.

The crawl stack's politeness gate: the WARC source reads crawl
segments, `linkgraph.frontier_schedule` rates fetches per host, and
this module decides WHETHER a path may be fetched at all.  The parser
handles the RFC 9309 grammar the way production crawlers do: groups of
consecutive ``User-agent`` lines followed by ``Allow``/``Disallow``
rules, ``#`` comments, case-insensitive directives, ``*`` wildcards
and ``$`` end anchors in path patterns, longest-match precedence with
allow winning ties, unmatched paths allowed.

Group selection: the most specific matching user-agent wins (longest
agent token that is a case-insensitive substring of the crawler's
product token), with ``*`` as the fallback; all groups at the winning
specificity merge, per the RFC's merge rule for repeated groups.
"""

from __future__ import annotations

import re


def parse_robots(text: str) -> list[tuple[list[str], list[tuple[bool, str]]]]:
    """robots.txt body → list of groups ``([agents], [(allow, pattern)])``.

    Rules that precede any ``User-agent`` line are ignored (RFC 9309
    §2.2.1); an empty pattern means "no rule" and is dropped."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    in_agents = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agents and agents:
                groups.append((agents, rules))
                agents, rules = [], []
            agents.append(val.lower())
            in_agents = True
        elif key in ("allow", "disallow"):
            in_agents = False
            if agents and val:
                rules.append((key == "allow", val))
        else:
            in_agents = False          # sitemap / crawl-delay / unknown
    if agents:
        groups.append((agents, rules))
    return groups


def rules_for_agent(groups, agent: str) -> list[tuple[bool, str]]:
    """Select the most specific matching group(s) for ``agent`` and
    merge their rules; ``*`` is the specificity-0 fallback."""
    agent = agent.lower()
    best = -1
    for agents, _rules in groups:
        for a in agents:
            if a == "*":
                best = max(best, 0)
            elif a in agent:
                best = max(best, len(a))
    if best < 0:
        return []
    out: list[tuple[bool, str]] = []
    for agents, rules in groups:
        spec = max((0 if a == "*" else len(a)
                    for a in agents if a == "*" or a in agent),
                   default=-1)
        if spec == best:
            out.extend(rules)
    return out


def pattern_to_regex(pattern: str) -> str:
    """RFC 9309 path pattern → anchored regex, portable between Java
    (`rlike`) and RE2 (DuckDB `regexp_matches`): ``*`` → ``.*``,
    trailing ``$`` → end anchor, everything else escaped."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in body)
    return "^" + rx + ("$" if anchored else "")


def evaluate(rules: list[tuple[bool, str]], path: str) -> tuple[bool, str | None]:
    """Longest-match verdict for ``path``: ``(allowed, matched_pattern)``.
    Ties break toward allow; no matching rule → allowed (RFC 9309
    §2.2.2).  The single-process mirror of the Spark evaluation join."""
    best: tuple[int, int, str] | None = None     # (spec, allow, pattern)
    for allow, pattern in rules:
        if re.search(pattern_to_regex(pattern), path):
            key = (len(pattern), int(allow), pattern)
            if best is None or key > best:
                best = key
    if best is None:
        return True, None
    return bool(best[1]), best[2]
