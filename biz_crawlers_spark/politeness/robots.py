"""robots.txt parsing + cache table (north_rule P8 — no analog in the
reference, which hardcodes delays and never reads robots; SURVEY.md §2.4 P8).

Minimal, conservative parser: only `User-agent: *` sections, prefix
Disallow/Allow rules, longest-match-wins (Allow beats Disallow on ties, per
the Google REP draft). Missing robots.txt ⇒ allow all.
"""

from __future__ import annotations

from urllib.parse import urlsplit


def parse_robots(body: bytes | None) -> list[str]:
    """→ list of rules like 'D:/blocked/' or 'A:/blocked/ok' for UA *."""
    if body is None:
        return []
    rules: list[str] = []
    applies = False
    seen_any_ua = False
    for raw in body.decode("utf-8", errors="replace").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            applies = value == "*"
            seen_any_ua = True
        elif field in ("disallow", "allow") and (applies or not seen_any_ua):
            if value:
                rules.append(("D:" if field == "disallow" else "A:") + value)
    return rules


def is_allowed(url: str, rules: list[str]) -> bool:
    path = urlsplit(url).path or "/"
    best_len, best_allow = -1, True
    for r in rules:
        kind, prefix = r[0], r[2:]
        if path.startswith(prefix):
            n = len(prefix)
            if n > best_len or (n == best_len and kind == "A"):
                best_len, best_allow = n, kind == "A"
    return best_allow
