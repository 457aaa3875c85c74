"""robots.txt parser — plain Python, used to build the pre-parsed
``robots`` dimension table (FIXTURES.md §3) from raw robots bodies.

Reference semantics (heritrix3/modules/.../net/Robotstxt.java:71-210):
- comments (# …) and blank lines skipped; leading whitespace tolerated;
  html markup stripped (``<[^>]+>``); trailing inline comments stripped;
- consecutive User-agent lines share one directive group; a directive
  ends the grouping;
- agent names lowercased; ``*`` fills the wildcard slot;
- Disallow/Allow paths: empty disallow ignored at *match* time
  (RobotsDirectives drops ''), trailing ``*`` tolerated and stripped;
- Crawl-delay: first numeric token, float; ends an agent grouping;
- agent lookup (Robotstxt.getDirectivesFor :186-210): first *named*
  agent in declaration order that is a substring of the (lowercased)
  user-agent string; else the wildcard group; else allow-all.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class Directives:
    allows: list[str] = field(default_factory=list)
    disallows: list[str] = field(default_factory=list)
    crawl_delay: float = -1.0


@dataclass
class ParsedRobots:
    named: list[str] = field(default_factory=list)  # declaration order
    directives: dict[str, Directives] = field(default_factory=dict)
    wildcard: Directives | None = None
    has_errors: bool = False

    def directives_for(
        self, user_agent: str, use_fallbacks: bool = True
    ) -> Directives | None:
        """Robotstxt.getDirectivesFor (:186-210): first named agent (in
        declaration order) that is a substring of the lowercased UA;
        with ``use_fallbacks`` the wildcard group (else allow-all) backs
        a miss, without it a miss returns None (the two-arg overload
        FirstNamedRobotsPolicy.java:62,66 relies on)."""
        ua = user_agent.lower()
        for name in self.named:
            if name in ua:
                return self.directives[name]
        if not use_fallbacks:
            return None
        return self.wildcard if self.wildcard is not None else Directives()


_TAG_RE = re.compile(r"<[^>]+>")


def parse_robots(text: str) -> ParsedRobots:
    out = ParsedRobots()
    current: Directives | None = None
    has_directives_yet = False
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        line = _TAG_RE.sub("", line)
        if "#" in line:
            line = line[: line.index("#")]
        line = line.strip()
        low = line.lower()
        if low.startswith("user-agent:"):
            ua = line[11:].strip().lower()
            if current is None or has_directives_yet:
                current = Directives()
                has_directives_yet = False
            if ua == "*":
                out.wildcard = current
            else:
                out.named.append(ua)
                out.directives[ua] = current
            continue
        if low.startswith("disallow:"):
            if current is None:
                out.has_errors = True
                continue
            path = line[9:].strip()
            if path.endswith("*"):
                path = path[:-1]
            if path:  # '' disallow entries dropped (allow-all)
                current.disallows.append(path)
            has_directives_yet = True
            continue
        if low.startswith("crawl-delay:"):
            if current is None:
                out.has_errors = True
                continue
            has_directives_yet = True
            val = line[12:].strip()
            tok = re.split(r"[^\d.]+", val)
            try:
                if tok and tok[0]:
                    current.crawl_delay = float(tok[0])
            except ValueError:
                pass
            continue
        if low.startswith("allow:"):
            if current is None:
                out.has_errors = True
                continue
            path = line[6:].strip()
            if path.endswith("*"):
                path = path[:-1]
            current.allows.append(path)
            has_directives_yet = True
            continue
    return out


def robots_table_rows(
    bodies: dict[str, str], user_agent: str
) -> list[dict]:
    """{class_key: robots_body} → rows for the robots dimension table
    (class_key, allows, disallows, crawl_delay) for one crawler UA."""
    rows = []
    for class_key, body in bodies.items():
        d = parse_robots(body).directives_for(user_agent)
        rows.append(
            {
                "class_key": class_key,
                "allows": list(d.allows),
                "disallows": list(d.disallows),
                "crawl_delay": float(d.crawl_delay),
            }
        )
    return rows
