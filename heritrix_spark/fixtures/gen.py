"""Deterministic synthetic crawl fixtures (FIXTURES.md §1-4, §7).

One generation pass produces plain-Python structures consumed by the
oracle simulator AND written to parquet for the Spark engine, so both
sides see byte-identical input. Seeded ``random.Random`` throughout —
no external data, reproducible at any scale
(``--hosts --docs-per-host --links-per-doc --hot-host-factor --seed``).

Fixture properties (FIXTURES.md §1-3):
- interleaved text+media spans, offset-ordered;
- ~80% same-host links, ~20% cross-host, some duplicates, some dead
  (404 analog), some self links, occasional uppercase/www-prefixed raw
  forms (canonicalization exercise);
- one hot host with ``hot_host_factor``× in-degree (skew exercise);
- robots variety: allow-all, ``Disallow: /cgi-bin/``, ``Disallow: /``
  (full exclusion), crawl_delay=20, allow-``/path``+disallow-``/``.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field

from heritrix_spark.functions.canonicalize import canonicalize_py

WORDS = (
    "frontier queue crawl fetch robots span media politeness budget "
    "ordinal precedence host seed scope canonical surt shard bloom merge"
).split()


@dataclass
class CrawlFixture:
    docs: list[dict] = field(default_factory=list)  # {doc_id, spans:[{kind,text,media_ref,offset}]}
    seeds: list[dict] = field(default_factory=list)  # {url, seq}
    robots: list[dict] = field(default_factory=list)  # {class_key, allows, disallows, crawl_delay}

    def doc_map(self) -> dict[str, list[dict]]:
        return {d["doc_id"]: d["spans"] for d in self.docs}

    def robots_map(self) -> dict[str, dict]:
        return {r["class_key"]: r for r in self.robots}


def _host(i: int) -> str:
    return f"host{i:03d}.example"


def _class_key(host: str) -> str:
    # SURT authority of hostNNN.example = "example,hostNNN,"
    parts = host.split(".")
    return ",".join(reversed(parts)) + ","


def generate(
    hosts: int = 6,
    docs_per_host: int = 8,
    links_per_doc: int = 4,
    hot_host_factor: int = 4,
    seed: int = 42,
    seed_redirect: bool = False,
) -> CrawlFixture:
    rng = random.Random(seed)
    fx = CrawlFixture()
    host_names = [_host(i) for i in range(hosts)]
    hot = host_names[0]  # the skewed host

    all_paths: dict[str, list[str]] = {
        h: [f"/p{j}/page{j}.html" for j in range(docs_per_host)] for h in host_names
    }
    # one robots-excluded area on host 2 (if present)
    if hosts > 2:
        all_paths[host_names[2]].append("/cgi-bin/trap.html")

    # one redirect path per host, linked to like any page (below)
    redirect_paths = {h: f"/r{i % 7}.html" for i, h in enumerate(host_names)}

    def pick_target(src_host: str) -> str:
        # hot host gets hot_host_factor× the cross-host in-degree
        if rng.random() < 0.2:
            weights = [hot_host_factor if h == hot else 1 for h in host_names]
            dst = rng.choices(host_names, weights=weights, k=1)[0]
        else:
            dst = src_host
        r = rng.random()
        if r < 0.08:
            return f"http://{dst}/missing{rng.randrange(100)}.html"  # dead link
        if r < 0.18:
            return f"http://{dst}{redirect_paths[dst]}"  # via a 301
        return f"http://{dst}{rng.choice(all_paths[dst])}"

    def messy(url: str) -> str:
        """Sometimes emit a non-canonical raw form of the same URL."""
        r = rng.random()
        if r < 0.08:
            scheme, rest = url.split("://", 1)
            host_part, _, path = rest.partition("/")
            return f"{scheme}://www.{host_part}/{path}"
        if r < 0.14:
            return url.upper().replace("HTTP://", "http://")
        if r < 0.18:
            return url + "?"
        return url

    for h in host_names:
        for path in all_paths[h]:
            doc_id = canonicalize_py(f"http://{h}{path}")
            n_spans = rng.randrange(2, 8)
            spans = []
            for off in range(n_spans):
                r_kind = rng.random()
                if r_kind < 0.3:
                    spans.append(
                        {
                            "kind": "media",
                            "text": None,
                            "media_ref": f"http://{rng.choice(host_names)}/img{rng.randrange(40)}.png",
                            "offset": off,
                        }
                    )
                elif r_kind < 0.42:
                    # script span: URLs inside script text are speculative
                    # 'X' links (ExtractorHTML speculative extraction,
                    # Hop.SPECULATIVE, Hop.java:41-44)
                    spans.append(
                        {
                            "kind": "script",
                            "text": "var u = "
                            + " ; ".join(
                                messy(pick_target(h))
                                for _ in range(rng.randrange(1, 3))
                            ),
                            "media_ref": None,
                            "offset": off,
                        }
                    )
                else:
                    n_links = rng.randrange(0, links_per_doc + 1)
                    words = [rng.choice(WORDS) for _ in range(rng.randrange(3, 9))]
                    urls = [messy(pick_target(h)) for _ in range(n_links)]
                    if urls and rng.random() < 0.1:
                        urls.append(urls[0])  # duplicate link
                    if rng.random() < 0.05:
                        urls.append(f"http://{h}{path}")  # self link
                    text_parts = []
                    for k, w in enumerate(words):
                        text_parts.append(w)
                        if k < len(urls):
                            text_parts.append(urls[k])
                    text_parts.extend(urls[len(words):])
                    spans.append(
                        {
                            "kind": "text",
                            "text": " ".join(text_parts),
                            "media_ref": None,
                            "offset": off,
                        }
                    )
            fx.docs.append({"doc_id": doc_id, "spans": spans})

        # one redirect doc per host (ExtractorHTTP 'R' exercise):
        # /rN.html 301-redirects to a real page on the same host; its
        # single span is kind='redirect' with the Location in media_ref
        fx.docs.append(
            {
                "doc_id": canonicalize_py(f"http://{h}{redirect_paths[h]}"),
                "spans": [
                    {
                        "kind": "redirect",
                        "text": None,
                        "media_ref": f"http://{h}{rng.choice(all_paths[h])}",
                        "offset": 0,
                    }
                ],
            }
        )

    # seeds: one per first-3 hosts; include a www-form and an UPPERCASE form
    seed_urls = []
    for i, h in enumerate(host_names[: max(3, min(hosts, 5))]):
        p = all_paths[h][0]
        if i == 1:
            seed_urls.append(f"http://www.{h}{p}")
        elif i == 2:
            seed_urls.append(f"http://{h}{p}".upper().replace("HTTP://", "http://"))
        else:
            seed_urls.append(f"http://{h}{p}")
    if hosts > 4:
        seed_urls.append(f"http://{host_names[4]}/cgi-bin/denied.html")
    fx.seeds = [{"url": u, "seq": i} for i, u in enumerate(seed_urls)]

    if seed_redirect:
        # seedsRedirectNewSeeds exercise (CandidatesProcessor :183-199):
        # a SEED that 301s to a page on an otherwise-unseeded host.
        # Without promotion, transclusion admits the redirect target
        # itself (trailing 'R') but its 'RL' children stay out of scope;
        # with promotion the target's prefix joins the scope and the
        # whole redirtarget.example subtree crawls. Appended after the
        # rng-driven section with NO rng draws, so every other fixture
        # byte is unchanged.
        rt = "redirtarget.example"
        fx.docs.append(
            {
                "doc_id": canonicalize_py(f"http://{rt}/t0.html"),
                "spans": [
                    {
                        "kind": "text",
                        "text": f"landing page http://{rt}/t1.html tail",
                        "media_ref": None,
                        "offset": 0,
                    }
                ],
            }
        )
        fx.docs.append(
            {
                "doc_id": canonicalize_py(f"http://{rt}/t1.html"),
                "spans": [
                    {
                        "kind": "text",
                        "text": f"deep page http://{rt}/t0.html loop",
                        "media_ref": None,
                        "offset": 0,
                    }
                ],
            }
        )
        seedr = f"http://{host_names[0]}/seedr.html"
        fx.docs.append(
            {
                "doc_id": canonicalize_py(seedr),
                "spans": [
                    {
                        "kind": "redirect",
                        "text": None,
                        "media_ref": f"http://{rt}/t0.html",
                        "offset": 0,
                    }
                ],
            }
        )
        fx.seeds.append({"url": seedr, "seq": len(fx.seeds)})
        fx.robots.append(
            {
                "class_key": _class_key(rt),
                "allows": [],
                "disallows": [],
                "crawl_delay": -1.0,
            }
        )

    # robots (FIXTURES.md §3 variety)
    for i, h in enumerate(host_names):
        ck = _class_key(h)
        if i == 2:
            fx.robots.append(
                {"class_key": ck, "allows": [], "disallows": ["/cgi-bin/"], "crawl_delay": -1.0}
            )
        elif i == 4 and hosts > 4:
            fx.robots.append(
                {"class_key": ck, "allows": [], "disallows": ["/"], "crawl_delay": -1.0}
            )
        elif i == 3 and hosts > 3:
            fx.robots.append(
                {"class_key": ck, "allows": [], "disallows": [], "crawl_delay": 20.0}
            )
        elif i == 5 and hosts > 5:
            fx.robots.append(
                {"class_key": ck, "allows": ["/p"], "disallows": ["/"], "crawl_delay": -1.0}
            )
        else:
            fx.robots.append(
                {"class_key": ck, "allows": [], "disallows": [], "crawl_delay": -1.0}
            )
    return fx


def write_parquet(fx: CrawlFixture, out_dir: str) -> dict[str, str]:
    """Write docs/seeds/robots to parquet via pyarrow; returns paths."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    span_type = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    docs_tbl = pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in fx.docs], pa.string()),
            "spans": pa.array([d["spans"] for d in fx.docs], pa.list_(span_type)),
        }
    )
    seeds_tbl = pa.table(
        {
            "url": pa.array([s["url"] for s in fx.seeds], pa.string()),
            "seq": pa.array([s["seq"] for s in fx.seeds], pa.int32()),
        }
    )
    robots_tbl = pa.table(
        {
            "class_key": pa.array([r["class_key"] for r in fx.robots], pa.string()),
            "allows": pa.array([r["allows"] for r in fx.robots], pa.list_(pa.string())),
            "disallows": pa.array([r["disallows"] for r in fx.robots], pa.list_(pa.string())),
            "crawl_delay": pa.array([r["crawl_delay"] for r in fx.robots], pa.float64()),
        }
    )
    paths = {}
    for name, tbl in [("docs", docs_tbl), ("seeds", seeds_tbl), ("robots", robots_tbl)]:
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, path)
        paths[name] = path
    return paths
