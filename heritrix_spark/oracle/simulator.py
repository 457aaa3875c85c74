"""Pure-Python reference simulator — the correctness oracle.

This module *defines* the round-discretized crawl semantics (SURVEY.md
§3 restated as rounds; §7 hard-part 2). The Spark engine
(plans/round.py) must reproduce, bit-identically:

- the URL-seen membership set,
- the per-host fetch order (the (class_key → [canon_url...]) map),
- every fetch_log row (round, ordinal, directive, precedence, status,
  disposition, politeness delay).

THE ROUND SPEC (normative):

0. Seeds: canonicalize each seed (reference: FrontierPreparer.prepare),
   collapse duplicates by canon keeping lowest seq, assign directive =
   NORMAL, cost = 1 (UnitCostAssignmentPolicy), precedence = cost
   (CostUriPrecedencePolicy), ordinal = 1..n in (seq) order, hops_path
   = ''. Insert canons into url_seen. Hosts start wake_time=0,
   expenditure=0, not retired.

1. A round r (logical clock in ms, starts at 0):
   eligible = hosts with nonempty queue, not retired, and queue
   precedence < precedence_floor (WorkQueueFrontier.java:164-170).
   Queue precedence per cfg.queue_precedence_policy:
   'base' = constant base (BaseQueuePrecedencePolicy :44);
   'highest_uri' = base + min enqueued URI precedence
   (HighestUriQueuePrecedencePolicy :80-90); 'success_counts' =
   base - 1 + increment thresholds crossed by the host's success count
   (SuccessCountsQueuePrecedencePolicy :84-100).
   None eligible → done.
   now_r = max(now_{r-1}, min(wake_time over eligible)).
   ready  = eligible hosts with wake_time <= now_r; when
   cfg.max_hosts_per_round > 0, only the best K by (queue_precedence,
   class_key) emit — precedence-ordered activation
   (activateInactiveQueue :753-786).
   Emit the head of each ready queue: min (directive, precedence,
   ordinal) — the BdbMultipleWorkQueues.calculateInsertKey order
   (:425-441). One URI per host per round = the reference's
   one-in-flight-per-queue politeness serialization
   (WorkQueueFrontier.findEligibleURI :616-623).

2. Fetch (the docs-table join):
   - robots PREREQUISITE (cfg.robots_prereq, PreconditionEnforcer
     .considerRobotsPreconditions :203-245): a non-robots emission from
     a host with robots_fetched < 0 → status S_DEFERRED, no fetch, no
     expenditure, no snooze (retryDelayFor :836-841 → 0), deferrals+1
     (attempts unchanged), re-enqueued; http://host/robots.txt is
     force-scheduled (addForce) as a candidate with link_seq = -1, hop
     'P', directive = max(parent-1, HIGHEST)
     (CrawlURI.markPrerequisite :1875-1896). The robots URI itself is
     exempt from deferral/preclusion and from extraction; completing
     its fetch (any status; 404 = allow-all) stamps robots_fetched
     (CrawlServer.updateRobots :138);
   - robots check on the canon URL's path (RobotsDirectives.allows
     :39-49 prefix law) → disallowed: status S_ROBOTS_PRECLUDED,
     disposition 'disregard', no fetch, no extraction;
   - doc exists (doc_id == canon_url): status 200,
     fetch_duration_ms = 10 + ((total_text_len + 7*n_spans) % 491)
     (deterministic stand-in for wall-clock fetch time);
   - else status 404, fetch_duration_ms = 25.
   Disposition: status > 0 → 'success' (CrawlURI.isSuccess :942);
   disregard statuses per AbstractFrontier.isDisregarded :1054.

3. Extraction (status in [200,400) only): spans in array order;
   kind='text' → every URL_IN_TEXT_PATTERN match, hop 'L';
   kind='media' → media_ref, hop 'E'. link_seq = span_pos * 2^20 +
   pos_within_span. Cap at max_outlinks in link_seq order (discarded
   counted).

4. Candidates: child hops_path = parent + hop char (50-char overflow
   law). Scope fold (operators/scope.py default chain) evaluated on
   the RAW url + child hops_path; out-of-scope dropped (counted).
   Seed scope prefixes = for each canonicalized seed,
   surt(seed) truncated after the authority's opening '(' content,
   WITHOUT the closing paren — i.e. 'http://(example,host000,' —
   so subdomains stay in scope (Heritrix SurtPrefixSet implied-domain
   behavior).
   Then canon = canonicalize(raw); class_key = surt authority of canon
   (NOTE: the reference keys queues on the raw authority; we key on the
   canonical form so www-variants fold into one queue — a documented
   divergence applied identically in engine and oracle);
   directive: NORMAL unless trailing trans-hops in (0, preference_embed_hops]
   → MEDIUM (FrontierPreparer.getSchedulingDirective :188-221);
   cost = 1; precedence = cost.

5. Dedup: collapse batch duplicates by canon keeping the first in
   (parent_ordinal, link_seq, canon) order; LEFT ANTI against url_seen;
   novel get ordinal = max_ordinal + rank in the same order, are added
   to url_seen and appended to the frontier.

6. Host update for each emitting host:
   'success'/'failure' → expenditure += cost (+error_penalty on
   failure); wake_time = now_r + politeness_delay(duration, crawl_delay)
   (DispositionProcessor.politenessDelayFor :231-294).
   'retry' → expenditure += cost unless S_DEFERRED (processFinish
   :976), wake_time = now_r + retry_delay_s*1000 (retryDelayFor
   :836-841), and the URI re-enqueues in place (same ordinal,
   attempts+1). 'success' also increments the host's success count.
   'disregard' → expenditure += 0, wake_time = now_r (no fetch
   occurred → durationToWait = 0).
   total_budget >= 0 and expenditure > total_budget → retired
   (WorkQueue.isOverTotalBudget :271-275).
   SESSION budget ("duty cycle", WorkQueueFrontier.java:119-127):
   expenditure also accrues to session_spent; when session_spent >
   session_budget the host deactivates (WorkQueue.isOverSessionBudget
   :260-264) — session_spent resets and activation_seq := round_no,
   sending the host to the back of the per-precedence FIFO inactive
   line. Under bounded activation (max_hosts_per_round > 0) the
   activation order is (queue_precedence, activation_seq, class_key),
   so over-budget hosts rotate out and other hosts get slots — the
   reference's fairness-across-more-queues-than-threads behavior. With
   unbounded activation the rotation is observably a no-op (every
   ready host emits each round regardless), matching unbounded toes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import hashlib

from heritrix_spark.constants import (
    MEDIUM,
    NORMAL,
    S_CONNECT_FAILED,
    S_DEFERRED,
    S_ROBOTS_PRECLUDED,
    PolitenessConfig,
)
from heritrix_spark.operators.budget import disposition_py, expenditure_py
from heritrix_spark.functions.canonicalize import canonicalize_py
from heritrix_spark.functions.hops import (
    extend_hops_path_py,
    hop_count_py,
    trans_hops_py,
)
from heritrix_spark.functions.surt import class_key_py, surt_py
from heritrix_spark.operators.extract import URL_IN_TEXT_PATTERN
from heritrix_spark.operators.politeness import (
    politeness_delay_py,
    robots_allows_py,
)

_URL_RE = re.compile(URL_IN_TEXT_PATTERN)


@dataclass
class PendingUri:
    url: str
    canon_url: str
    class_key: str
    directive: int
    precedence: int
    ordinal: int
    cost: int
    hops_path: str
    via: str | None
    attempts: int = 0
    deferrals: int = 0
    recrawls: int = 0
    # heritable seed-of-origin tag (SeedModule.sourceTagSeeds;
    # CrawlURI.setSourceTag :1503-1505 makeHeritable)
    source: str | None = None
    # CrawlURI.isSeed — scheduled seeds and redirect-promoted seeds
    # (CandidatesProcessor.checkForSeedPromotion :218-237)
    is_seed: bool = False


@dataclass
class HostState:
    wake_time: int = 0
    total_expenditure: int = 0
    succeeded: int = 0
    retired: bool = False
    robots_fetched: int = -1  # epoch-ms of last robots.txt fetch, -1 = never
    session_spent: int = 0  # expenditure since last activation (duty cycle)
    activation_seq: int = 0  # FIFO inactive-line position (round number)


_ROBOTS_URI_RE = re.compile(r"^https?://[^/]+/robots\.txt$")


@dataclass
class SimResult:
    fetch_log: list[dict] = field(default_factory=list)
    url_seen: set[str] = field(default_factory=set)
    # FrontierJournal twin (FrontierJournal.java:54-116): one tag row
    # per event — F+ scheduled-novel, Fe emitted, Fs/Ff/Fd/Fr finished
    journal: list[dict] = field(default_factory=list)
    rounds: int = 0
    out_of_scope: int = 0
    dup_dropped: int = 0

    def per_host_order(self) -> dict[str, list[str]]:
        order: dict[str, list[str]] = {}
        for row in self.fetch_log:
            order.setdefault(row["class_key"], []).append(row["canon_url"])
        return order


def seed_scope_prefixes(seed_urls: list[str]) -> list[str]:
    prefixes = set()
    for u in seed_urls:
        s = surt_py(canonicalize_py(u))
        m = re.match(r"^\w+://\([^)]*,", s)
        if m:
            prefixes.add(m.group(0))
    return sorted(prefixes)


def _is_flaky(canon_url: str) -> bool:
    """~1/7 of docs, md5-selected (same rule as the engine's column
    expression: conv(substr(md5(canon),1,2),16,10) % 7 == 0)."""
    return int(hashlib.md5(canon_url.encode()).hexdigest()[:2], 16) % 7 == 0


def _fetch_duration_ms(spans: list[dict]) -> int:
    total_text = sum(len(s["text"] or "") for s in spans)
    return 10 + (total_text + 7 * len(spans)) % 491


def _url_path(canon: str) -> str:
    m = re.match(r"^\w+://[^/]+(/.*)$", canon)
    return m.group(1) if m else "/"


def _in_scope(
    url: str, hops_path: str, prefixes: list[str], cfg: PolitenessConfig
) -> bool:
    """The default_scope fold (operators/scope.py) in Python."""
    decision = False
    s = surt_py(url)
    if any(s.startswith(p) for p in prefixes):
        decision = True
    if hop_count_py(hops_path) > cfg.max_hops:
        decision = False
    # TransclusionDecideRule.java:96-142: trailing non-'L' run with 'R'
    # not counted against max_trans (2) and 'X' capped at 1
    _, tail = re.match(r"^(?:(\d+)\+)?(.*)$", hops_path).groups()
    trailing = re.search(r"([^L]*)$", tail).group(1)
    if trailing:
        nonref = sum(1 for c in trailing if c != "R")
        spec = trailing.count("X")
        if spec <= 1 and nonref <= 2:
            decision = True
    if re.match(r"^[^?]*?/(.+?/)\1{2,}", url):
        decision = False
    path_part = re.sub(r"^\w+://[^/]*", "", url)
    if path_part.count("/") > 20:
        decision = False
    if hops_path.endswith("P"):
        decision = True
    m = re.match(r"^(\w+):", url)
    if not m or m.group(1).lower() not in ("http", "https", "ftp"):
        decision = False
    return decision


def simulate(
    docs: dict[str, list[dict]],
    seeds: list[dict],
    robots: dict[str, dict],
    cfg: PolitenessConfig = PolitenessConfig(),
    max_rounds: int = 10_000,
    host_config: dict[str, dict] | None = None,
) -> SimResult:
    res = SimResult()
    prefixes = seed_scope_prefixes([s["url"] for s in seeds])

    # per-host sheet overlays (KeyedProperties analog): effective config
    # = global cfg with the host's overrides applied (plans/round.py
    # OVERLAY_COLS — delay/budget fields only)
    from dataclasses import replace as _replace

    _eff_cache: dict[str, PolitenessConfig] = {}

    def eff(ck: str) -> PolitenessConfig:
        if not host_config:
            return cfg
        if ck not in _eff_cache:
            ov = host_config.get(ck)
            _eff_cache[ck] = _replace(cfg, **ov) if ov else cfg
        return _eff_cache[ck]

    # --- step 0: seeds
    queues: dict[str, list[PendingUri]] = {}
    hosts: dict[str, HostState] = {}
    max_ordinal = 0
    for s in sorted(seeds, key=lambda x: x["seq"]):
        canon = canonicalize_py(s["url"])
        if canon in res.url_seen:
            res.dup_dropped += 1
            continue
        res.url_seen.add(canon)
        ck = class_key_py(canon)
        max_ordinal += 1
        pu = PendingUri(
            url=s["url"], canon_url=canon, class_key=ck, directive=NORMAL,
            precedence=1, ordinal=max_ordinal, cost=1, hops_path="", via=None,
            # TextSeedModule.announceSeeds :181 — the seed's own URI string
            source=s["url"] if cfg.source_tag_seeds else None,
            is_seed=True,
        )
        queues.setdefault(ck, []).append(pu)
        hosts.setdefault(ck, HostState())
        res.journal.append(
            {"round": 0, "tag": "F+", "canon_url": canon, "class_key": ck}
        )

    from heritrix_spark.operators.prepare import queue_precedence_py

    def qprec(ck: str) -> int:
        q = queues.get(ck) or []
        return queue_precedence_py(
            cfg.queue_precedence_policy,
            cfg.queue_base_precedence,
            hosts[ck].succeeded,
            min((p.precedence for p in q), default=None),
            cfg.success_increments,
        )

    futures: list[tuple[int, PendingUri]] = []  # (reschedule_time, uri)
    now = 0
    for round_no in range(1, max_rounds + 1):
        eligible = [
            ck
            for ck, q in queues.items()
            if q and not hosts[ck].retired and qprec(ck) < cfg.precedence_floor
        ]
        if not eligible and not futures:
            break
        events = []
        if eligible:
            events.append(min(hosts[ck].wake_time for ck in eligible))
        if futures:
            events.append(min(t for t, _ in futures))
        now = max(now, min(events))
        # re-inject due futures (checkFutures :731-748)
        due = [(t, u) for t, u in futures if t <= now]
        if due:
            futures = [(t, u) for t, u in futures if t > now]
            for _, u in due:
                queues.setdefault(u.class_key, []).append(u)
            eligible = [
                ck
                for ck, q in queues.items()
                if q and not hosts[ck].retired and qprec(ck) < cfg.precedence_floor
            ]
        ready = [ck for ck in eligible if hosts[ck].wake_time <= now]
        if cfg.max_hosts_per_round > 0:
            # precedence, then FIFO inactive order (duty-cycle rotation),
            # then class_key (activateInactiveQueue :753-786)
            ready = sorted(
                ready, key=lambda ck: (qprec(ck), hosts[ck].activation_seq, ck)
            )[: cfg.max_hosts_per_round]
        if not ready:
            continue  # unreachable: now >= min wake_time
        res.rounds = round_no

        all_candidates: list[tuple] = []
        # (parent_ordinal, link_seq, canon, raw, hop_char_path, via,
        #  force, directive_override)

        for ck in sorted(ready):
            q = queues[ck]
            q.sort(key=lambda p: (p.directive, p.precedence, p.ordinal))
            uri = q.pop(0)
            host = hosts[ck]

            is_robots_uri = bool(_ROBOTS_URI_RE.match(uri.canon_url))
            rb = robots.get(ck)
            path = _url_path(uri.canon_url)
            allowed = (
                robots_allows_py(rb["allows"], rb["disallows"], path)
                if rb
                else True
            )
            if cfg.robots_prereq and is_robots_uri:
                allowed = True  # robots.txt exempt from preclusion
            crawl_delay = rb["crawl_delay"] if rb else -1.0

            # never fetched OR expired (CrawlServer.isRobotsExpired
            # :308-323: expired iff fetched + validity < now, strict;
            # validity 0 = valid forever)
            robots_stale = host.robots_fetched < 0 or (
                cfg.robots_validity_ms > 0
                and host.robots_fetched + cfg.robots_validity_ms < now
            )
            deferred = (
                cfg.robots_prereq and not is_robots_uri and robots_stale
            )
            spans = docs.get(uri.canon_url)
            if deferred:
                status, duration = S_DEFERRED, 0
            elif not allowed:
                status, duration = S_ROBOTS_PRECLUDED, 0
            elif (
                cfg.flaky_first_attempt
                and spans is not None
                and uri.attempts == 0
                and _is_flaky(uri.canon_url)
            ):
                status, duration = S_CONNECT_FAILED, 0
            elif spans is not None and spans and spans[0]["kind"] == "redirect":
                status, duration = 301, 15
            elif spans is not None:
                status, duration = 200, _fetch_duration_ms(spans)
            else:
                status, duration = 404, 25
            disposition = disposition_py(status, uri.attempts, eff(ck))

            # extraction (robots.txt bodies are parsed, never link-mined)
            links: list[tuple[int, str, str]] = []
            extract_ok = not (cfg.robots_prereq and is_robots_uri)
            if 200 <= status < 400 and spans and extract_ok:
                for span_pos, sp in enumerate(spans):
                    if sp["kind"] == "text":
                        found = _URL_RE.findall(sp["text"] or "")
                        for j, u in enumerate(found):
                            links.append((span_pos * (1 << 20) + j, u, "L"))
                    elif sp["kind"] == "script":
                        # speculative 'X' links from script content
                        found = _URL_RE.findall(sp["text"] or "")
                        for j, u in enumerate(found):
                            links.append((span_pos * (1 << 20) + j, u, "X"))
                    elif sp["kind"] == "redirect":
                        if sp["media_ref"]:
                            links.append((span_pos * (1 << 20), sp["media_ref"], "R"))
                    else:
                        if sp["media_ref"]:
                            links.append((span_pos * (1 << 20), sp["media_ref"], "E"))
                links = links[: eff(ck).max_outlinks]

            for link_seq, raw, hop in links:
                child_hops = extend_hops_path_py(uri.hops_path, hop)
                # scope-parameter overlays (maxHops) resolve by the
                # CANDIDATE's own queue key, like the engine's
                # candidate-side __o_max_hops join
                canon_child = canonicalize_py(raw)
                if not _in_scope(
                    raw, child_hops, prefixes, eff(class_key_py(canon_child))
                ):
                    res.out_of_scope += 1
                    continue
                # seed promotion (CandidatesProcessor :183-188): a seed's
                # REFER child under 5 hops is itself a seed
                promoted = (
                    cfg.seeds_redirect_new_seeds
                    and uri.is_seed
                    and hop == "R"
                    and hop_count_py(child_hops) < 5
                )
                all_candidates.append(
                    (uri.ordinal, link_seq, canon_child, raw, child_hops,
                     uri.canon_url, promoted, None, uri.source, promoted)
                )
            if deferred:
                # markPrerequisite :1875-1896: force-schedule robots.txt,
                # hop 'P', directive = max(parent - 1, HIGHEST); link_seq
                # -1 sorts it ahead of the parent's real outlinks
                m = re.match(r"^(https?://[^/]+)", uri.canon_url)
                robots_url = m.group(1) + "/robots.txt"
                child_hops = extend_hops_path_py(uri.hops_path, "P")
                canon_rob = canonicalize_py(robots_url)
                if _in_scope(
                    robots_url, child_hops, prefixes,
                    eff(class_key_py(canon_rob)),
                ):
                    all_candidates.append(
                        (uri.ordinal, -1, canon_rob, robots_url,
                         child_hops, uri.canon_url, True, max(uri.directive - 1, 0),
                         uri.source, False)
                    )
                else:
                    res.out_of_scope += 1

            # host/budget update (spec step 6)
            spent = expenditure_py(disposition, uri.cost, status, cfg)
            host.total_expenditure += spent
            host.session_spent += spent
            if host.session_spent > eff(ck).session_budget:
                # over session budget → deactivate: replenish and go to
                # the back of the activation line (WorkQueue
                # .isOverSessionBudget :260-264, deactivateQueue :628-634)
                host.session_spent = 0
                host.activation_seq = round_no
            if disposition == "success":
                host.succeeded += 1
            if disposition in ("success", "failure"):
                delay = politeness_delay_py(duration, crawl_delay, eff(ck))
            elif disposition == "retry":
                # retryDelayFor :836-841: S_DEFERRED does not snooze
                delay = (
                    0 if status == S_DEFERRED else eff(ck).retry_delay_s * 1000
                )
            else:
                delay = 0
            # bandwidth throttle (DispositionProcessor.java:263-290):
            # effective wake = max(politeness, bytes*1000/(kb*1024))
            wake_delay = delay
            if cfg.max_per_host_kb_sec > 0 and status in (200, 301) and spans:
                content_bytes = sum(
                    len(s["text"] or "") + len(s["media_ref"] or "") for s in spans
                )
                bw_ms = content_bytes * 1000 // (cfg.max_per_host_kb_sec * 1024)
                wake_delay = max(delay, bw_ms)
            host.wake_time = now + wake_delay
            if cfg.robots_prereq and is_robots_uri and status != S_DEFERRED:
                host.robots_fetched = now  # CrawlServer.updateRobots :138
            _tb = eff(ck).total_budget
            if _tb >= 0 and host.total_expenditure > _tb:
                host.retired = True
            if disposition == "retry":
                # re-enqueue in place: same ordinal; deferrals count
                # separately from fetch attempts (CrawlURI.java:173-174)
                if status == S_DEFERRED:
                    uri.deferrals += 1
                else:
                    uri.attempts += 1
                q.append(uri)
            elif (
                cfg.recrawl_interval_ms >= 0
                and disposition == "success"
                and uri.hops_path == ""
                and uri.recrawls < cfg.max_recrawls
            ):
                # spec step 7: recrawl successful seeds via futureUris
                uri.attempts = 0  # resetForRescheduling :1816
                uri.recrawls += 1
                futures.append((now + cfg.recrawl_interval_ms, uri))

            res.fetch_log.append(
                {
                    "round": round_no,
                    "now_ms": now,
                    "class_key": ck,
                    "url": uri.url,
                    "canon_url": uri.canon_url,
                    "ordinal": uri.ordinal,
                    "directive": uri.directive,
                    "precedence": uri.precedence,
                    "fetch_status": status,
                    "disposition": disposition,
                    "cost": uri.cost,
                    "politeness_delay_ms": delay,
                    "hops_path": uri.hops_path,
                    "via": uri.via,
                    "source": uri.source,
                    "is_seed": uri.is_seed,
                }
            )
            # journal twin of the engine's lineage rows (round.py
            # lineage_tag_disp): Fe on emit + disposition tag
            _disp_tag = {"success": "Fs", "disregard": "Fd", "retry": "Fr"}
            res.journal.append(
                {"round": round_no, "tag": "Fe",
                 "canon_url": uri.canon_url, "class_key": ck}
            )
            res.journal.append(
                {"round": round_no, "tag": _disp_tag.get(disposition, "Ff"),
                 "canon_url": uri.canon_url, "class_key": ck}
            )

        # --- candidate pipeline (batch across all ready hosts)
        # mirrors the engine exactly: collapse batch duplicates FIRST
        # (first in (parent_ordinal, link_seq, canon) order wins,
        # regardless of force), then forced rows bypass the seen
        # anti-join (addForce) while still marking the key seen
        all_candidates.sort(key=lambda c: (c[0], c[1], c[2]))
        batch_seen: set[str] = set()
        new_seed_urls: list[str] = []
        for (
            parent_ordinal, link_seq, canon, raw, child_hops, via,
            force, directive_override, source, is_seed,
        ) in all_candidates:
            if canon in batch_seen:
                res.dup_dropped += 1
                continue
            batch_seen.add(canon)
            if not force and canon in res.url_seen:
                res.dup_dropped += 1
                continue
            res.url_seen.add(canon)
            ck = class_key_py(canon)
            th = trans_hops_py(child_hops)
            if directive_override is not None:
                directive = directive_override
            else:
                directive = MEDIUM if 0 < th <= cfg.preference_embed_hops else NORMAL
                if is_seed and directive == NORMAL:
                    # promoted seeds get rapid scheduling
                    # (checkForSeedPromotion :230-233)
                    directive = MEDIUM
            max_ordinal += 1
            pu = PendingUri(
                url=raw, canon_url=canon, class_key=ck, directive=directive,
                precedence=1, ordinal=max_ordinal, cost=1,
                hops_path=child_hops, via=via, source=source, is_seed=is_seed,
            )
            queues.setdefault(ck, []).append(pu)
            res.journal.append(
                {"round": round_no, "tag": "F+", "canon_url": canon,
                 "class_key": ck}
            )
            # new hosts join the back of the inactive line this round
            hosts.setdefault(ck, HostState(wake_time=0, activation_seq=round_no))
            if is_seed:
                new_seed_urls.append(raw)
        if new_seed_urls:
            # scope widens from the NEXT round (round-discretized
            # SeedListener.addedSeed → SurtPrefixedDecideRule :236-240)
            prefixes = sorted(set(prefixes) | set(seed_scope_prefixes(new_seed_urls)))

    return res
