"""Shared constants mirroring the reference's semantic values.

Sources:
- SchedulingConstants (heritrix3/modules/.../SchedulingConstants.java:32-47)
- FetchStatusCodes (heritrix3/modules/.../fetcher/FetchStatusCodes.java:35-122)
- frontier/politeness defaults (DispositionProcessor.java:75-114,
  AbstractFrontier.java:104-138, WorkQueueFrontier.java:119-170)
"""

from __future__ import annotations

from dataclasses import dataclass

# Scheduling directives (coarse priority; lower = more urgent).
HIGHEST = 0
HIGH = 1
MEDIUM = 2
NORMAL = 3

# Fetch status codes (positive = HTTP/DNS status, negative = internal).
S_UNATTEMPTED = 0
S_DOMAIN_UNRESOLVABLE = -1
S_CONNECT_FAILED = -2
S_CONNECT_LOST = -3
S_TIMEOUT = -4
S_RUNTIME_EXCEPTION = -5
S_TOO_MANY_RETRIES = -8
S_DEFERRED = -50
S_DEEMED_CHAFF = -4000
S_TOO_MANY_LINK_HOPS = -4001
S_TOO_MANY_EMBED_HOPS = -4002
S_OUT_OF_SCOPE = -5000
S_BLOCKED_BY_USER = -5001
S_BLOCKED_BY_CUSTOM_PROCESSOR = -5002
S_BLOCKED_BY_QUOTA = -5003
S_BLOCKED_BY_RUNTIME_LIMIT = -5004
S_DELETED_BY_USER = -6000
S_ROBOTS_PRECLUDED = -9998
S_NOT_FOUND = 404

# Statuses classified "disregarded" (AbstractFrontier.isDisregarded :1054-1067).
DISREGARD_STATUSES = (
    S_ROBOTS_PRECLUDED,
    S_BLOCKED_BY_CUSTOM_PROCESSOR,
    S_OUT_OF_SCOPE,
    S_BLOCKED_BY_USER,
    S_TOO_MANY_EMBED_HOPS,
    S_TOO_MANY_LINK_HOPS,
    S_DELETED_BY_USER,
)

# Statuses eligible for retry (AbstractFrontier.needsReenqueuing :1078-1111;
# the 401-with-credentials case is out of scope — no live auth).
RETRY_STATUSES = (
    S_DEFERRED,
    S_CONNECT_FAILED,
    S_CONNECT_LOST,
    S_DOMAIN_UNRESOLVABLE,
)

# Hop characters (modules/.../extractor/Hop.java:31-57).
HOP_NAVLINK = "L"
HOP_PREREQ = "P"
HOP_EMBED = "E"
HOP_SPECULATIVE = "X"
HOP_REFER = "R"
HOP_INFERRED = "I"

MAX_ORDINAL = (1 << 48) - 1  # 48-bit ordinal (CrawlURI.java:253-257)


@dataclass(frozen=True)
class PolitenessConfig:
    """The "politeness budget" of the north rule (FIXTURES.md §4).

    Defaults = the reference's defaults, cited per field.
    """

    delay_factor: float = 5.0  # DispositionProcessor.java:75
    min_delay_ms: int = 3000  # :89
    max_delay_ms: int = 30000  # :114
    respect_crawl_delay_up_to_s: int = 300  # :103
    retry_delay_s: int = 900  # AbstractFrontier.java:104
    max_retries: int = 30  # AbstractFrontier.java:116
    session_budget: int = 3000  # WorkQueueFrontier.java:120 (balanceReplenishAmount)
    error_penalty: int = 100  # WorkQueueFrontier.java:131
    total_budget: int = -1  # WorkQueueFrontier.java:143 (-1 = unlimited)
    precedence_floor: int = 255  # WorkQueueFrontier.java:164
    max_outlinks: int = 6000  # AbstractFrontier.java:138
    # Per-host bandwidth throttle (DispositionProcessor.java:263-290,
    # maxPerHostBandwidthUsageKbSec; reference default 0 = off): after a
    # fetch of b content bytes the host may not emit again before
    # fetch_end + b*1000/(kb*1024) ms; the effective wake is
    # max(politeness wake, bandwidth wake). Content bytes in this model =
    # sum over spans of len(text) + len(media_ref).
    max_per_host_kb_sec: int = 0
    preference_embed_hops: int = 1  # FrontierPreparer preferenceEmbedHops default
    preference_depth_hops: int = -1  # FrontierPreparer preferenceDepthHops default
    max_hops: int = 20  # TooManyHopsDecideRule default maxHops
    n_seen_shards: int = 64  # url_seen hash shards (ours; scale knob)
    # Queue precedence (engine/.../frontier/precedence/*):
    # policy ∈ base | highest_uri | success_counts
    # - base: constant basePrecedence (BaseQueuePrecedencePolicy.java:44)
    # - highest_uri: base + min enqueued URI precedence
    #   (HighestUriQueuePrecedencePolicy :80-90)
    # - success_counts: base - 1 + thresholds crossed by success count,
    #   increments "100,1000"-style with last repeating
    #   (SuccessCountsQueuePrecedencePolicy :84-100)
    queue_precedence_policy: str = "base"
    queue_base_precedence: int = 3  # BaseQueuePrecedencePolicy default
    success_increments: tuple[int, ...] = (100, 1000)
    # Bounded activation: at most K ready hosts emit per round, chosen by
    # (queue_precedence asc, class_key asc) — the precedence-ordered
    # activation analog (WorkQueueFrontier.activateInactiveQueue
    # :753-786); -1 = unlimited (default: rounds emit from every ready
    # host, equivalent to unbounded toe threads).
    max_hosts_per_round: int = -1
    # Future rescheduling (futureUris analog, WorkQueueFrontier.checkFutures
    # :731-748 + ReschedulingProcessor.java:35-47): when
    # recrawl_interval_ms >= 0, successfully fetched SEED URIs are
    # rescheduled reschedule_time = now + interval, up to max_recrawls
    # times, with attempts reset (CrawlURI.resetForRescheduling :1816).
    recrawl_interval_ms: int = -1
    max_recrawls: int = 1
    # Robots prerequisite chain (PreconditionEnforcer.considerRobotsPreconditions,
    # engine/.../prefetch/PreconditionEnforcer.java:203-245 + CrawlURI.markPrerequisite
    # :1875-1896): when true, a host's first emission while its robots.txt
    # has never been fetched (host_state.robots_fetched < 0) is DEFERRED
    # (S_DEFERRED, no fetch, no expenditure, no snooze) and a prerequisite
    # URI http://host/robots.txt is force-scheduled (addForce — bypasses
    # the seen check) into the same queue with hop 'P' and directive =
    # max(blocked.directive - 1, HIGHEST), so it sorts ahead of the
    # blocked URI. Fetching the robots URI (any status — 404 = allow-all,
    # CrawlServer.updateRobots :138) stamps robots_fetched; only then do
    # the host's robots directives gate fetches. The robots URI itself is
    # exempt from robots preclusion and from outlink extraction.
    robots_prereq: bool = False
    # Seeds-redirect-new-seeds (CandidatesProcessor.java:86-99,183-199 +
    # checkForSeedPromotion :218-237; reference default TRUE): a
    # candidate discovered from a seed via a REFER ('R') hop with hop
    # count < 5 (SEEDS_REDIRECT_NEW_SEEDS_MAX_HOPS :100) is itself
    # promoted to a seed — its schedulingDirective bumps NORMAL→MEDIUM,
    # it is force-fetched past the seen set ("guarantee crawling of
    # seed version ... even if same url has already been enqueued",
    # HER-1891), and its implied-domain SURT prefix joins the crawl
    # scope (SeedListener.addedSeed → SurtPrefixedDecideRule :236-240),
    # effective from the NEXT round under round discretization. Off by
    # default here so fixtures without redirecting seeds are unaffected;
    # the law itself matches the reference's default-on behavior.
    seeds_redirect_new_seeds: bool = False
    # Seed source-tag attribution (SeedModule.sourceTagSeeds,
    # modules/.../seeds/SeedModule.java:40-46; TextSeedModule.java:181
    # sets the seed's own URI string as its tag): every discovered URI
    # inherits its seed-of-origin (CrawlURI.setSourceTag :1503-1505
    # makeHeritable — the tag flows through L/E/X/R/I outlinks and 'P'
    # prerequisites alike). Feeds the SourceTagsReport (source, host,
    # #urls) tally of successful fetches (StatisticsTracker.java:765-769).
    # Off by default, as in the reference; the fetch_log `source` column
    # is null when disabled.
    source_tag_seeds: bool = False
    # Robots expiry (CrawlServer.isRobotsExpired, modules/.../net/
    # CrawlServer.java:308-323 + PreconditionEnforcer.java:219-236): a
    # host whose robots stamp is older than this many ms at emission
    # time is treated exactly like never-fetched — the emission DEFERS
    # and the robots URI is re-force-scheduled (markPrerequisite fires
    # "even though its already crawled"; addForce bypasses the seen
    # set). 0 = robots valid forever (the reference's 0 semantics;
    # Heritrix's shipped default is 86400 s). Expired iff
    # robots_fetched + validity < now (strict, :317). Hazard, faithful
    # to the reference: a validity below a host's politeness delay
    # livelocks that host (robots is re-expired at every wake, so the
    # blocked URI re-defers forever — heritrix3 never consults
    # CrawlURI.getDeferrals(), so it has no cap either); the guard in
    # both engines is the crawl-level round bound.
    robots_validity_ms: int = 0
    # Bloom-sidecar prefilter for the URL-seen set (operators/bloomseen.py;
    # BloomUriUniqFilter analog, but accuracy-preserving — the exact
    # anti-join stays authoritative). > 0 = bits per shard bloom (power
    # of two); 0 = off. When on, the crawl loop maintains an append-only
    # "url_seen_bloom" table and each round's candidate dedup probes it
    # first: definite misses skip the exact join, and seen shards with
    # zero hits are pruned from the seen-side scan. Membership is
    # bit-identical either way (tests/test_bloomseen.py, e2e test).
    seen_bloom_bits: int = 0
    # Cuckoo-sidecar prefilter (operators/cuckooseen.py) — the
    # deletable half of the north star's "bloom/cuckoo URL-seen set":
    # counting (shard, bucket, fp) fingerprint deltas; forget appends
    # -1 rows and compaction frees slots, where a bloom only accretes.
    # > 0 = buckets per shard; 0 = off. Mutually exclusive with
    # seen_bloom_bits (bloom wins if both set). Membership is
    # bit-identical either way (tests/test_cuckooseen.py e2e).
    seen_cuckoo_buckets: int = 0
    # Test knob: when true, ~1/7 of existing docs (md5-selected) fail
    # their first fetch attempt with S_CONNECT_FAILED and succeed on
    # retry — exercises needsReenqueuing/retryDelay semantics
    # (AbstractFrontier.java:1078-1111, 836-841) deterministically.
    flaky_first_attempt: bool = False
