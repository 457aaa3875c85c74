"""Cross-round cache of unresolved Column expression trees.

Unresolved Columns — built purely from ``F.col("name")`` references and
literals, never from a DataFrame attribute — are immutable *plan
templates*: Catalyst re-resolves them against each plan at analysis
time, so the same Column object can appear in every round's
``select``/``filter``/``agg``. Building one, however, costs py4j round
trips (~0.6 ms each, synchronous): the fixture-crawl cProfile audit
(BENCH/PLANS.md "where a fixture round's wall time actually goes")
attributed ~8.8k such calls per round — ~40% of per-round wall at
fixture scale — to re-building Column trees that are identical from
round to round (the reference builds its processor chain ONCE at crawl
launch; profile-crawler-beans.cxml wires it statically). This cache is
the Spark-plan analog of that one-time wiring: the first round builds
the tree, later rounds get a dict hit.

Rules for cacheable builders:
- the builder must reference columns by NAME (``F.col``), never bind to
  a DataFrame (``df["c"]``) — bound references capture a plan id;
- the key must be plain hashable data (strings, ints, tuples, frozen
  dataclasses like PolitenessConfig) — never a Column (whose ``__eq__``
  returns a Column, poisoning dict lookup);
- cached values are treated as immutable — builders return Columns,
  tuples of Columns, or WindowSpecs (all immutable); never lists that a
  caller might mutate.

Entries are keyed by the live py4j gateway's identity so a restarted
JVM can never serve stale JVM object references (a fresh gateway gets a
fresh namespace; dead entries are unreachable and harmless).
"""

from __future__ import annotations

from typing import Any, Callable, Hashable

from pyspark import SparkContext

_CACHE: dict[tuple, Any] = {}


def _gateway_ns() -> int:
    gw = getattr(SparkContext, "_gateway", None)
    return id(gw) if gw is not None else 0


def cached(key: Hashable, builder: Callable[[], Any]) -> Any:
    """Return the cached expression for ``key``, building it once per
    py4j gateway. ``key`` must be globally unique for the builder's
    output (include every parameter the tree depends on)."""
    k = (_gateway_ns(), key)
    try:
        return _CACHE[k]
    except KeyError:
        v = _CACHE[k] = builder()
        return v


def clear() -> None:
    """Drop every cached tree (tests / leak hygiene)."""
    _CACHE.clear()
