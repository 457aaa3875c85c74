"""Property-based agreement of the three PSL assignment-level-reduce
backends (pure Python, vectorized pandas kernel, DuckDB SQL twin) over
generated SURT authorities: real public-suffix keys (sampled from the
embedded rule table, including wildcard/exception entries) extended
with random labels, plus junk inputs."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from heritrix_spark.functions.psl import (
    _load,
    _reduce_pandas,
    psl_rules_cte,
    reduce_surt_authority_py,
    reduce_surt_sql,
)

_RULES = sorted(_load().items())
# deterministic sample across the table, plus every wildcard/exception
_KEYS = [k for k, _ in _RULES[::97]] + [
    k for k, v in _RULES if v // 100 or (v // 10) % 10
][::23]

_LABEL = st.text(alphabet="abcxyz0189-", min_size=1, max_size=6)
_SUFFIXED = st.builds(
    lambda key, extra, port: key
    + "".join(x + "," for x in extra)
    + (port or ""),
    st.sampled_from(_KEYS),
    st.lists(_LABEL, max_size=3),
    st.sampled_from(["", "#80,", "#8443,"]),
)
_JUNK = st.text(alphabet="abc,#.0", max_size=12)
_BATCH = st.lists(st.one_of(_SUFFIXED, _JUNK), min_size=1, max_size=30)

_CON = None


def _duck_reduce(auths: list[str]) -> list[str]:
    global _CON
    if _CON is None:
        _CON = duckdb.connect()
    _CON.register(
        "u", pd.DataFrame({"i": range(len(auths)), "auth": auths})
    )
    q = f"with {psl_rules_cte()} select {reduce_surt_sql('auth')} from u order by i"
    return [r[0] for r in _CON.execute(q).fetchall()]


@settings(max_examples=120, deadline=None)
@given(_BATCH)
def test_psl_pandas_matches_py(auths):
    got = _reduce_pandas(pd.Series(auths, dtype="object")).tolist()
    assert got == [reduce_surt_authority_py(a) for a in auths]


@settings(max_examples=40, deadline=None)
@given(_BATCH)
def test_psl_duckdb_matches_py(auths):
    assert _duck_reduce(auths) == [
        reduce_surt_authority_py(a) for a in auths
    ]
