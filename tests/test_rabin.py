"""Rabin std24/std40 fingerprints (functions/rabin.py) vs the reference
golden values — BdbUriUniqFilterTest.testCreateKey
(heritrix3/engine/src/test/java/.../BdbUriUniqFilterTest.java:89-97)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from heritrix_spark.functions.rabin import (
    FPGen,
    create_key_batch,
    create_key_py,
    rabin_key_col,
    std24,
    std40,
)

GOLDEN = [
    ("dns:archive.org", 8812917769287344085),
    ("http://archive.org/index.html", 6613237167064754714),
]


@pytest.mark.parametrize("url,key", GOLDEN)
def test_reference_goldens_scalar(url, key):
    assert create_key_py(url) == key


def test_reference_goldens_batch():
    s = pd.Series([u for u, _ in GOLDEN] + [None])
    got = create_key_batch(s).tolist()
    assert got[:2] == [k for _, k in GOLDEN]
    assert got[2] is pd.NA or got[2] != got[2] or got[2] is None


def test_host_prefix_locality():
    """createKey puts the std24 fingerprint of scheme://host in the top
    24 bits, so one authority's keys sort adjacently (the BDB-btree
    locality law the reference relies on)."""
    a = create_key_py("http://archive.org/index.html")
    b = create_key_py("http://archive.org/other/page.html")
    c = create_key_py("http://example.com/index.html")
    top = lambda k: np.uint64(np.int64(k)) >> np.uint64(40)
    assert top(a) == top(b)
    assert top(a) != top(c)


def test_batch_equals_scalar_random():
    import random
    import string

    random.seed(42)
    urls = [
        "".join(random.choice(string.printable[:94]) for _ in range(random.randint(0, 80)))
        for _ in range(300)
    ] + ["http://例子.測試/päth", ""]
    got = create_key_batch(pd.Series(urls)).tolist()
    want = [create_key_py(u) for u in urls]
    assert got == want


def test_fp_against_independent_bitwise_model():
    """Cross-check the table-driven kernel against a from-scratch GF(2)
    polynomial model: fp(S) = f(g(S)) mod P where g(S) prepends 0x01
    and eight 0x00 bytes, polynomials keep the least significant
    exponent in the MOST significant bit (FPGenerator class docs)."""

    def slow_fp(s: str, poly: int, degree: int) -> int:
        # message polynomial from the class's own definition: start
        # marker x^64 (empty = PowerTable[64]), each appended 16-bit
        # unit multiplies everything by x^16 and enters at exponents
        # 64..79 with the unit's LSB at the HIGHEST exponent ("least
        # significant exponent in the most significant bit"). So for
        # units c_0..c_{n-1}: marker at x^(64+16n), and bit p of c_j
        # at exponent 63 - p + 16*(n - j).
        units = np.frombuffer(s.encode("utf-16-le"), dtype="<u2")
        n = len(units)
        top = 64 + 16 * n
        coeffs = [0] * (top + 1)  # coeffs[m] = coefficient of x^(top-m)
        coeffs[0] = 1  # the marker
        for j, unit in enumerate(units):
            for p in range(16):
                if (int(unit) >> p) & 1:
                    e = 63 - p + 16 * (n - j)
                    coeffs[top - e] ^= 1
        # left-to-right GF(2) long division. The stored constant holds
        # coefficients of x^0..x^degree at bits 63..63-degree (the
        # x^degree leading term IS included — the PowerTable overflow
        # step cancels it by xor); read descending
        P = [(poly >> (63 - i)) & 1 for i in range(degree, -1, -1)]
        rem = coeffs
        for j in range(len(rem) - degree):
            if rem[j]:
                for k in range(degree + 1):
                    rem[j + k] ^= P[k]
        tail = rem[-degree:]
        # remainder coeffs: tail[m] is coeff of x^(degree-1-m); the
        # fingerprint long stores coeff of x^i at bit 63-i
        out = 0
        for m, bit in enumerate(tail):
            if bit:
                out |= 1 << (63 - (degree - 1 - m))
        return out

    for s in ["", "a", "dns:archive.org", "http://archive.org/index.html", "ü"]:
        assert std24.fp(s) == slow_fp(s, std24.polynomial, 24), s
        assert std40.fp(s) == slow_fp(s, std40.polynomial, 40), s


def test_rabin_key_col_spark(spark):
    df = spark.createDataFrame([(u,) for u, _ in GOLDEN] + [(None,)], "url string")
    rows = df.select("url", rabin_key_col("url").alias("k")).collect()
    got = {r.url: r.k for r in rows}
    for u, k in GOLDEN:
        assert got[u] == k
    assert got[None] is None


def test_shard_col_rabin_backend(spark):
    from heritrix_spark.operators.seen import shard_col

    df = spark.createDataFrame(
        [("http://archive.org/index.html",), ("dns:archive.org",)], "canon_url string"
    )
    rows = df.select(
        shard_col("canon_url", 64, fp="rabin").alias("s"),
        shard_col("canon_url", 64).alias("x"),
    ).collect()
    for r in rows:
        assert 0 <= r.s < 64 and 0 <= r.x < 64
    # pinned: pmod of the golden keys
    assert rows[0].s == 6613237167064754714 % 64
    assert rows[1].s == 8812917769287344085 % 64
