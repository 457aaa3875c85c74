"""Gopher quality-filter signals (pipeline/textstats.py
gopher_quality_signals; Rae et al. 2021 Appendix A)."""

from __future__ import annotations

import re

from heritrix_spark.pipeline.textstats import (
    GOPHER_STOP_WORDS,
    gopher_quality_signals,
)


def _py_signals(text: str) -> dict:
    toks = [w for w in re.split(r"\s+", text.lower()) if w != ""]
    lines = text.split("\n")
    n_words = len(toks)
    sig = {
        "n_words": n_words,
        "word_chars": sum(len(w) for w in toks),
        "n_alpha_words": sum(1 for w in toks if re.search("[a-z]", w)),
        "n_symbols": text.count("#") + text.count("..."),
        "n_stop_hits": sum(1 for sw in GOPHER_STOP_WORDS if sw in toks),
        "n_lines": len(lines),
        "n_bullet_lines": sum(
            1 for l in lines if re.match(r"^\s*[-•*]", l)
        ),
        "n_ellipsis_lines": sum(
            1 for l in lines if re.search(r"\.\.\.\s*$", l)
        ),
    }
    w = sig["n_words"]
    sig.update(
        pass_word_count=50 <= w <= 100_000,
        pass_mean_word_len=3 * w <= sig["word_chars"] <= 10 * w,
        pass_symbol_ratio=10 * sig["n_symbols"] <= w,
        pass_alpha_words=5 * sig["n_alpha_words"] >= 4 * w,
        pass_stop_words=sig["n_stop_hits"] >= 2,
        pass_bullet_lines=10 * sig["n_bullet_lines"] <= 9 * sig["n_lines"],
        pass_ellipsis_lines=10 * sig["n_ellipsis_lines"] <= 3 * sig["n_lines"],
    )
    sig["pass_gopher"] = all(
        v for k, v in sig.items() if k.startswith("pass_")
    )
    return sig


DOCS = [
    (1, " ".join(["the quick brown fox jumps over and that dog"] * 8)),
    (2, "# # # # # # # # # #\nthe of and"),  # symbol-heavy, too short
    (3, "\n".join(["- item " + str(i) for i in range(10)])),  # all bullets
    (4, "waiting for more...\nstill waiting...\nthe end of have with "
        + " ".join(f"w{i}" for i in range(60))),
    (5, "1 2 3 4 5 6 7 8 9 10 " * 10 + "the of"),  # numeric words
    (6, ""),  # empty text
    (7, " ".join(["supercalifragilisticexpialidocious"] * 60)),  # long words
]


def test_gopher_signals_match_py_twin(spark):
    df = spark.createDataFrame(DOCS, schema="doc_id int, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_quality_signals(df).collect()}
    for doc_id, text in DOCS:
        exp = _py_signals(text)
        g = got[doc_id]
        for k, v in exp.items():
            assert g[k] == v, f"doc {doc_id} {k}: engine {g[k]} != py {v}"


def test_gopher_rule_outcomes(spark):
    df = spark.createDataFrame(DOCS, schema="doc_id int, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_quality_signals(df).collect()}
    assert got[1]["pass_gopher"]  # plain prose of 72 words passes
    assert not got[2]["pass_symbol_ratio"]
    assert not got[3]["pass_bullet_lines"]
    assert not got[4]["pass_ellipsis_lines"]  # 2 of 3 lines end with ...
    assert not got[5]["pass_alpha_words"]  # numerals aren't alpha words
    assert not got[6]["pass_word_count"]  # empty page
    assert not got[7]["pass_mean_word_len"]  # 34-char words
