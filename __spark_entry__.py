"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (canonicalize → SURT queue keys →
disposition classification → per-queue frontier counters) on the
sf0.001 tables.

``queries()`` / ``oracle_sql()`` — the registry lives in
``heritrix_spark/driverq.py``: each crawl operator from SURVEY.md §2
runs as native Spark Column expressions and is checked against a
DuckDB SQL twin over the same parquet tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from heritrix_spark.driverq import ORACLE_SQL, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["frontier_counters"](spark, "/root/testdata/sf0.001")


# Rows earlier driver rounds already value-verified (CORRECTNESS_r03
# covered the first 50 registrations; CORRECTNESS_r04 covered the next
# 50). The driver caps its per-round check at 50 rows, so rotation puts
# the rows it has NOT yet reached first — over successive rounds every
# registry row gets driver-side verification, not just the same leading
# 50. After the r4 rotation only 7 rows remain unseen by any driver
# round (arc_metalines, corpus_datacard, crawl_log_lines,
# decontaminate_removal, host_overlay_delay, kw3_files,
# text_badword_docs); this set makes them register first.
_DRIVER_VERIFIED = frozenset({
    # r1–r3 driver rounds
    "canonicalize", "canonicalize_custom", "surt", "class_key_counts",
    "seen_dedup", "cuckoo_seen_dedup", "queue_order_heads",
    "politeness_delay", "robots_allows", "hop_counts",
    "scheduling_directive", "disposition", "frontier_counters",
    "top_queues", "budget_retirement", "exact_dedup_docs",
    "minhash_lsh_pairs", "ngram_jaccard", "neardup_components",
    "pagerank", "simhash_clusters", "cosine_topk", "text_stats",
    "doc_fingerprint", "corpus_split", "corpus_sample_fixed",
    "source_cap_sample", "token_topk", "training_corpus",
    "events_windowed", "events_sessionized", "crawl_rounds",
    "seeds_report", "source_host_tally", "extract_outlinks",
    "queue_precedence", "uuri_fixup", "assignment_level_key",
    "substats_tally", "crawled_bytes", "cost_policies", "implied_uris",
    "content_digest", "scope_decisions", "journal_import",
    "action_directory", "recovery_seed_map", "salted_counts",
    "doc_extract", "swf_extract",
    # r4 driver round (CORRECTNESS_r04.json)
    "adaptive_revisit", "congestion_report", "consistent_subqueues",
    "cross_doc_ngram_dup", "css_extract", "decontaminate_ngram",
    "delete_uris", "domain_max_docs", "embedding_neardup_pairs",
    "fetch_history_revisits", "frontier_journal", "gopher_quality",
    "gopher_repetition", "hash_mapper", "hashed_classifier_score",
    "host_quotas", "html_extract", "http_header_links",
    "ip_queue_assignment", "ivf_topk", "jericho_forms", "js_extract",
    "lexical_mapper", "line_dedup", "mirror_paths",
    "multimodal_features", "pack_sequences", "persist_continuation",
    "pii_redaction", "precedence_histogram", "queue_depths", "rabin_fp",
    "resource_rules", "revisit_peek", "robots_policies",
    "scope_named_rules", "simhash_neardup_pairs", "source_mixture",
    "stateful_seen_dedup", "streaming_ingest",
    "streaming_windowed_metrics", "unigram_logprob",
    "universal_extract", "uri_extract", "url_filter", "uuri_fixup_idn",
    "video_frame_sample", "warc_records", "warc_roundtrip",
    "xml_extract",
})


def _rotated(d: dict) -> dict:
    out = {k: v for k, v in d.items() if k not in _DRIVER_VERIFIED}
    out.update((k, v) for k, v in d.items() if k in _DRIVER_VERIFIED)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _rotated(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _rotated(ORACLE_SQL)
