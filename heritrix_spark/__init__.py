"""heritrix_spark — a PySpark-native URL-frontier / crawl-scheduler engine.

A from-scratch re-expression of the data-processing semantics of the
Heritrix crawler's frontier core (reference: yuanfayang/heritrix,
``heritrix3/engine/.../frontier/*``) as a batch-iterative Spark
DataFrame program over snapshot-committed parquet tables:

- URL canonicalization / SURT transforms as native Catalyst column
  expressions (``functions/``),
- URL-seen membership as a hash-partitioned exact anti-join with a
  bloom prefilter sidecar (``operators/seen.py``),
- per-host priority queues as window-ranked (directive, precedence,
  ordinal) tuples (``operators/prepare.py``, ``plans/round.py``),
- politeness / robots / budgets as pure column-expression state
  transitions (``operators/politeness.py``, ``operators/budget.py``),
- checkpoint/resume via an atomic round-manifest commit protocol
  (``store/snapstore.py``),
- a pure-Python reference simulator used as the correctness oracle
  (``oracle/simulator.py``).

Nothing here ports reference code; the reference defines *what* is
computed (ordering law, seen-set semantics, politeness formulas), all
cited by file:line in docstrings.
"""

__version__ = "0.1.0"
