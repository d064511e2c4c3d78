"""bootleg_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the *capabilities* of
HazyResearch/bootleg (tail-aware named-entity disambiguation → entity
linking → (subj, pred, obj) triple emission) re-expressed Spark-first:

- entity / alias / type / relation stores are **broadcast dimension
  DataFrames** instead of marisa tries
  (reference: bootleg/symbols/entity_symbols.py:19-69);
- the multiprocessing pool harnesses of the reference
  (bootleg/utils/utils.py:178-216 chunking + 6 pool drivers) are
  replaced wholesale by Spark partitions + the scheduler;
- per-mention scoring is a vectorized Arrow/pandas UDF over a broadcast
  static entity-embedding matrix
  (reference: bootleg/layers/static_entity_embeddings.py:10-36,
  bootleg/tasks/ned_task.py:25-46);
- everything relational (candidate top-K, counts, quantile slices,
  dedup, triple join) is plain DataFrame/SQL so Catalyst/AQE handle
  pushdown, broadcast, and skew.

Nothing in this package is copied from the reference; file:line
citations in docstrings point at the behavior being re-implemented.
"""

__version__ = "0.1.0"

from bootleg_spark.session import get_spark  # noqa: F401
