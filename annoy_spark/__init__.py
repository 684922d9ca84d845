"""annoy_spark — a PySpark-native near-duplicate detection & clustering engine.

Re-expresses the capabilities of spotify/annoy (random-hyperplane angular LSH
k-NN, /root/reference/src/annoylib.h) as a Spark-first pipeline over tables of
source-code files / documents:

- SimHash bit signatures     (angular LSH analog, annoylib.h:467-510)
- MinHash + banded LSH       (forest-of-trees candidate generation analog,
                              annoylib.h:1447-1504)
- exact verification         (exact re-rank semantics, annoylib.h:1492-1494)
- connected-components       (cluster assignment; new relative to the reference)
- suffix-array substring     (exact long-substring duplicates)
- brute-force / LSH k-NN     (get_nns_by_vector/_by_item, annoylib.h:1228-1236)

Everything is DataFrame-declarative (Catalyst-optimized) with vectorized
pandas/Arrow UDFs on the hot paths — zero per-row Python.
"""

from annoy_spark.config import DedupConfig

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
