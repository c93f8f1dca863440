"""panako_spark — a from-scratch PySpark-native near-duplicate detection and
clustering engine for image + caption pairs, with the query and matching
semantics of JorenSix/Panako (reference at /root/reference, studied not
ported).

Layout
------
config        frozen pipeline configuration (defaults mirror the reference's
              Key.java parameter style: /root/reference/src/main/java/be/
              panako/util/Key.java:43-439)
kernels/      pure-NumPy single-node kernels (codec, spectral peaks,
              landmark hashes, MinHash, SimHash, suffix array, verifier).
              These are also the single-node "reference-semantics matcher"
              used to produce golden outputs for parity tests.
stages/       Spark pipeline stages (extract, candidates, verify, cluster)
operators/    reusable Spark operators (dedup family, ANN, connected comps)
functions/    column-level helpers (text analysis, quality, token stats)
io/           checkpoint + lineage (Iceberg when available, parquet-dir +
              atomic manifest fallback)
data/         deterministic synthetic fixture generation (FIXTURES.md)
"""

from panako_spark.config import PanakoConfig, DEFAULT_CONFIG

__all__ = ["PanakoConfig", "DEFAULT_CONFIG"]
__version__ = "0.1.0"
