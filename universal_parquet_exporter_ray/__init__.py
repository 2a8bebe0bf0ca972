"""universal_parquet_exporter_ray — a Ray-Data-native columnar processing engine.

A brand-new engine (NOT a port) with the query/data-processing capabilities of
the reference ``kanshuYokooSeiwa/universal-parquet-exporter`` (a SQL → pandas →
Parquet exporter, see ``/root/reference/src/export/parquet_writer.py``),
re-expressed Ray-Data-first:

- ``codecs``     — per-column lightweight compression (dictionary, RLE, FSST,
                   bit-packing, frame-of-reference, zstd fallback) with a
                   statistics-driven auto-selector.
- ``stages``     — reusable ``map_batches`` stages (encoder/verifier actor
                   pools, salting, text analysis, dedup, ANN, multimodal).
- ``sources``    — table loading helpers over Parquet (column-pruned reads).
- ``pipelines``  — composed ``ray.data.Dataset`` pipelines: the encode →
                   manifest → verify flagship, the relational operator surface,
                   and the large-scale text/dedup/similarity pipelines.
- ``state``      — manifest dataset + checkpoint/resume bookkeeping.

No module in this package calls ``ray.init()``/``ray.shutdown()``; sessions are
owned by the caller (driver, tests, bench.py).
"""

__version__ = "0.1.0"
