"""askg_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the data-processing semantics of
``maximilien/askg`` (reference at /root/reference) as a distributed
streaming pipeline over Parquet tables of Common-Crawl-style web pages
``(url, warc_ts, html, text, lang)``.

Layout:
  vocab         controlled vocabularies + keyword tables (reference src/models.py, src/scrapers.py)
  html_extract  FROZEN per-page extractor (byte-identical text target)
  classify      category / operation classifiers
  normalize     dedup keys, hashes, global-id candidates
  minhash       MinHash / LSH / SimHash primitives (numpy, vectorized)
  sources/      synthetic page corpus generator + documents.parquet adapter
  stages/       Ray Data map_batches / groupby stages
  pipelines/    end-to-end KG build (+ checkpointed runner)
  state/        per-partition manifests for checkpoint / resume
  ops/          generic large-scale data ops (dedup family, ANN, text analysis)
  oracle/       single-process reference-semantics oracle for parity tests

No module here calls ``ray.init`` — sessions are owned by the driver,
``bench.py`` and the test fixture only.
"""

__version__ = "0.1.0"
