"""LLM-data-pipeline operators (beyond the reference surface).

The reference only ships LLM *service* readers (llama.cpp / OpenAI
completion+embedding, intake/readers/readers.py:583-833). This package adds
the data-side operators a 100 TB training-data pipeline needs, each designed
Spark-first:

- :mod:`intake_spark.llm.text` — tokenization, quality scoring, language-ID,
  fingerprinting (all JVM-side ``pyspark.sql.functions``; no Python UDFs).
- :mod:`intake_spark.llm.dedup` — exact, MinHash+LSH, SimHash, n-gram
  Jaccard dedup.
- :mod:`intake_spark.llm.similarity` — brute-force and LSH-bucketed cosine
  ANN over embedding columns.
- :mod:`intake_spark.llm.multimodal` — opaque-binary media columns with
  typed metadata and Arrow-batched decode plumbing; PNG and WAV decode are
  real (stdlib codecs), other formats gate on PIL/librosa.
- :mod:`intake_spark.llm.sampling` — deterministic hash-keyed sampling,
  train/val/test splits and weighted source mixing (reproducible under any
  partitioning, unlike ``df.sample``).
- :mod:`intake_spark.llm.sketches` — deterministic KMV distinct-count
  sketch (engine-portable estimates, mergeable min-k).
- :mod:`intake_spark.llm.bpe` — distributed BPE tokenizer training on the
  word-frequency table (vocab-sized merge rounds) + broadcast tokenization.
- :mod:`intake_spark.llm.assembly` / :mod:`intake_spark.llm.graph` —
  decontamination, sequence packing, near-dup-graph PageRank.
"""
