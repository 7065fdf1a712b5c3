"""gfwspark — a from-scratch PySpark-native feature-engineering engine.

Re-expresses the query / data-processing capabilities of the reference
(GlobalFishingWatch/vessel-classification, studied in SURVEY.md) as an
idiomatic Spark DataFrame engine:

- per-entity time-sorted layout (repartitionByRange + sortWithinPartitions,
  the Spark analog of the reference's file-per-vessel sorted tfrecords,
  cf. classification/feature_generation/feature_utilities.py:405-407)
- backward-only point-in-time / as-of joins (cf.
  classification/feature_generation/fishing_feature_generation.py:52-68)
- windowed featurization: backfill, lag/lead, sliding fixed-count,
  fixed-duration, month-grid windows (cf. feature_utilities.py:26-460)
- gap-based sessionization (cf. classification/classification/objectives.py:340-380)
- relational layer: aggregations, ranking, dedup-with-priority, splits
  (cf. train/create_train_info.py, classification/metrics/*)
- training-data ops at scale: dedup (exact/minhash/simhash/jaccard),
  similarity search, text analysis, multimodal payload plumbing

Everything is DataFrame/Window/pandas-Arrow-UDF based; no per-row Python
UDFs, no RDDs.
"""

__version__ = "0.1.0"
