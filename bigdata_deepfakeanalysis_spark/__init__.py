"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference deepfake-analysis pipeline (see SURVEY.md).

Architecture (SURVEY.md §7): composable DataFrame -> DataFrame operators.
Catalyst is the IR — no custom plan layer. Modules:

- ``session``    — tuned SparkSession factory (AQE, Arrow, shuffle sizing)
- ``catalog``    — loaders for the driver's parquet tables
- ``registry``   — query + DuckDB-oracle registration (driver contract)
- ``operators``  — relational / sampling / grouping / array / join / dedup /
                   similarity / text operators
- ``ml``         — MLlib-backed ops (PCA, separability CV, CKA, t-SNE wrapper)
- ``sources``    — image-catalog scan + surrogate featurizer (UDF surface)
- ``streaming``  — Structured Streaming layer over the ``events`` surface
- ``multimodal`` — binary-column (image/audio/video) plumbing with stub decode
"""

__version__ = "0.1.0"
