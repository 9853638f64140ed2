"""PySpark-native analytics/ETL engine.

A brand-new, idiomatic PySpark engine with the query and data-processing
capabilities of the reference `Santiago-Beltran/ecommerce-full-ETL-process`
(an e-commerce OLTP -> ETL/validation/SCD2 -> Kimball-star OLAP system),
re-expressed Spark-first: declarative DataFrame plans, Catalyst optimization,
broadcast joins for dims, partitioned parquet storage, zero Python UDFs in
hot paths.

Layout
------
- ``session``     : tuned SparkSession builder (AQE, Arrow, shuffle partitions)
- ``schemas``     : strict StructTypes for every table in the data model
- ``sources``     : readers/writers/bootstrap + seeded synthetic & dirty-data generators
- ``functions``   : scalar column-expression library (dates, text, ids)
- ``operators``   : validation rule engine, joins (semi/anti/as-of), SCD2 merge,
                    change-detect snapshot, dedup, similarity, text analysis
- ``plans``       : the ETL pipeline orchestration and analytic query catalog
- ``streaming``   : structured-streaming variants of the incremental pipeline
"""

__version__ = "0.1.0"
