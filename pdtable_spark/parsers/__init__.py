"""StarTable block/column parsers — pure Python, Spark-free.

These run either on the driver (small inputs) or inside executor ``flatMap``
tasks (many files); they therefore must not touch a SparkSession.
"""
