from matdb_spark.functions import text, vectors, encoders  # noqa: F401
