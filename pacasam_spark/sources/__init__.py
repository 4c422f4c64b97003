from pacasam_spark.sources.synthetic import synthetic_catalogue  # noqa: F401
