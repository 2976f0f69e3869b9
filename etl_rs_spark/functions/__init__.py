from etl_rs_spark.functions import strings, transforms  # noqa: F401
