from tscan_spark.functions.scalars import density, freq_log, proportion

__all__ = ["proportion", "density", "freq_log"]
