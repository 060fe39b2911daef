from csvb_spark.sources.catalog import TABLES, load_tables, register_views  # noqa: F401
from csvb_spark.sources.csv_source import add_direct_table  # noqa: F401
