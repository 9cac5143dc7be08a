from als_pyspark_spark.sources.tables import TABLES, load_table, load_tables  # noqa: F401
from als_pyspark_spark.sources.ratings import ratings, RATINGS_CTE  # noqa: F401
