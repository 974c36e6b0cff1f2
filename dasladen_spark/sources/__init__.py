"""Source readers (SURVEY §2.1): CSV, XML, XLS, JDBC, parquet."""

from dasladen_spark.sources.csv import read_csv  # noqa: F401
from dasladen_spark.sources.xml import read_xml  # noqa: F401
from dasladen_spark.sources.xls import read_xls  # noqa: F401
