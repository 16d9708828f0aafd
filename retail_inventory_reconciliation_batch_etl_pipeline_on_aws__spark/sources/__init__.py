from .readers import read_csv, read_parquet, read_partition  # noqa: F401
from .writers import write_partitioned, write_single_file  # noqa: F401
