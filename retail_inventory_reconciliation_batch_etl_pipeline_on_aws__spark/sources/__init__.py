from .readers import read_csv, read_parquet, read_partition  # noqa: F401
from .writers import (  # noqa: F401
    write_partitioned,
    write_range_sorted,
    write_single_file,
)
