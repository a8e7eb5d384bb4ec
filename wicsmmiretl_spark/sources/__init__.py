from wicsmmiretl_spark.sources.io import (
    read_caption_list,
    read_csv,
    read_json_flat,
    read_parquet,
    write_parquet,
    write_csv_projection,
)

__all__ = [
    "read_caption_list",
    "read_csv",
    "read_json_flat",
    "read_parquet",
    "write_parquet",
    "write_csv_projection",
]
