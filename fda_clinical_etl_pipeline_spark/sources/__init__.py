from .readers import (  # noqa: F401
    load_tables,
    read_csv_strings,
    read_jsonl,
    read_hl7,
    read_parquet,
    read_binary_files,
    TESTDATA_TABLES,
)
