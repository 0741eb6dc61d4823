from cdc_tools_spark.functions.hashing import (
    change_key,
    sha256_hex,
    sha256_hex_pandas,
)

__all__ = ["change_key", "sha256_hex", "sha256_hex_pandas"]
