"""Canonical schemas.

Unifies the reference's two inconsistent table shapes (SURVEY §1.2):
``lucidlink_files`` (db_duckdb.py:157-172) and the scanner's ``files``
table keyed on relative_path (scanner.py:225-244,
docs/database/BEHAVIOR.md:24-35), plus the Arrow interchange types
(db_duckdb.py:223-236) and the ES mapping fields
(elasticsearch_integration.py:43-96).
"""

from __future__ import annotations

import pyspark.sql.types as T

# The file-entry record — every parser (find -ls, tab format, API walk)
# lands on this shape; parse_find_line result, scanner.py:185-198.
FS_ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),  # sha256(relative_path)
        T.StructField("fsentry_id", T.StringType(), True),
        T.StructField("name", T.StringType(), False),
        T.StructField("relative_path", T.StringType(), False),  # logical PK
        T.StructField("filepath", T.StringType(), False),
        T.StructField("type", T.StringType(), False),  # 'file' | 'directory'
        T.StructField("size_bytes", T.LongType(), True),  # null for dirs
        T.StructField("extension", T.StringType(), True),
        T.StructField("checksum", T.StringType(), True),  # reference: always ''
        T.StructField("direct_link", T.StringType(), True),
        T.StructField("modified_time", T.TimestampType(), True),
        T.StructField("creation_time", T.TimestampType(), True),
        T.StructField("last_seen", T.TimestampType(), True),
        T.StructField("error_count", T.IntegerType(), True),
        T.StructField("last_error", T.StringType(), True),
    ]
)

# Enrichment table — direct_links.py:43-51 + the api-timestamp extension
# (tests/test_api_timestamps.py:161-170).
DIRECT_LINKS_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.StringType(), False),
        T.StructField("direct_link", T.StringType(), True),
        T.StructField("link_type", T.StringType(), True),  # 'v2' | 'v3'
        T.StructField("fsentry_id", T.StringType(), True),
        T.StructField("api_creation_time", T.TimestampType(), True),
        T.StructField("api_modified_time", T.TimestampType(), True),
        T.StructField("last_updated", T.TimestampType(), True),
    ]
)

# Multimodal asset column group (engine extension): opaque payload +
# typed metadata, carried alongside fs entries or documents.
MEDIA_ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)
