"""Control plane: token extraction, ban registry, error taxonomy, txn
ids, access log (SURVEY §2.5 C1-C7)."""

from catalyst_spark.control.errors import classify_error, classify_error_col
from catalyst_spark.control.access_log import AccessLog, AccessLogListener
from catalyst_spark.control.auth import (
    BanRegistry,
    extract_token,
    filter_banned,
    txn_id,
    txn_id_col,
)

__all__ = [
    "AccessLog",
    "AccessLogListener",
    "classify_error",
    "classify_error_col",
    "BanRegistry",
    "extract_token",
    "filter_banned",
    "txn_id",
    "txn_id_col",
]
