"""IP / network helpers (reference P15-P16).

The producers expand CIDR ranges to small host lists
(normal_events_producer.py:28-34 — first 50 hosts;
fragmentation_attack/lambda_handler.py:31-45 — first 10) and draw
random IPs. Here: a driver-side ``cidr_hosts`` for building literal
lookup arrays (they are tiny — broadcast-style constants), and
column-expression int<->dotted-quad conversions so large-scale batch
generation stays in JVM expressions (no UDF)."""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column
from pyspark.sql import functions as F


def cidr_hosts(cidr: str, limit: int | None = None) -> list[str]:
    """First ``limit`` host addresses of a CIDR block (driver-side)."""
    hosts = ipaddress.ip_network(cidr, strict=False).hosts()
    out = []
    for i, h in enumerate(hosts):
        if limit is not None and i >= limit:
            break
        out.append(str(h))
    return out


def ip_int_to_str(col: Column) -> Column:
    """uint32 -> dotted-quad, pure column arithmetic."""
    return F.concat_ws(
        ".",
        (col.bitwiseAND(F.lit(0xFF000000)) / F.lit(0x1000000)).cast("long").cast("string"),
        (col.bitwiseAND(F.lit(0x00FF0000)) / F.lit(0x10000)).cast("long").cast("string"),
        (col.bitwiseAND(F.lit(0x0000FF00)) / F.lit(0x100)).cast("long").cast("string"),
        col.bitwiseAND(F.lit(0x000000FF)).cast("string"),
    )


def ip_str_to_int(col: Column) -> Column:
    """dotted-quad -> uint32 (long), pure column arithmetic."""
    part = lambda i: F.split(col, "\\.").getItem(i).cast("long")  # noqa: E731
    return part(0) * 0x1000000 + part(1) * 0x10000 + part(2) * 0x100 + part(3)
