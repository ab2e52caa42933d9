"""Engine-native synthetic event generators (reference S11-S13).

The reference has three Python/Kafka producers; each becomes a
declarative column pipeline so generation scales with the cluster (no
driver loop, no Python UDF):

- S11 normal traffic (normal-events-producer/normal_events_producer.py:36-94):
  continuous events at a fixed rate — here the Structured Streaming rate
  source plus column expressions; a batch variant uses spark.range.
- S12 fragmentation burst (code/lambdas/fragmentation_attack/
  lambda_handler.py:52-116): N events sharing one (ip_src, ip_dst), with
  packets=1, bytes∈[8,64], UDP, SQLi-flavored text.
- S13 CSV-replay with ~0.1% anomaly injection (code/lambdas/producer/
  lambda_function.py:154-254): sampled dimension rows plus a rand()<rate
  conditional rewrite, as a broadcast lookup join.

Determinism: all randomness is rand(seed)-based so tests can pin
outputs. Value pools mirror FIXTURES.md §1 / the producers' literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.net import cidr_hosts

# pools from normal_events_producer.py:20-34 and lambda_handler.py:31-45
EVENT_TYPES = ["GET", "POST", "DELETE", "PATCH", "PUT"]
ATTACK_EVENT_TYPES = ["GET", "POST", "DELETE"]
PORTS = ["53", "80", "443", "8080", "1433"]
ATTACK_SRC_PORTS = ["53", "80", "443"]
ATTACK_DST_PORTS = ["8080", "1433"]
PROTOS = ["UDP", "TCP", "ICMP"]
DST_POOLS = ("10.34.0.0/16", "10.24.25.0/24", "11.64.0.0/15")
ATTACK_POOLS = ("192.168.1.0/24", "10.0.0.0/24", "172.16.0.0/24")
SQLI_TEXT = (
    '84.55.41.57 - - [14/Apr/2023:08:22:13 0100] "GET /wordpress/wp-content/'
    "plugins/custom_plugin/check_user.php?userid=1 AND (SELECT 6810 FROM("
    'SELECT COUNT(*),CONCAT(0x7171787671,(SELECT (ELT(6810=6810,1))))x)a) '
    'HTTP/1.1" 200 166'
)
NORMAL_TEXT = '192.0.2.1 - - [10/Oct/2024:13:55:36 0000] "GET /index.html HTTP/1.1" 200 2326'


def _choice(pool: list[str], seed_col) -> F.Column:
    """Deterministic uniform pick from a small literal pool."""
    arr = F.array(*[F.lit(x) for x in pool])
    idx = (seed_col % len(pool)).cast("int") + F.lit(1)
    return F.element_at(arr, idx)


def _rand_long(seed: int) -> F.Column:
    return (F.rand(seed) * F.lit(1 << 30)).cast("long")


def _normal_columns(df: DataFrame, ts_col: F.Column, seed: int) -> DataFrame:
    """Shared projection from an (id, ts) frame to normal-traffic events
    (value ranges per normal_events_producer.py:78-91)."""
    dst_hosts = [h for cidr in DST_POOLS for h in cidr_hosts(cidr, 50)]
    r = lambda k: _rand_long(seed + k)  # noqa: E731
    ms = (ts_col.cast("double") * 1000).cast("long")
    return df.select(
        _choice(EVENT_TYPES, r(1)).alias("event_type"),
        F.concat_ws(
            ".",
            (r(2) % 223 + 1).cast("string"),
            (r(3) % 256).cast("string"),
            (r(4) % 256).cast("string"),
            (r(5) % 254 + 1).cast("string"),
        ).alias("ip_src"),
        _choice(dst_hosts, r(6)).alias("ip_dst"),
        _choice(PORTS, r(7)).alias("port_src"),
        _choice(PORTS, r(8)).alias("port_dst"),
        _choice(PROTOS, r(9)).alias("ip_proto"),
        (ms - 10).alias("timestamp_start"),
        ms.alias("timestamp_end"),
        F.timestamp_micros((ms - 10) * 1000).alias("event_time"),
        F.timestamp_micros(ms * 1000).alias("event_time_end"),
        (r(10) % 401 + 100).alias("packets"),  # uniform [100,500]
        (r(11) % 1437 + 64).alias("bytes"),  # uniform [64,1500]
        F.concat(F.lit("ENI-"), F.md5(r(12).cast("string")).substr(1, 8)).alias(
            "writer_id"
        ),
        F.lit(NORMAL_TEXT).alias("text"),
    )


def normal_traffic_stream(
    spark: SparkSession, rows_per_second: int = 10, seed: int = 42
) -> DataFrame:
    """S11: continuous normal traffic (reference rate: 10 ev/s via
    time.sleep(0.1) — normal_events_producer.py:93-94)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return _normal_columns(rate, F.col("timestamp"), seed)


def normal_traffic_batch(
    spark: SparkSession, n: int, start_ts: float, events_per_second: float = 10.0,
    seed: int = 42,
) -> DataFrame:
    """Batch variant of S11 for tests/benchmarks: n events spaced at the
    given rate starting at ``start_ts`` (epoch seconds)."""
    df = spark.range(n)
    ts = F.lit(start_ts) + F.col("id") / F.lit(events_per_second)
    return _normal_columns(df, ts.cast("timestamp"), seed)


def attack_burst(
    spark: SparkSession,
    n: int = 50,
    start_ts: float = 0.0,
    events_per_second: float = 100.0,
    seed: int = 7,
) -> DataFrame:
    """S12: one fragmentation burst — fixed (ip_src, ip_dst) drawn from the
    attack pools, packets=1, bytes∈[8,64], UDP, SQLi text
    (lambda_handler.py:52-116; burst size 50 per :93)."""
    src_hosts = [h for cidr in ATTACK_POOLS for h in cidr_hosts(cidr, 10)]
    # one fixed src/dst per burst: seed-pinned python choice, like the
    # lambda picking once per invocation (lambda_handler.py:60-63)
    import random

    rng = random.Random(seed)
    ip_src, ip_dst = rng.choice(src_hosts), rng.choice(src_hosts)
    df = spark.range(n)
    r = lambda k: _rand_long(seed + k)  # noqa: E731
    ts = F.lit(start_ts) + F.col("id") / F.lit(events_per_second)
    ms = (ts * 1000).cast("long")
    return df.select(
        _choice(ATTACK_EVENT_TYPES, r(1)).alias("event_type"),
        F.lit(ip_src).alias("ip_src"),
        F.lit(ip_dst).alias("ip_dst"),
        _choice(ATTACK_SRC_PORTS, r(2)).alias("port_src"),
        _choice(ATTACK_DST_PORTS, r(3)).alias("port_dst"),
        F.lit("UDP").alias("ip_proto"),
        (ms - 10).alias("timestamp_start"),
        ms.alias("timestamp_end"),
        F.timestamp_micros((ms - 10) * 1000).alias("event_time"),
        F.timestamp_micros(ms * 1000).alias("event_time_end"),
        F.lit(1).cast("long").alias("packets"),
        (r(4) % 57 + 8).alias("bytes"),  # uniform [8,64]
        F.concat(F.lit("ENI"), F.md5(r(5).cast("string")).substr(1, 8)).alias(
            "writer_id"
        ),
        F.lit(SQLI_TEXT).alias("text"),
    )


def replay_with_injection(
    spark: SparkSession,
    dim: DataFrame,
    n: int,
    start_ts: float = 0.0,
    anomaly_rate: float = 0.001,
    seed: int = 42,
) -> DataFrame:
    """S13: replay-style generation with ~anomaly_rate outlier injection
    (code/lambdas/producer/lambda_function.py:154-254; rate :201).

    ``dim`` is the (writer_id, ip) reference table the lambda samples with
    df.iloc[random_index] (J2) — here a broadcast equi-join on a random
    index, the scalable form of the same lookup.
    """
    dim_n = dim.count()
    dim_idx = dim.select(
        F.col("writer_id").alias("_w"),
        F.col("ip").alias("_ip"),
        (F.row_number().over(Window.orderBy("writer_id", "ip")) - 1).alias("_idx"),
    )
    base = normal_traffic_batch(spark, n, start_ts, seed=seed)
    base = base.withColumn("_idx", (_rand_long(seed + 100) % dim_n))
    joined = base.join(F.broadcast(dim_idx), "_idx", "left")
    is_anomaly = F.rand(seed + 200) < anomaly_rate
    return joined.select(
        "event_type",
        F.when(is_anomaly, F.lit("203.0.113.66")).otherwise(F.col("_ip")).alias("ip_src"),
        "ip_dst",
        "port_src",
        "port_dst",
        "ip_proto",
        "timestamp_start",
        "timestamp_end",
        "event_time",
        "event_time_end",
        F.when(is_anomaly, F.lit(1)).otherwise(F.col("packets")).cast("long").alias("packets"),
        F.when(is_anomaly, F.lit(32)).otherwise(F.col("bytes")).cast("long").alias("bytes"),
        F.coalesce(F.col("_w"), F.col("writer_id")).alias("writer_id"),
        F.when(is_anomaly, F.lit(SQLI_TEXT)).otherwise(F.col("text")).alias("text"),
    )
