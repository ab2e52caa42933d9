"""Alert-consumer enrichment tail (reference §3.2, M4 pipeline shape).

The reference consumes AttackResult alerts and formats them into an LLM
prompt (code/lambdas/invoke_agent/summarization.py:17-28: ISO timestamps
via fromtimestamp, :.2f/:.1f rounding, duration seconds), sanitizes
phrasing (action_group.py:30-32), calls Bedrock with retries, parses the
{incident_report, severity, ip_address} JSON (action_group.py:59-98),
and notifies for severity >= 2. Here the prompt/parse/gate stages are
engine operators; the model call is a pluggable client function — the
engine ships the orchestration, not the LLM.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.json_repair import repair_json_str
from . import sinks

# summarization.py:17-28 field layout, re-expressed as a column template
PROMPT_TEMPLATE = (
    "Network anomaly detected.\n"
    "Attack start time: %s\n"
    "Attack end time: %s\n"
    "Source IP: %s\n"
    "Target IP: %s\n"
    "Fragment count: %d\n"
    "Average packets: %.2f\n"
    "Average fragment size: %.2f\n"
    "Size reduction: %.1f%%\n"
    "Duration: %.1f seconds"
)


def _iso(sec_col: Column) -> Column:
    # epoch-second double -> ISO-ish timestamp string (P13)
    return F.date_format(
        F.timestamp_micros((sec_col * 1_000_000).cast("long")),
        "yyyy-MM-dd'T'HH:mm:ss",
    )


def format_alert_prompt(alerts: DataFrame, out_col: str = "prompt") -> DataFrame:
    """P11/P13/P14: alert record -> prompt text, all JVM expressions.

    Uses 'Source IP' phrasing directly — the reference generates
    'Attacker IP' then regex-replaces it for the LLM
    (action_group.py:30-32); we emit the sanitized form.
    """
    duration = F.col("attack_end_time") - F.col("attack_start_time")
    prompt = F.format_string(
        PROMPT_TEMPLATE,
        _iso(F.col("attack_start_time")),
        _iso(F.col("attack_end_time")),
        F.col("attacker_id"),
        F.col("target_ip"),
        F.col("fragment_count"),
        F.col("avg_packets"),
        F.col("avg_fragment_size"),
        F.col("size_reduction_percent"),
        duration,
    )
    return alerts.withColumn(out_col, prompt)


def parse_report(raw: str | None) -> dict | None:
    """LLM output -> {incident_report, severity, ip_address} dict, via the
    P18 repair pass; None when unusable (the reference falls back to
    substring extraction — action_group.py:110-116 — which we inline)."""
    import json
    import re

    fixed = repair_json_str(raw)
    if fixed is not None:
        try:
            return json.loads(fixed)
        except json.JSONDecodeError:
            pass
    if raw:
        m = re.search(r"IP:\s*([0-9.]+)", raw)
        if m:
            return {"incident_report": raw, "severity": "1", "ip_address": m.group(1)}
    return None


def alert_consumer_foreach_batch(
    llm_client: Callable[[str], str],
    notify: Callable[[dict], None],
    min_severity: int = 2,
    max_attempts: int = 3,
    sleep=None,
):
    """The full §3.2 tail as one foreachBatch: format prompt -> call the
    model with W8 retries -> parse/repair -> severity gate -> notify."""
    import time as _time

    sleep = sleep or _time.sleep

    def _tail(batch: DataFrame, epoch_id: int) -> None:
        # ≤1000-record chunks, mirroring the reference's event-source
        # batch cap (code_stack.py:432-434) — never one whole collect
        for rows in sinks.iter_record_chunks(format_alert_prompt(batch)):
            for row in rows:
                raw = sinks.with_retries(
                    lambda p=row.prompt: llm_client(p),
                    max_attempts=max_attempts,
                    sleep=sleep,
                )
                report = parse_report(raw)
                if report is None:
                    continue
                try:
                    sev = int(str(report.get("severity", "0")))
                except ValueError:
                    sev = 0
                if sev >= min_severity:
                    notify(report)

    return _tail
