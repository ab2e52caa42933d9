"""LLM-output JSON repair (reference P18 —
code/lambdas/agent_action_group/action_group.py:59-98).

The reference cleans Bedrock model output before json.loads: strip
markdown code fences, trim to the outermost {...} span, and escape raw
newlines inside string values. Reimplemented as (a) a pure-Python
function for foreachBatch tails and (b) a column expression chain for
in-engine use (regexp_replace + substring arithmetic, no UDF)."""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def repair_json_str(s: str | None) -> str | None:
    """Python twin used by driver-side consumers (W8 tail)."""
    if s is None:
        return None
    s = re.sub(r"```(?:json)?", "", s)
    start, end = s.find("{"), s.rfind("}")
    if start == -1 or end == -1 or end <= start:
        return None
    s = s[start : end + 1]
    # escape raw newlines that appear inside the JSON body
    return s.replace("\r\n", "\\n").replace("\n", "\\n").replace("\r", "\\n")


def repair_json_column(col: Column) -> Column:
    """Column-expression version of :func:`repair_json_str`."""
    no_fences = F.regexp_replace(col, "```(json)?", "")
    start = F.instr(no_fences, "{")
    # last '}' = length - position of first '}' in the reversed string + 1
    rev = F.reverse(no_fences)
    close_pos = F.instr(rev, "}")
    end = F.length(no_fences) - close_pos + 1
    body = F.substring(no_fences, start, (end - start + F.lit(1)))
    escaped = F.regexp_replace(body, "\r\n|\n|\r", "\\\\n")
    # close_pos > 0 matters: with no '}' at all, end = length+1 > start
    # would pass the span check and emit a truncated non-JSON body where
    # the Python twin returns None
    return F.when(
        (start > 0) & (close_pos > 0) & (end > start), escaped
    ).otherwise(F.lit(None).cast("string"))
