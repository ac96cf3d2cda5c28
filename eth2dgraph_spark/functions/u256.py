"""U256 arithmetic over decimal-string columns (SURVEY.md §1.3, §7 hard
part (a)).

Canonical form is the decimal string (src/models/transaction.rs:382 — U256
serialized as string). Decimal(38,0) holds only ~2^126, so:

  - `to_decimal38`: best-effort numeric companion + overflow flag, pure
    column expressions — right for filters/joins/approximate totals.
  - `sum_u256`: EXACT distributed sum via Python-int partial aggregation:
    grouped -> applyInPandas per group (group rows stream through Arrow
    batches, ints are arbitrary precision); global -> mapInPandas partials
    (one short row per Arrow batch, no shuffle of the data) + a final
    combine over the tiny partials frame. Both scale: the wide table is
    read once, only partial sums move.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC38_MAX = 10**38 - 1


def _parse_u256(v: str) -> int:
    """Parse the canonical U256 string forms: decimal, or the raw 0x-hex
    word the transfer decoder falls back to for values >= 10^38 (the
    documented `value_overflow` contract). Exact either way — Python ints
    are arbitrary precision."""
    return int(v, 16) if v.startswith("0x") else int(v)


def to_decimal38(col, flag_col_overflow: bool = True):
    """(decimal_value, overflow) for a U256 string column. Values longer
    than 38 digits — including the raw 0x-hex overflow form, which is
    explicitly recognized — overflow Decimal(38,0) and come back null +
    flagged."""
    is_hex = col.startswith("0x")
    s = F.regexp_replace(col, "^0+(?=.)", "")  # strip leading zeros
    overflow = is_hex | (F.length(s) > 38)
    dec = F.when(~overflow, s.cast("decimal(38,0)"))
    return (dec, overflow) if flag_col_overflow else dec


def wei_to_eth(col):
    """Lossy double companion in ETH (reference divides Gwei similarly,
    src/models/block.rs:40)."""
    return col.cast("double") / F.lit(1e18)


def sum_u256(df: DataFrame, value_col: str, group_cols: list[str] | None = None) -> DataFrame:
    """Exact sum of a decimal-string U256 column, optionally per group.
    Returns group cols + `sum` (decimal string)."""
    if group_cols:
        fields = ", ".join(
            f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols
        )
        out_schema = f"{fields}, sum string"

        def agg(pdf: pd.DataFrame) -> pd.DataFrame:
            total = sum(_parse_u256(v) for v in pdf[value_col] if v is not None)
            head = pdf.iloc[:1][group_cols].copy()
            head["sum"] = str(total)
            return head

        return df.groupBy(*group_cols).applyInPandas(agg, schema=out_schema)

    # global: per-Arrow-batch partials, then combine the (tiny) partials
    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            total = sum(_parse_u256(v) for v in pdf[value_col] if v is not None)
            yield pd.DataFrame({"partial": [str(total)]})

    partial_df = df.select(value_col).mapInPandas(partials, schema="partial string")

    def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        total = 0
        for pdf in batches:
            total += sum(int(v) for v in pdf["partial"])
        yield pd.DataFrame({"sum": [str(total)]})

    # coalesce(1) over the partials only — one short row per upstream batch
    return partial_df.coalesce(1).mapInPandas(combine, schema="sum string")
