"""Rule-driven alert classification (SURVEY.md §2.9 T1, §2.3 P11-P12).

The reference hard-codes its anomaly rules in one Flink SQL statement
(reference flink-jobs/flink_job_alert_detection_simple.py:62-82):
first-match-wins CASE over HIGH_VALUE_ORDER / SUSPICIOUS_QUANTITY /
NEGATIVE_PRICE / INVALID_QUANTITY, then a disjunctive WHERE. Here the
rule set is data — an ordered list of (name, condition) — compiled to
one chained `when` expression plus the OR of all conditions, so the same
rules run identically in batch and Structured Streaming (the expression
is stateless, hence trivially streamable).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class AlertRule:
    name: str
    condition: Column


def classify_alerts(
    df: DataFrame,
    rules: list[AlertRule],
    *,
    alert_col: str = "alert_type",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """First-match-wins classification; rows matching no rule are
    dropped (the reference's WHERE clause)."""
    if not rules:
        raise ValueError("need at least one alert rule")
    expr = F.when(rules[0].condition, F.lit(rules[0].name))
    any_match = rules[0].condition
    for rule in rules[1:]:
        expr = expr.when(rule.condition, F.lit(rule.name))
        any_match = any_match | rule.condition
    out = df.where(any_match).withColumn(alert_col, expr)
    if keep_cols is not None:
        out = out.select(alert_col, *keep_cols)
    return out


def reference_order_rules(
    *, total: str = "total", quantity: str = "quantity", price: str = "price"
) -> list[AlertRule]:
    """The reference's exact four rules, re-parameterized
    (flink_job_alert_detection_simple.py:64-71; thresholds relative to
    its e-commerce value ranges)."""
    return [
        AlertRule("HIGH_VALUE_ORDER", F.col(total) > 10000),
        AlertRule("SUSPICIOUS_QUANTITY", F.col(quantity) > 50),
        AlertRule("NEGATIVE_PRICE", F.col(price) < 0),
        AlertRule("INVALID_QUANTITY", F.col(quantity) <= 0),
    ]


def rules_from_config(config: list[dict]) -> list[AlertRule]:
    """Fully declarative rule loading: each entry is
    {"name": ..., "condition": "<SQL boolean expr>"} — conditions are
    parsed with F.expr so a rule table can live in JSON/YAML/a control
    table instead of code. Order in the list IS match priority."""
    return [
        AlertRule(entry["name"], F.expr(entry["condition"]))
        for entry in config
    ]
