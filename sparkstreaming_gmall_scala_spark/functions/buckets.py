"""P4/P5 — the reference's exact age-bucket and gender-decode CASE chains.

Reference: dim/UserInfoApp.scala:44-61 — age is computed as
``(now_ms - birthday_ms) / (1000*60*60*24*365)`` (integer years, 365-day
year, no leap handling) and bucketed ``if (age < 20)`` → "20岁以下",
``else if (age > 30)`` → "30岁以上", else "21岁到30岁" (so EXACTLY age 20
lands in the middle bucket); gender "M" → "男" else "女". The CN label
bytes are part of observable output and preserved exactly
(SURVEY.md §7.4.5).

The reference buckets against *current* time; for deterministic tests and
oracles the as-of instant is an explicit parameter.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

AGE_LT20 = "20岁以下"
AGE_21_30 = "21岁到30岁"
AGE_GT30 = "30岁以上"
GENDER_M = "男"
GENDER_F = "女"


def age_years(birthday: Column, as_of: Column) -> Column:
    """Whole years via 365-day millisecond arithmetic — the reference's
    formula (dim/UserInfoApp.scala:45-49), reproduced exactly rather than
    replaced with calendar-aware datediff: the two disagree around leap
    days and that difference is observable in bucket boundaries."""
    ms = as_of.cast("timestamp").cast("double") - birthday.cast(
        "timestamp"
    ).cast("double")
    return F.floor(ms / (60 * 60 * 24 * 365)).cast("long")


def age_bucket_cn(birthday: Column, as_of: Column) -> Column:
    """dim/UserInfoApp.scala:50-56: ``if (age < 20) … else if (age > 30)
    … else`` — strict comparisons, reproduced exactly: age 20 and 30 both
    fall in the middle bucket."""
    age = age_years(birthday, as_of)
    return (
        F.when(age < 20, AGE_LT20)
        .when(age > 30, AGE_GT30)
        .otherwise(AGE_21_30)
    )


def gender_cn(gender: Column) -> Column:
    """dim/UserInfoApp.scala:57-61: "M" → 男, anything else → 女."""
    return F.when(gender == "M", GENDER_M).otherwise(GENDER_F)
