"""Marketing domain integration (FIXTURES.md §4 — the reference's
`test/schema/Marketing.scala:27-37`): nested name structs, an ad-class
enum, Option fields (nullable year), click timestamps — joined and
aggregated the way BaseCodegenIntegrationSpec drives them."""

from __future__ import annotations

import dataclasses
import datetime
import enum
import typing

import pyspark.sql.functions as F
import pytest

from emma_spark.core import DataBag
from emma_spark.sources import io


class AdClass(enum.Enum):
    SERVICES = "SERVICES"
    FASHION = "FASHION"
    GAMES = "GAMES"
    TECH = "TECH"


@dataclasses.dataclass
class Ad:
    id: int
    name: str
    cls: AdClass


@dataclasses.dataclass
class Name:
    first: str
    last: str


@dataclasses.dataclass
class User:
    id: int
    name: Name
    password: str


@dataclasses.dataclass
class Click:
    adID: int
    userID: int
    time: datetime.datetime


@dataclasses.dataclass
class Movie:
    """imdb/model.scala nullable coverage: Option[Short] year."""

    id: int
    title: str
    year: typing.Optional[int]


_T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
_ADS = [Ad(1, "a1", AdClass.GAMES), Ad(2, "a2", AdClass.TECH), Ad(3, "a3", AdClass.GAMES)]
_USERS = [
    User(10, Name("Ada", "L"), "pw1"),
    User(11, Name("Max", "P"), "pw2"),
]
_CLICKS = [
    Click(1, 10, _T0),
    Click(1, 11, _T0 + datetime.timedelta(minutes=5)),
    Click(2, 10, _T0 + datetime.timedelta(hours=1)),
    Click(3, 11, _T0 + datetime.timedelta(hours=2)),
    Click(3, 10, _T0 + datetime.timedelta(hours=2, minutes=1)),
]


def test_schema_of_derives_nested_struct_and_enum():
    s = io.schema_of(User)
    assert s["name"].dataType.simpleString() == "struct<first:string,last:string>"
    a = io.schema_of(Ad)
    assert a["cls"].dataType.simpleString() == "string"  # Enum by NAME
    m = io.schema_of(Movie)
    assert m["year"].nullable


def test_clicks_per_ad_class_join(spark):
    """clicks x ads -> per-class counts + distinct users (the
    reference's join + foldGroup over Marketing)."""
    ads = spark.createDataFrame([(a.id, a.name, a.cls.value) for a in _ADS], io.schema_of(Ad))
    clicks = spark.createDataFrame(
        [(c.adID, c.userID, c.time) for c in _CLICKS], io.schema_of(Click)
    )
    per_class = (
        DataBag(clicks)
        .equi_join(DataBag(ads), "adID", "id")
        .df.groupBy("cls")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.countDistinct("userID").alias("n_users"),
        )
    )
    got = {r["cls"]: (r["n_clicks"], r["n_users"]) for r in per_class.collect()}
    assert got == {"GAMES": (4, 2), "TECH": (1, 1)}


def test_nested_name_field_access_and_option(spark):
    users = spark.createDataFrame(
        [(u.id, (u.name.first, u.name.last), u.password) for u in _USERS],
        io.schema_of(User),
    )
    movies = spark.createDataFrame(
        [(1, "Old", None), (2, "New", 1999)], io.schema_of(Movie)
    )
    # nested field projection stays a Column path (no UDF)
    full = users.select(
        "id", F.concat_ws(" ", F.col("name.first"), F.col("name.last")).alias("full")
    )
    assert {(r["id"], r["full"]) for r in full.collect()} == {
        (10, "Ada L"), (11, "Max P")
    }
    # Option[Short] semantics: None survives round-trip, filters as SQL NULL
    assert movies.filter(F.col("year").isNull()).count() == 1
    assert movies.filter(F.col("year") > 1990).count() == 1


def test_click_sessions_window(spark):
    """per-user click ordering (lag) over the timestamp column —
    Marketing's time field driven through a window."""
    from pyspark.sql import Window

    clicks = spark.createDataFrame(
        [(c.adID, c.userID, c.time) for c in _CLICKS], io.schema_of(Click)
    )
    w = Window.partitionBy("userID").orderBy("time")
    gaps = clicks.withColumn(
        "gap_min",
        (F.col("time").cast("long") - F.lag("time").over(w).cast("long")) / 60,
    )
    got = sorted(
        (r["userID"], r["gap_min"]) for r in gaps.filter(F.col("gap_min").isNotNull()).collect()
    )
    assert got == [(10, 60.0), (10, 61.0), (11, 115.0)]
