"""Cinema + Literature domain integration (FIXTURES.md §1/§5): the
reference's own test schemas (`test/schema/Movies.scala:20-24`,
`test/schema/Literature.scala:20-24`) driven through the engine's CSV
IO, composite-key joins, and fold-group aggregation — the
BaseCodegenIntegrationSpec shapes (:241-372) as pytest."""

from __future__ import annotations

import dataclasses

import pyspark.sql.functions as F
import pytest

from emma_spark.core import DataBag
from emma_spark.sources import io


@dataclasses.dataclass
class ImdbMovie:
    title: str
    rating: float
    rank: int
    link: str
    year: int


@dataclasses.dataclass
class FilmFestWinner:
    year: int
    title: str
    director: str
    country: str


_MOVIES = [
    ImdbMovie("The Tall Man", 8.6, 1, "m1", 1979),
    ImdbMovie("Short Story", 7.1, 2, "m2", 1979),
    ImdbMovie("Wide River", 9.0, 3, "m3", 1984),
    ImdbMovie("Night Train", 6.5, 4, "m4", 1991),
    ImdbMovie("Day Bus", 6.9, 5, "m5", 1991),
    ImdbMovie("Lone Hill", 8.1, 6, "m6", 2003),
]
_CANNES = [
    FilmFestWinner(1979, "The Tall Man", "R. Lee", "US"),
    FilmFestWinner(1984, "Wide River", "A. Chen", "CN"),
    FilmFestWinner(1991, "Missing Movie", "B. Obi", "NG"),
]
_BERLIN = [
    FilmFestWinner(1991, "Night Train", "C. Faye", "FR"),
    FilmFestWinner(2003, "Lone Hill", "D. Kim", "KR"),
]


@pytest.fixture(scope="module")
def cinema(spark, tmp_path_factory):
    """Write the cinema CSVs through engine IO and read them back typed
    (the reference reads test/resources/cinema/*.csv the same way)."""
    root = tmp_path_factory.mktemp("cinema")
    out = {}
    for name, rows, cls in [
        ("imdb", _MOVIES, ImdbMovie),
        ("cannes", _CANNES, FilmFestWinner),
        ("berlin", _BERLIN, FilmFestWinner),
    ]:
        p = str(root / name)
        DataBag(
            spark.createDataFrame(
                [dataclasses.astuple(r) for r in rows], io.schema_of(cls)
            )
        ).write_csv(p)
        out[name] = io.read_csv(spark, p, schema=cls)
    return out


def test_csv_roundtrip_preserves_types_and_rows(cinema):
    got = sorted(
        (r["title"], r["rating"], r["rank"], r["year"])
        for r in cinema["imdb"].collect()
    )
    want = sorted((m.title, m.rating, m.rank, m.year) for m in _MOVIES)
    assert got == want


def test_composite_key_join_movies_winners(cinema):
    """join movies x winners on the (title, year) composite key —
    BaseCodegenIntegrationSpec's representative join."""
    winners = cinema["cannes"].union(cinema["berlin"])
    j = cinema["imdb"].equi_join(winners, ["title", "year"], pair=True)
    got = sorted((r["_1"]["title"], r["_2"]["director"]) for r in j.collect())
    assert got == [
        ("Lone Hill", "D. Kim"),
        ("Night Train", "C. Faye"),
        ("The Tall Man", "R. Lee"),
        ("Wide River", "A. Chen"),
    ]
    # the 1991 cannes winner has no imdb row: inner join drops it
    assert len(got) == 4


def test_per_decade_fold_group_multi_aggregate(cinema, duck):
    """per-decade groupBy(year/10) with fused count/avg/min/max —
    the foldGroup fusion shape, value-checked against DuckDB."""
    decades = (
        cinema["imdb"]
        .df.groupBy((F.col("year") - F.col("year") % 10).alias("decade"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.floor(F.col("rating") * 10 + F.lit(0.5))) / F.count(F.lit(1)) / 10).alias("avg_r"),
            F.min("rating").alias("min_r"),
            F.max("rating").alias("max_r"),
        )
    )
    got = {
        r["decade"]: (r["n"], round(r["avg_r"], 4), r["min_r"], r["max_r"])
        for r in decades.collect()
    }
    duck.execute("CREATE OR REPLACE TABLE m(title VARCHAR, rating DOUBLE, rank INT, year INT)")
    duck.executemany(
        "INSERT INTO m VALUES (?, ?, ?, ?)",
        [(x.title, x.rating, x.rank, x.year) for x in _MOVIES],
    )
    want = {
        d: (n, round(a, 4), lo, hi)
        for d, n, a, lo, hi in duck.execute(
            """SELECT year - year % 10, count(*),
                      sum(floor(rating * 10 + 0.5)) / count(*) / 10,
                      min(rating), max(rating)
               FROM m GROUP BY 1"""
        ).fetchall()
    }
    assert got == want


@dataclasses.dataclass
class Book:
    title: str
    author: str


def test_literature_nested_struct_column(spark):
    """Literature.scala: `character.book` is a nested case-class column —
    struct round-trip + join on whole-struct equality."""
    books = spark.createDataFrame(
        [("Moby Dick", "Melville"), ("Emma", "Austen")], "title string, author string"
    ).select(F.struct("title", "author").alias("book"))
    chars = spark.createDataFrame(
        [
            ("Ishmael", "Moby Dick", "Melville"),
            ("Ahab", "Moby Dick", "Melville"),
            ("Emma Woodhouse", "Emma", "Austen"),
        ],
        "name string, btitle string, bauthor string",
    ).select(
        "name", F.struct(F.col("btitle").alias("title"), F.col("bauthor").alias("author")).alias("book")
    )
    j = chars.join(books, chars["book"] == books["book"]).select("name", chars["book.title"].alias("t"))
    got = sorted((r["name"], r["t"]) for r in j.collect())
    assert got == [
        ("Ahab", "Moby Dick"),
        ("Emma Woodhouse", "Emma"),
        ("Ishmael", "Moby Dick"),
    ]
