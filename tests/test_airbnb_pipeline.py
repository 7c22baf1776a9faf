"""End-to-end Airbnb pipeline round-trip (SURVEY §5.3): dirty CSV →
typed staging → SCD2 dims → star fact, asserting the reference's exact
cleansing semantics and SCD2/fact invariants."""

from __future__ import annotations

import decimal

import pytest
from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.plans import airbnb_pipeline as P

LISTINGS_HEADER = (
    "id,host_id,scrape_id,last_scraped,host_since,host_name,host_location,"
    "host_response_time,host_is_superhost,host_has_profile_pic,"
    "host_identity_verified,host_listings_count,latitude,longitude,name,"
    "property_type,room_type,accommodates,price,bathrooms,bedrooms,beds,"
    "minimum_nights,maximum_nights,has_availability,availability_365,"
    "number_of_reviews,review_scores_rating,instant_bookable,first_review,last_review"
)

LISTINGS_ROWS = [
    # clean row
    '1,101,9001,2025-01-01T00:00:00,2019-05-01,Alice,"Lisbon, PT",within an hour ,t,t,t,3,'
    '38.716900,-9.139300,"Cosy flat, center",Apartment,Entire home/apt,2,"$1,234.56",1.5,1,2,'
    "2,30,t,120,45,4.85,f,2020-01-01,2024-12-01",
    # dirty: negative counts, empty bool, null price, null name, same coords as row 1
    '2,102,9001,2025-01-01T00:00:00,2020-03-02,,,"",f,,-1,-5,'
    "38.716900,-9.139300,,House,Private room,-2,,,-1,1,"
    "8,60,,200,0,,T,,",
    # multiline quoted name + different coords; uppercase TRUE bool
    '3,101,9001,2025-01-01T00:00:00,2019-05-01,Alice,"Lisbon, PT",within an hour ,TRUE,t,t,3,'
    '41.157900,-8.629100,"Loft with\nriver view",Loft,Entire home/apt,4,"$85.00",1.0,2,3,'
    "35,90,t,300,12,4.50,t,2021-06-01,2024-11-15",
    # null coords (must be excluded from dim_location), null host_id -> host dropped
    '4,,9001,2025-01-01T00:00:00,,,,,f,f,f,0,'
    ",,No-coords,House,Shared room,1,$50.00,1.0,1,1,"
    "1,7,f,10,0,3.0,f,,",
]

CALENDAR_HEADER = "listing_id,date,available,price,adjusted_price,minimum_nights,maximum_nights"
CALENDAR_ROWS = [
    "1,2025-06-01,t,$100.00,$90.00,2,30",      # weekend (Sunday)
    "1,2025-06-02,f,$100.00,,2,30",            # adjusted -> price
    "2,2025-06-02,,,,8,60",                    # null avail -> True, null price -> 100.00
    "3,2025-06-03,x,$85.00,$80.00,35,90",      # junk avail -> True (default-true coercion)
    "999,2025-06-01,t,$10.00,$10.00,1,2",      # unknown listing -> dropped by inner join
    "1,,t,$100.00,$90.00,2,30",                # null date -> filtered
]


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("airbnb")
    lpath, cpath = str(d / "listings.csv"), str(d / "calendar.csv")
    with open(lpath, "w") as f:
        f.write(LISTINGS_HEADER + "\n" + "\n".join(LISTINGS_ROWS) + "\n")
    with open(cpath, "w") as f:
        f.write(CALENDAR_HEADER + "\n" + "\n".join(CALENDAR_ROWS) + "\n")
    return P.stage_listings(spark, lpath), P.stage_calendar(spark, cpath)


def test_staging_cleansing_semantics(staged):
    listings, calendar = staged
    rows = {r.id: r for r in listings.collect()}
    assert len(rows) == 4
    # money stripping "$1,234.56" -> 1234.56 decimal(10,2)
    assert rows["1"].price == decimal.Decimal("1234.56")
    # boolean coercion: t/TRUE -> True, f/"" -> False, case-insensitive
    assert rows["1"].host_is_superhost is True
    assert rows["3"].host_is_superhost is True
    assert rows["2"].host_is_superhost is False
    assert rows["2"].host_has_profile_pic is False  # empty -> False
    # multiline quoted field survives
    assert "\n" in rows["3"].name
    # null coords parse as nulls
    assert rows["4"].latitude is None

    cal = {(r.listing_id, str(r.date)): r for r in calendar.collect() if r.date}
    assert cal[("1", "2025-06-01")].available is True
    assert cal[("1", "2025-06-02")].available is False


def test_dim_host_scd2(staged):
    listings, _ = staged
    dim = P.build_dim_host(listings, existing=None, as_of="2025-06-01 00:00:00")
    rows = {r.host_src_id: r for r in dim.collect()}
    # host 101 appears twice (identical attrs) -> dedup; null host dropped
    assert set(rows) == {101, 102}
    # negative listings_count clamped, null name defaulted
    assert rows[102].host_listings_count == 0
    assert rows[102].host_name == "N/A"
    # trim applied
    assert rows[101].host_response_time == "within an hour"
    assert all(r.is_valid for r in rows.values())


def test_dim_location_excludes_null_coords(staged):
    listings, _ = staged
    dim = {r.location_src_id: r for r in P.build_dim_location(listings).collect()}
    assert len(dim) == 2  # two distinct coord pairs; nulls excluded
    assert "38.716900_-9.139300" in dim


def test_fact_listing_daily(staged):
    listings, calendar = staged
    as_of = "2025-06-01 00:00:00"
    dim_l = P.build_dim_listing(listings, None, as_of)
    dim_h = P.build_dim_host(listings, None, as_of)
    dim_loc = P.build_dim_location(listings)
    fact = P.build_fact_listing_daily(calendar, listings, dim_l, dim_h, dim_loc)
    rows = {(r.listing_id, str(r.date)): r for r in fact.collect()}

    # unknown listing 999 dropped (inner join); null-date row filtered;
    # listing 4 has no calendar rows -> 4 surviving fact rows
    assert len(rows) == 4
    r1 = rows[(1, "2025-06-01")]
    assert r1.day_type == "WEEKEND"
    assert r1.rental_category == "SHORT_TERM"
    assert r1.adjusted_price == decimal.Decimal("90.00")
    # null adjusted -> price imputation
    assert rows[(1, "2025-06-02")].adjusted_price == decimal.Decimal("100.00")
    # null price -> 100.00; 8 nights -> MEDIUM_TERM. available: the raw
    # null was already coerced to False AT STAGING (csv_to_parquet.py:92
    # semantics) — the fact job's default-True re-coercion only applies
    # to raw strings, which staged data no longer has.
    r2 = rows[(2, "2025-06-02")]
    assert r2.price == decimal.Decimal("100.00")
    assert r2.available is False
    assert r2.rental_category == "MEDIUM_TERM"
    # junk 'x' -> False at staging (non-truthy); 35 nights LONG
    r3 = rows[(3, "2025-06-03")]
    assert r3.available is False
    assert r3.rental_category == "LONG_TERM"
    # every fact row carries all three surrogate FKs + location key
    assert all(
        r.listing_key is not None and r.host_key is not None and r.location_src_id
        for r in rows.values()
    )
    # decimal(10,6) compound join produced the RIGHT location
    assert r3.location_src_id == "41.157900_-8.629100"


def test_fact_incremental_after_scd2_change(spark, staged):
    """Fact joins the CURRENT dim versions after an SCD2 re-version."""
    listings, calendar = staged
    t0, t1 = "2025-06-01 00:00:00", "2025-07-01 00:00:00"
    dim_h0 = P.build_dim_host(listings, None, t0)
    # host 101 changes name
    changed = listings.withColumn(
        "host_name",
        F.when(F.col("host_id") == "101", "Alice Updated").otherwise(F.col("host_name")),
    )
    dim_h1 = P.build_dim_host(changed, dim_h0, t1)
    dim_l = P.build_dim_listing(listings, None, t0)
    dim_loc = P.build_dim_location(listings)
    fact = P.build_fact_listing_daily(calendar, listings, dim_l, dim_h1, dim_loc)
    # listing 1 belongs to host 101: its fact rows must carry the NEW key
    new_key = (
        dim_h1.filter((F.col("host_src_id") == 101) & F.col("is_valid"))
        .select("host_key")
        .first()[0]
    )
    keys = {r.host_key for r in fact.collect() if r.listing_id == 1}
    assert keys == {new_key}
